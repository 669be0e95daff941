"""Streaming near-dup dedup against the persisted LSH index.

The batch production loop (operators/lsh_index.LshDedupIndex) keeps
the corpus' MinHash signatures materialized and decides each incoming
batch against them.  This module runs that SAME loop under Structured
Streaming: every micro-batch of documents is shingled by the Arrow
kernel (``dedup.shingle_sets_frame`` — raw text is touched exactly
once, at arrival), decided against the index (arrival-ordered: the
persisted corpus, then earlier doc_ids within the micro-batch), and
appended to it, with decisions accumulating in the index's warehouse
ledger.

Semantics and scale are inherited wholesale from the batch loop —
``foreachBatch`` is deliberately the integration point (same pattern
as streaming/jobs.merge_stream_into_table): per-trigger cost is
bounded by the micro-batch, the band table is the only corpus-wide
join surface, and a stream restart resumes from the checkpoint.

Exactly-once: a failed-and-replayed micro-batch would re-ingest its
documents, so the wrapper anti-joins the batch against doc_ids
already in the index before deciding — a replay becomes a no-op and
the ledger stays duplicate-free (the same idempotence contract the
loader's staged upsert provides for relational streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from bitcoin_datawarehouse_spark.operators.dedup import shingle_sets_frame
from bitcoin_datawarehouse_spark.operators.lsh_index import LshDedupIndex


def run_lsh_dedup_stream(
    doc_stream: DataFrame,
    index: LshDedupIndex,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start a streaming ingest of ``doc_stream`` (schema: doc_id
    long, text string) into ``index``.  Uses ``availableNow`` so tests
    and backfills drain the source and stop; a production deployment
    swaps the trigger for a processing-time interval."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        docsets = shingle_sets_frame(batch_df)
        if index.exists():
            seen = index._docsets().select("doc_id")
            docsets = docsets.join(seen, "doc_id", "left_anti")
        decisions = index.ingest_batch(docsets)
        # cumulative stream ledger (the per-ingest table is replaced
        # each micro-batch; auditing a stream needs the union), stamped
        # with the micro-batch ordinal
        from pyspark.sql import functions as F

        index.wh.append(
            decisions.withColumn("batch_id", F.lit(batch_id)),
            index.schema,
            f"{index.decisions_table}_stream",
        )

    return (
        doc_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
