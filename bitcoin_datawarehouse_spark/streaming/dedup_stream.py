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
loader's staged upsert provides for relational streams).  The two
index writes (per-ingest decisions table, then band/docset append)
and the ledger append cannot be one atomic transaction on a file
warehouse, so the replay path also REPAIRS: a crash after the index
append but before the ledger append leaves the batch's decisions in
the per-ingest table, and the replay (which sees every batch doc
already indexed) backfills exactly the un-ledgered rows from there
instead of running an empty ingest — which would otherwise replace
the per-ingest table with an empty frame and destroy the only
remaining copy of those decisions.
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

    ledger_table = f"{index.decisions_table}_stream"

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        docsets = shingle_sets_frame(batch_df)
        all_ids = docsets.select("doc_id")
        if index.exists():
            seen = index._docsets().select("doc_id")
            fresh = docsets.join(seen, "doc_id", "left_anti")
        else:
            fresh = docsets
        if fresh.limit(1).count() > 0:
            decisions = index.ingest_batch(fresh)
            # cumulative stream ledger (the per-ingest table is
            # replaced each micro-batch; auditing a stream needs the
            # union), stamped with the micro-batch ordinal
            index.wh.append(
                decisions.withColumn("batch_id", F.lit(batch_id)),
                index.schema,
                ledger_table,
            )
            return
        # Whole batch already indexed — a replay.  Do NOT run
        # ingest_batch on the empty frame (it would atomically replace
        # the per-ingest decisions table with nothing, destroying the
        # recovery copy).  Close the one remaining crash window — a
        # failure AFTER the index append but BEFORE the ledger append —
        # by backfilling this batch's ledger rows from the per-ingest
        # decisions table, keyed so a clean replay appends nothing.
        if not index.wh.table_exists(index.schema, index.decisions_table):
            return
        recovered = index.wh.read(
            index.schema, index.decisions_table
        ).join(all_ids, "doc_id")
        if index.wh.table_exists(index.schema, ledger_table):
            ledgered = index.wh.read(index.schema, ledger_table).select(
                "doc_id"
            )
            recovered = recovered.join(ledgered, "doc_id", "left_anti")
        if recovered.limit(1).count() > 0:
            index.wh.append(
                recovered.withColumn("batch_id", F.lit(batch_id)),
                index.schema,
                ledger_table,
            )

    return (
        doc_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
