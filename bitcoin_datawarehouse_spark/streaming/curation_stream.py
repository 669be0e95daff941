"""Streaming arrival path of the curation pipeline (round 8).

``trainprep_full_curation`` curates a CORPUS; production corpora
arrive as crawls — micro-batches of documents that must flow through
the same gates incrementally: quality (stateless), exact dedup
against everything seen so far, near-dup against the persisted
MinHash-LSH index, and an append of the survivors to the curated
table.  This module runs that loop under Structured Streaming via
``foreachBatch`` (the integration point every stream in this repo
uses: per-trigger cost bounded by the micro-batch, restart resumes
from the checkpoint).

Stage state, and why each is the scale-right shape:

* quality — per-doc pure function, no state;
* exact dedup — ONE (doc_id, content_hash) history table: in-batch
  canonical is a hash-partitioned window, history check is an
  anti-join on content_hash (history holds only content OWNERS — a
  doc dropped as a near-dup still owns its content, exactly the
  sequential-batch semantics);
* near-dup — the persisted ``LshDedupIndex`` loop wholesale
  (``ingest_batch``: decisions materialized, then the batch folds
  into the band/docset tables);
* curated append — keyed idempotent (doc_id anti-join).

Exactly-once across crash/replay, the dedup_stream.py discipline:
the history table's doc_id set is the REPLAY GUARD (a fully
processed doc drops out at the top), and a doc that crashed between
the index append and the downstream appends is recovered by
BACKFILLING its decision from the index's per-ingest decisions table
BEFORE any fresh ingest replaces that table.  Every append
anti-joins on doc_id, so a clean replay writes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from bitcoin_datawarehouse_spark.functions.cachereg import cache_tracked
from bitcoin_datawarehouse_spark.operators.curation import (
    gopher_keep_col,
    gopher_metrics_frame,
)
from bitcoin_datawarehouse_spark.operators.dedup import shingle_sets_frame
from bitcoin_datawarehouse_spark.operators.lsh_index import LshDedupIndex


def run_curation_stream(
    doc_stream: DataFrame,
    index: LshDedupIndex,
    checkpoint_dir: str,
    curated_table: str = "curated_docs",
) -> StreamingQuery:
    """Start the incremental curation of ``doc_stream`` (schema:
    doc_id long, text string, source string).  Survivors land in
    ``curated_table``; content ownership in ``{curated_table}_hashes``;
    near-dup state in ``index``.  ``availableNow`` so tests/backfills
    drain and stop."""
    wh, schema = index.wh, index.schema
    hashes_table = f"{curated_table}_hashes"

    def _append_keyed(df: DataFrame, table: str) -> None:
        """Idempotent append: drop rows whose doc_id is already in
        the target (replayed writes become no-ops)."""
        if wh.table_exists(schema, table):
            seen = wh.read(schema, table).select("doc_id")
            df = df.join(seen, "doc_id", "left_anti")
        if not df.limit(1).isEmpty():
            wh.append(df, schema, table)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        # every frame from the MICRO-BATCH session (the CLAUDE.md
        # foreachBatch rule — mixing sessions silently writes nothing).
        # Eager localCheckpoint first: the batch feeds TWO subtrees of
        # the quality stage (the join's left side AND the metrics
        # kernel), so an unmaterialized batch re-scans the stream
        # source per subtree (observed: numInputRows doubled).
        batch_df = batch_df.localCheckpoint()
        q = batch_df.join(
            gopher_metrics_frame(batch_df.select("doc_id", "text"))
            .filter(gopher_keep_col())
            .select("doc_id"),
            "doc_id",
        ).withColumn(
            "content_hash", F.md5(F.col("text").cast("binary"))
        )
        # in-batch exact canonical (min doc_id per content)
        wdd = W.partitionBy("content_hash").orderBy("doc_id")
        s2 = (
            q.withColumn("_rn", F.row_number().over(wdd))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if wh.table_exists(schema, hashes_table):
            hist = wh.read(schema, hashes_table)
            # replay guard first (a processed doc must NOT be dropped
            # as a dup of itself), then the content-history check
            s2 = s2.join(hist.select("doc_id"), "doc_id", "left_anti")
            s2 = s2.join(
                hist.select("content_hash"), "content_hash", "left_anti"
            )
        s2 = cache_tracked(s2)
        docsets = None
        try:
            if s2.count() == 0:
                return

            docsets = cache_tracked(
                shingle_sets_frame(s2.select("doc_id", "text"))
            )
            docsets.count()

            # crash recovery: docs already IN the index were decided
            # by a prior (crashed) run — backfill their decisions from
            # the per-ingest table BEFORE a fresh ingest replaces it
            if index.exists():
                seen = index._docsets().select("doc_id")
                fresh = docsets.join(seen, "doc_id", "left_anti")
                indexed = docsets.select("doc_id").join(
                    seen, "doc_id", "left_semi"
                )
                if not indexed.isEmpty() and wh.table_exists(
                    schema, index.decisions_table
                ):
                    recovered = wh.read(
                        schema, index.decisions_table
                    ).join(indexed, "doc_id")
                    _finish(s2, recovered, batch_id)
            else:
                fresh = docsets

            if not fresh.limit(1).isEmpty():
                decisions = index.ingest_batch(fresh)
                _finish(s2, decisions, batch_id)
        finally:
            # per-micro-batch caches die with their trigger (the
            # cachereg streaming contract) — a long-running stream
            # must not pin one batch-sized cache per trigger
            s2.unpersist()
            if docsets is not None:
                docsets.unpersist()

    def _finish(
        s2: DataFrame, decisions: DataFrame, batch_id: int
    ) -> None:
        """Complete the trigger for a decided subset: survivors →
        curated table, exact-stage survivors → content history."""
        dec = decisions.select("doc_id", "is_dup")
        rows = s2.join(dec, "doc_id")
        _append_keyed(
            rows.filter(~F.col("is_dup"))
            .select("doc_id", "text", "source", "content_hash")
            .withColumn("batch_id", F.lit(batch_id)),
            curated_table,
        )
        _append_keyed(
            rows.select("doc_id", "content_hash"), hashes_table
        )

    return (
        doc_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
