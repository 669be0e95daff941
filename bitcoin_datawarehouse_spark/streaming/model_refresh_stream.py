"""Streaming model maintenance: the drift/volume-triggered re-train
loop running INSIDE a stream (closes the r10 VERDICT item-2 story:
bootstrap → monitor arrivals → atomic generation swap, all without an
operator touching anything).

Per trigger:

1. the micro-batch appends to a persisted CORPUS table (idempotent by
   doc_id — replays are no-ops, the curation-stream discipline);
2. the ACCUMULATED corpus is compared against the current
   generation's stored build profile (``ModelRegistry.refresh_if_
   needed``: TV drift over the ≤64-row log2-length histogram — the
   ``profile_drift_tv`` metric — plus volume growth);
3. when the policy fires, ``build_parts`` retrains over the full
   corpus and the registry publishes the next generation (part tables
   first, 1-row pointer flipped last — serving readers see old-or-new,
   never mixed);
4. the decision lands in a LOG table (one row per trigger: batch id,
   corpus size, refreshed?, reason, generation) — the observability
   surface a production loop alerts on.

Session discipline: every frame inside ``foreachBatch`` builds from
the MICRO-BATCH session (the CLAUDE.md rule); all registry reads are
path-based parquet (fresh listing per frame), so the main session can
resolve/serve concurrently without refreshTable choreography.

Scale shape: the corpus append is one anti-join against doc_ids; the
profile compare is two ≤64-row collects; retraining cost is the
family's build cost (probed in tools/probe_model_serve.py) and only
paid when the policy fires — a stable stream pays the profile probe
per trigger, nothing else.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from bitcoin_datawarehouse_spark.pipeline.model_registry import (
    ModelRegistry,
    RefreshPolicy,
)
from bitcoin_datawarehouse_spark.functions.localframe import local_rows_df

#: where the accumulated corpus and the decision log live
REFRESH_SCHEMA = "models_meta"


def run_model_refresh_stream(
    doc_stream: DataFrame,
    registry: ModelRegistry,
    name: str,
    build_parts: Callable[[DataFrame], dict[str, DataFrame]],
    checkpoint_dir: str,
    policy: RefreshPolicy | None = None,
    keep_back: int = 1,
) -> StreamingQuery:
    """Start the maintenance loop over ``doc_stream`` (schema: doc_id
    long, text string, …).  ``build_parts`` maps the accumulated
    (doc_id, text) corpus frame to the model's part frames —
    e.g. ``quality_classifier.fit_quality_parts_frame``.
    ``availableNow`` so tests/backfills drain and stop."""
    wh = registry.wh
    corpus_table = f"{name}_refresh_corpus"
    log_table = f"{name}_refresh_log"

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        batch_df = batch_df.select("doc_id", "text").localCheckpoint()

        # 1. idempotent corpus append (replayed triggers are no-ops)
        if wh.table_exists(REFRESH_SCHEMA, corpus_table):
            seen = wh.read_with(sess, REFRESH_SCHEMA, corpus_table).select(
                "doc_id"
            )
            fresh = batch_df.join(seen, "doc_id", "left_anti")
        else:
            fresh = batch_df
        if not fresh.limit(1).isEmpty():
            wh.append(fresh, REFRESH_SCHEMA, corpus_table)

        # 2+3. policy decision over the ACCUMULATED corpus, retrain +
        # atomic publish when it fires
        corpus = wh.read_with(sess, REFRESH_SCHEMA, corpus_table)
        decision = registry.refresh_if_needed(
            name,
            corpus,
            lambda: build_parts(corpus),
            policy,
            keep_back=keep_back,
        )

        # 4. decision log — one row per trigger
        gen = registry.current_generation(sess, name)
        wh.append(
            local_rows_df(sess, 
                [
                    (
                        int(batch_id),
                        int(corpus.count()),
                        bool(decision.refresh),
                        decision.reason,
                        int(gen or 0),
                    )
                ],
                "batch_id long, corpus_docs long, refreshed boolean, "
                "reason string, generation long",
            ),
            REFRESH_SCHEMA,
            log_table,
        )

    return (
        doc_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
