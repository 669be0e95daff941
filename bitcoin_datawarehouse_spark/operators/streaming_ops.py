"""Streaming operators surfaced through the correctness gate.

``streaming_windowed_counts`` actually executes a Structured
Streaming query (file source → watermark → tumbling window →
memory sink, availableNow trigger) and returns its final result, so
the driver's DuckDB oracle verifies the streaming path end-to-end:
complete output mode emits every window's final state, which must
equal the batch/SQL computation regardless of micro-batching.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.streaming.jobs import (
    read_event_stream,
    run_stream_to_completion,
    windowed_event_counts,
)
from bitcoin_datawarehouse_spark.tables import load_table

#: file count for the re-materialized stream source dirs below.  Gate
#: scaffolding only (the engine under test is downstream of the file
#: source), but a ``coalesce(1)`` here made the SINGLE-file rewrite
#: the harness bottleneck as the gate sf grows — a small fixed fan-out
#: keeps the staging write parallel while still giving availableNow
#: drains a handful of splits.  Results are micro-batch-count
#: independent by construction (each gate query's docstring states
#: why), so the file count is purely physical.
GATE_SOURCE_FILES = 8


def _stage_source(spark: SparkSession, sf_dir: str, table: str,
                  prefix: str) -> str:
    """Re-materialize a fixture table to a temp dir a file-source
    stream can list (events also needs the batch reader's
    TIMESTAMP(NANOS) handling first — tables.load_table)."""
    tmp = tempfile.mkdtemp(prefix=prefix)
    load_table(spark, sf_dir, table).repartition(
        GATE_SOURCE_FILES
    ).write.mode("overwrite").parquet(tmp)
    return tmp


@query(
    "streaming_windowed_counts",
    oracle="""
    SELECT
      time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(ROUND(SUM(CAST(CAST(value AS STRING) AS DECIMAL(38,10))), 2) AS DOUBLE)
        AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts per event type, computed BY THE
    STREAMING ENGINE (replayed file stream, availableNow) — final
    complete-mode state must equal the batch aggregation.

    The events fixture is re-materialized to a temp dir because the
    raw fixture's TIMESTAMP(NANOS) needs the batch reader's
    micros-truncation first (tables.py), and a file-source stream
    needs a directory it can list.
    """
    tmp = _stage_source(spark, sf_dir, "events", "stream_events_")
    agg = windowed_event_counts(
        read_event_stream(spark, tmp),
        window="1 hour",
        watermark="2 hours",
        decimal_sums=True,
    ).select(
        "window_start",
        "event_type",
        "n_events",
        # decimal accumulation in the stateful agg, engine-neutral
        # 2-dp DOUBLE at the output surface (see functions/numeric.py)
        F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
    )
    sink = f"stream_win_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    run_stream_to_completion(q)
    # the memory sink holds the result; the replayed input is disposable
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(sink)


@query(
    "streaming_attribution_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           c.event_id AS click_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           p.value AS purchase_value
    FROM events p
    JOIN events c
      ON c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND c.user_id = p.user_id
     AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
     AND CAST(c.ts AS TIMESTAMP)
         >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
    """,
)
def streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click→purchase attribution within
    1 hour), executed BY THE STREAMING ENGINE over a replayed file
    stream — two watermarked stream sides, time-range-bounded state.
    An inner join emits exactly the set of matches once drained, so
    the result equals the batch/SQL non-equi join regardless of
    micro-batching.
    """
    from bitcoin_datawarehouse_spark.streaming.joins import attribution_join

    tmp = _stage_source(spark, sf_dir, "events", "stream_attrib_")
    joined = attribution_join(read_event_stream(spark, tmp))
    sink = f"stream_attrib_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_stream_to_completion(q)
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(sink)


@query(
    "streaming_dedup_exact",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest exact dedup: watermarked
    ``dropDuplicatesWithinWatermark`` on the event key, executed BY
    THE STREAMING ENGINE — the streaming member of the dedup family
    (a 100 TB ingest dedups at the door, not in a nightly batch).

    The fixture has ~40 events per (user, type) key, so real dropping
    happens in the state store.  Only the key columns are emitted, so
    whichever physical row each micro-batch keeps, the projected
    output is the same set — equal to the batch DISTINCT.  The
    watermark delay is set wider than the fixture's full event-time
    span so DISTINCT equivalence holds under ANY micro-batching (with
    a narrow delay, a key recurring later than the delay would be
    re-emitted after state eviction if the source ever split into
    multiple micro-batches).  At scale you'd size the delay to the
    real lateness horizon and accept horizon-scoped dedup; state
    lives in the RocksDB-backed store, purged per watermark advance.
    """
    tmp = _stage_source(spark, sf_dir, "events", "stream_dedup_")
    dedup = (
        read_event_stream(spark, tmp)
        .withWatermark("ts", "3650 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        dedup.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_stream_to_completion(q)
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(sink)


from bitcoin_datawarehouse_spark.operators.curation import (  # noqa: E402
    _SQL_GOPHER_KEEP,
    _SQL_GOPHER_M,
)


@query(
    "streaming_quality_filter",
    oracle=f"""
    WITH {_SQL_GOPHER_M}
    SELECT doc_id, n_words, mean_word_len, n_stop_hits, symbol_ratio
    FROM m
    WHERE {_SQL_GOPHER_KEEP}
    """,
)
def streaming_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation at the ingest door: the Gopher-rule keep filter
    applied BY THE STREAMING ENGINE to a replayed document stream.

    The rule projection is stateless (no watermark, no state store),
    so the streaming plan is the same codegen projection+filter as the
    batch query — micro-batching cannot change the kept set, which the
    batch/SQL oracle verifies.  This is the shape of a 100 TB ingest:
    quality-filter documents as they arrive, not in a nightly rescan.
    """
    from bitcoin_datawarehouse_spark.operators.curation import (
        gopher_keep_col,
        gopher_metrics_frame,
    )

    tmp = _stage_source(spark, sf_dir, "documents", "stream_docs_")
    schema = spark.read.parquet(tmp).schema
    src = spark.readStream.schema(schema).parquet(tmp)
    kept = gopher_metrics_frame(src).filter(gopher_keep_col())
    sink = f"stream_quality_{uuid.uuid4().hex[:8]}"
    q = (
        kept.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_stream_to_completion(q)
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(sink)


@query(
    "streaming_enrich_static",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment, e.event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(CAST(e.value AS STRING) AS DECIMAL(38,10))), 2) AS DOUBLE)
             AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def streaming_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the replayed event stream joined to
    the static ``customer`` dimension (broadcast hash join re-planned
    per micro-batch — the canonical streaming enrichment; the static
    side needs no watermark and holds no state), then aggregated per
    (market segment, event type) in complete mode.

    Final state must equal the batch join+aggregate regardless of
    micro-batching: the join is stateless, and complete-mode output
    emits every aggregate's final value.  At scale the dimension is a
    warehouse table refreshed independently of the stream.
    """
    tmp = _stage_source(spark, sf_dir, "events", "stream_enrich_")
    customer = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey"), F.col("c_mktsegment").alias("mktsegment")
        )
    )
    enriched = (
        read_event_stream(spark, tmp)
        .join(customer, F.col("user_id") == F.col("c_custkey"))
        .groupBy("mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)")).alias("sum_value"),
        )
        .select(
            "mktsegment",
            "event_type",
            "n_events",
            F.round(F.col("sum_value"), 2).cast("double").alias("sum_value"),
        )
    )
    sink = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    run_stream_to_completion(q)
    shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(sink)


#: drift-gate constants: value-bucket width and the event-time split
#: between the pinned reference window and the monitored stream
DRIFT_BUCKET_W = 50.0
DRIFT_SPLIT = "2024-01-16"

_DRIFT_STREAM_SQL = f"""
WITH ref AS (
  SELECT CAST(FLOOR(value / {DRIFT_BUCKET_W}) AS BIGINT) AS bucket,
         COUNT(*) AS n_ref
  FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{DRIFT_SPLIT}'
  GROUP BY 1
),
cur AS (
  SELECT CAST(FLOOR(value / {DRIFT_BUCKET_W}) AS BIGINT) AS bucket,
         COUNT(*) AS n_cur
  FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '{DRIFT_SPLIT}'
  GROUP BY 1
),
joined AS (
  SELECT COALESCE(r.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
  FROM ref r FULL OUTER JOIN cur c ON r.bucket = c.bucket
),
probs AS (
  SELECT n_cur,
         CAST(n_ref AS DOUBLE)
           / (SELECT CAST(SUM(n_ref) AS DOUBLE) FROM ref) AS p_ref,
         CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER () AS p_cur
  FROM joined
)
SELECT CAST(SUM(n_cur) OVER () AS BIGINT) AS n_rows,
       {{tv}} AS tv
FROM probs
LIMIT 1
"""


def _drift_tv_sql() -> str:
    from bitcoin_datawarehouse_spark.functions.numeric import (
        SQL_DEC,
        SQL_STR_ROUND6,
    )

    tv = SQL_STR_ROUND6(
        "0.5 * CAST(CAST(SUM(" + SQL_DEC("ABS(p_ref - p_cur)")
        + ") OVER () AS STRING) AS DOUBLE)"
    )
    return _DRIFT_STREAM_SQL.format(tv=tv)


@query("streaming_drift_monitor", oracle=_drift_tv_sql())
def streaming_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift monitoring at the streaming door: the SECOND HALF of the
    event history streams through ``drift_monitor_stream`` against a
    reference histogram pinned from the FIRST half — the ledger's TV
    distance must equal the batch/SQL computation of the same two
    windows.

    Micro-batch independence: the staged source drains as ONE
    availableNow batch (8 files, far under the file-source's default
    1000-files-per-trigger), so the single ledger row covers exactly
    the monitored window; the ledger exposes (n_rows, tv) — batch_id
    is execution detail.  The reference histogram is a driver-held
    model list (codebook-sized), which is the monitor's design: drift
    is measured against a FIXED baseline.
    """
    import tempfile as _tf

    from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse
    from bitcoin_datawarehouse_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        drift_monitor_stream,
    )

    ev = load_table(spark, sf_dir, "events")
    split = F.lit(DRIFT_SPLIT).cast("timestamp")
    reference = [
        (r["bucket"], r["n"])
        for r in ev.filter(F.col("ts") < split)
        .groupBy(
            F.floor(F.col("value") / DRIFT_BUCKET_W)
            .cast("bigint")
            .alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    tmp = _tf.mkdtemp(prefix="stream_drift_")
    ev.filter(F.col("ts") >= split).repartition(
        GATE_SOURCE_FILES
    ).write.mode("overwrite").parquet(tmp)
    wh = Warehouse(spark, _tf.mkdtemp(prefix="stream_drift_wh_"))
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(tmp)
    q = drift_monitor_stream(
        stream, wh, "monitor", "drift", reference,
        value_col="value", bucket_width=DRIFT_BUCKET_W,
        checkpoint_dir=_tf.mkdtemp(prefix="stream_drift_ck_"),
    )
    run_stream_to_completion(q)
    shutil.rmtree(tmp, ignore_errors=True)
    return wh.read("monitor", "drift").select("n_rows", "tv")
