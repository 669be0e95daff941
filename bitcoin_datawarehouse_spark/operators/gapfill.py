"""Time-series gap-fill: dense bucket spine + LOCF + gap islands.

The hypertable operator family (TimescaleDB ``time_bucket_gapfill`` +
``locf``): a per-key event series aggregated into fixed buckets has
EMPTY buckets wherever no event landed; downstream consumers (charting,
rate-of-change, drift monitors) need a DENSE series.  This module

* buckets events into fixed ``BUCKET_S``-second cells,
* generates the dense spine per key via ``sequence``/``explode``
  between that key's first and last observed bucket (TimescaleDB's
  explicit range args collapse to the data range here),
* left-joins observations onto the spine and fills empty cells by
  last-observation-carried-forward (``last(..., ignorenulls)`` over a
  running frame — LOCF starts at the key's first bucket, which is an
  observation by construction, so no leading-null case exists),
* derives gap RUN statistics with the gaps-and-islands idiom
  (bucket-index minus row-number is constant within a consecutive
  run).

Scale: the spine explode is driven by the per-key (min, max) range —
#rows = keys × buckets-in-range, a TIME bound, not a data bound; the
LOCF window partitions by key and is bounded by the same count (the
standard bounded-window argument used across windows.py).  All
arithmetic is integer epoch-seconds; the only timestamp conversion is
the final display cast, identical in both engines at session-UTC.
LOCF carries BIGINT counts — exact, no float accumulation.

Reference parity: none (the reference has no time-series surface);
north-star §2.11 time-bucketing extension, sibling of
``time_bucket_hourly``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_DEC,
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: bucket width in seconds.  15 min: at the fixture's event density
#: (~2.8 events/bucket Poisson) every type has thousands of real gaps,
#: so the LOCF and island paths are exercised, not vacuous.
BUCKET_S = 900

#: shared oracle CTE chain: sparse per-(type, bucket) counts → per-key
#: range → dense spine → LOCF over the running frame
_SQL_DENSE = f"""
gf_sparse AS (
  SELECT event_type, CAST(floor(epoch(ts)/{BUCKET_S}) AS BIGINT)*{BUCKET_S} AS b,
         COUNT(*) AS n_obs
  FROM events GROUP BY 1, 2
),
gf_rng AS (
  SELECT event_type, MIN(b) AS b_lo, MAX(b) AS b_hi FROM gf_sparse GROUP BY 1
),
gf_spine AS (
  SELECT event_type, g AS b
  FROM gf_rng, UNNEST(generate_series(b_lo, b_hi, {BUCKET_S})) AS t(g)
),
gf_dense AS (
  SELECT s.event_type, s.b, sp.n_obs
  FROM gf_spine s
  LEFT JOIN gf_sparse sp ON s.event_type = sp.event_type AND s.b = sp.b
),
gf_locf AS (
  SELECT event_type, b, n_obs,
    last_value(n_obs IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY b
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_events,
    n_obs IS NULL AS filled
  FROM gf_dense
)
"""


def _dense_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dense_locf_frame(load_table(spark, sf_dir, "events"))


def dense_locf_frame(e: DataFrame) -> DataFrame:
    """Dense (event_type, b, n_obs, n_events, filled) frame.

    ``e`` needs (event_type, ts).
    """
    sparse = e.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / F.lit(BUCKET_S)) * BUCKET_S).alias(
            "b"
        ),
    ).agg(F.count("*").alias("n_obs"))
    rng = sparse.groupBy("event_type").agg(
        F.min("b").alias("b_lo"), F.max("b").alias("b_hi")
    )
    spine = rng.select(
        "event_type",
        F.explode(F.sequence("b_lo", "b_hi", F.lit(BUCKET_S))).alias("b"),
    )
    dense = spine.join(sparse, ["event_type", "b"], "left")
    run = (
        W.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return dense.select(
        "event_type",
        "b",
        "n_obs",
        F.last("n_obs", ignorenulls=True).over(run).alias("n_events"),
        F.col("n_obs").isNull().alias("filled"),
    )


@query(
    "events_gapfill_locf",
    oracle=f"""
    WITH {_SQL_DENSE}
    SELECT event_type,
           CAST(to_timestamp(b) AS TIMESTAMP) AS bucket_ts,
           CAST(n_events AS BIGINT) AS n_events,
           filled
    FROM gf_locf
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 15-min series per event type, empty buckets LOCF-filled.

    ``filled`` marks carried-forward cells so consumers can
    distinguish observation from imputation.
    """
    return _dense_locf(spark, sf_dir).select(
        "event_type",
        F.timestamp_seconds("b").alias("bucket_ts"),
        F.col("n_events").cast("long").alias("n_events"),
        "filled",
    )


@query(
    "events_gap_islands",
    oracle=f"""
    WITH {_SQL_DENSE},
    gf_gap AS (
      SELECT event_type, b,
        b//{BUCKET_S} - ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY b) AS grp
      FROM gf_locf WHERE filled
    ),
    gf_runs AS (
      SELECT event_type, grp, COUNT(*) AS run_len
      FROM gf_gap GROUP BY 1, 2
    )
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_gap_runs,
      CAST(SUM(run_len) AS BIGINT) AS n_gap_buckets,
      CAST(MAX(run_len) AS BIGINT) AS longest_gap_run
    FROM gf_runs GROUP BY event_type
    """,
)
def events_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-run statistics per event type (gaps-and-islands).

    ``bucket_index - row_number`` is constant within each consecutive
    run of empty buckets; grouping on it yields run lengths without a
    self-join.  The row_number window orders by the unique bucket —
    no engine tie-order dependence.
    """
    dense = _dense_locf(spark, sf_dir)
    seq = W.partitionBy("event_type").orderBy("b")
    gaps = dense.where("filled").select(
        "event_type",
        "b",
        ((F.col("b") / BUCKET_S).cast("long") - F.row_number().over(seq)).alias(
            "grp"
        ),
    )
    runs = gaps.groupBy("event_type", "grp").agg(
        F.count("*").alias("run_len")
    )
    return runs.groupBy("event_type").agg(
        F.count("*").alias("n_gap_runs"),
        F.sum("run_len").cast("long").alias("n_gap_buckets"),
        F.max("run_len").cast("long").alias("longest_gap_run"),
    )


# ---------------------------------------------------------------------------
# time-weighted average (round 6): the hypertable aggregate sibling
# ---------------------------------------------------------------------------

#: TWAP observation window (fixture events span 2024-01)
TWAP_T0 = "2024-01-10 00:00:00"
TWAP_T1 = "2024-01-20 00:00:00"


@query(
    "events_twap",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             epoch_ms(ts) AS t,
             value,
             LEAD(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS t_next
      FROM events
    ),
    clipped AS (
      SELECT user_id, value,
             GREATEST(CAST(0 AS BIGINT),
               LEAST(COALESCE(t_next,
                              epoch_ms(TIMESTAMP '{TWAP_T1}')),
                     epoch_ms(TIMESTAMP '{TWAP_T1}'))
               - GREATEST(t, epoch_ms(TIMESTAMP '{TWAP_T0}'))
             ) AS dur_ms
      FROM s
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE dur_ms > 0) AS BIGINT)
             AS n_samples,
           CAST(SUM(dur_ms) AS BIGINT) AS held_ms,
           {SQL_STR_ROUND6(
               "CAST(CAST(SUM(" + SQL_DEC(
                   "value * CAST(dur_ms AS DOUBLE)"
               ) + ") AS STRING) AS DOUBLE) / CAST(SUM(dur_ms) AS DOUBLE)"
           )} AS twap
    FROM clipped
    GROUP BY user_id
    HAVING SUM(dur_ms) > 0
    """,
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user over a fixed
    window — the TimescaleDB ``time_weight('LOCF', …)`` aggregate:
    each sample's value holds until the NEXT sample (LOCF), so its
    weight is the held duration clipped to the window; the sample
    BEFORE the window start participates with its in-window remainder
    (the clipping handles it — no special case), and the last sample
    holds to the window end.  A plain AVG over irregular samples
    over-weights bursty periods; TWAP is the honest aggregate for
    sensor/price series.

    Numeric contract: durations are exact BIGINT milliseconds
    (``unix_millis``/``epoch_ms``, both floor), the weighted sum
    accumulates value·dur (reaching ~4e11, the string-route regime)
    in DECIMAL(38,10), and the final quotient is one identical double
    division through the 6-dp string route.  One LEAD window per user
    + one hash aggregate — the sessionize/gap-fill shuffle shape.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    t0 = F.unix_millis(F.lit(TWAP_T0).cast("timestamp"))
    t1 = F.unix_millis(F.lit(TWAP_T1).cast("timestamp"))
    w_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "value",
        F.unix_millis("ts").alias("t"),
        F.lead(F.unix_millis("ts")).over(w_user).alias("t_next"),
    )
    clipped = s.select(
        "user_id",
        "value",
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.coalesce(F.col("t_next"), t1), t1)
            - F.greatest(F.col("t"), t0),
        ).alias("dur_ms"),
    )
    vd = (F.col("value") * F.col("dur_ms").cast("double")).cast(
        "decimal(38,10)"
    )
    return (
        clipped.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("dur_ms") > 0, 1))
            .cast("bigint")
            .alias("n_samples"),
            F.sum("dur_ms").cast("bigint").alias("held_ms"),
            (
                F.sum(vd).cast("string").cast("double")
                / F.sum("dur_ms").cast("double")
            ).alias("_twap_raw"),
        )
        .where(F.col("held_ms") > 0)
        .select(
            "user_id",
            "n_samples",
            "held_ms",
            str_round6(F.col("_twap_raw")).alias("twap"),
        )
    )
