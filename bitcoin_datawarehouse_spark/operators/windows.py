"""Window-function operators (SURVEY.md §2.11 rows 8-10).

Ranking, analytic (lag/lead), moving aggregate, cumulative, and
sessionization windows.  Every window ORDER BY carries a unique
tiebreaker column so output is deterministic and hash-comparable with
the DuckDB oracle.

Scale notes: a window shuffles once on its partition key and sorts
within partitions.  All windows here partition on a real key
(segment, user) — never an empty/global partition except the
small post-aggregate day series (bounded: one row per day), which is
explicitly documented where used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import (
    DEC,
    SQL_DSUM,
    SQL_STR_ROUND6,
    dsum,
    str_round6,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
      SELECT
        c.c_mktsegment,
        o.o_orderkey,
        o.o_totalprice,
        ROW_NUMBER() OVER (
          PARTITION BY c.c_mktsegment
          ORDER BY o.o_totalprice DESC, o.o_orderkey
        ) AS rn
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
    )
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per market segment (row_number ≤ k).

    At scale: the rn<=k filter runs before any collect — each segment
    partition emits k rows.  For heavily skewed groups, pre-aggregate
    a per-partition top-k first (TakeOrderedAndProject per group via
    AQE) — not needed at this group count.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT
      p_partkey,
      p_brand,
      p_retailprice,
      RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
      DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC)
        AS price_dense_rank,
      NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
        AS price_quartile
    FROM part
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile within brand.

    rank/dense_rank are tie-stable (equal inputs get equal output) so
    no tiebreaker is needed; ntile assigns ties arbitrarily, hence the
    p_partkey tiebreak.
    """
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    wt = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return p.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(wt).alias("price_quartile"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT
      event_id,
      user_id,
      value,
      value - LAG(value) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id)
        AS value_delta,
      LEAD(event_type) OVER (PARTITION BY user_id
                             ORDER BY CAST(ts AS TIMESTAMP), event_id)
        AS next_event_type
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics per user over event time.

    The analog of block-interval analysis in the reference's schema
    (block N vs block N-1; SURVEY.md §2.11 'window analytic').
    Per-row double subtraction is IEEE-deterministic — no decimal
    trick needed.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "window_moving_avg",
    oracle=f"""
    WITH daily AS (
      SELECT
        CAST(ts AS DATE) AS day,
        {SQL_DSUM("value", "day_value")}
      FROM events
      GROUP BY 1
    )
    SELECT
      day,
      day_value,
      {SQL_STR_ROUND6(
          "CAST(CAST(SUM(CAST(CAST(day_value AS STRING) AS DECIMAL(38,10)))"
          " OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
          " AS STRING) AS DOUBLE)"
          " / COUNT(*) OVER"
          " (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
      )} AS moving_avg_7d
    FROM daily
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average over the daily event-value series.

    Two stages: a keyed aggregate (shuffles day-partials), then a
    window over the *aggregated* series — one row per day, so the
    unpartitioned window is bounded (30 rows here, ~36.5k rows even
    for a century of days) and safe at any fact-table scale.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        dsum(F.col("value"), "day_value")
    )
    # unpartitioned by design: input is the per-day aggregate, ≤36.5k
    # rows/century — the WindowExec single-partition warning is benign
    w = W.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "day_value",
        # string-routed decimal→double and 6-dp rounding: see
        # functions/numeric.davg / str_round6
        str_round6(
            F.sum(F.col("day_value").cast(DEC))
            .over(w)
            .cast("string")
            .cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg_7d"),
    )


@query(
    "window_cumulative",
    oracle=f"""
    WITH daily AS (
      SELECT
        CAST(o_orderdate AS DATE) AS order_day,
        {SQL_DSUM("o_totalprice", "day_value")}
      FROM orders
      GROUP BY 1
    )
    SELECT
      order_day,
      day_value,
      CAST(ROUND(
        SUM(CAST(CAST(day_value AS STRING) AS DECIMAL(38,10)))
          OVER (ORDER BY order_day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        2) AS DOUBLE) AS running_total
    FROM daily
    """,
)
def window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) total of daily order value.

    Same bounded-series pattern as window_moving_avg: the reference
    analog is 'running total BTC issued' (SURVEY.md §2.11).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("order_day")).agg(
        dsum(F.col("o_totalprice"), "day_value")
    )
    # unpartitioned by design: per-day aggregate input, ≤36.5k
    # rows/century — the WindowExec single-partition warning is benign
    w = W.orderBy("order_day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "order_day",
        "day_value",
        F.round(F.sum(F.col("day_value").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT
      user_id,
      FIRST_VALUE(value) OVER (
        PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS first_value_seen,
      LAST_VALUE(value) OVER (
        PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS last_value_seen,
      COUNT(*) OVER (PARTITION BY user_id) AS n_events
    FROM events
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over the full partition + distinct —
    per-user first and last event values."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("value").over(w).alias("first_value_seen"),
        F.last("value").over(w).alias("last_value_seen"),
        F.count("*").over(W.partitionBy("user_id")).alias("n_events"),
    ).distinct()


@query(
    "sessionize_events",
    oracle="""
    WITH tse AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsu FROM events
    ),
    gaps AS (
      SELECT
        event_id,
        user_id,
        tsu,
        CASE
          WHEN tsu - LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
               > INTERVAL 30 MINUTE
            OR LAG(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) IS NULL
          THEN 1 ELSE 0
        END AS is_new_session
      FROM tse
    )
    SELECT
      event_id,
      user_id,
      CAST(SUM(is_new_session) OVER (
        PARTITION BY user_id ORDER BY tsu, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS session_seq
    FROM gaps
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap starts a new session.

    Classic lag + cumulative-sum-of-gap-flags; one shuffle on
    user_id.  The streaming equivalent (`session_window`) lives in
    streaming/incremental.py.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap so the boundary comparison matches DuckDB's
    # interval arithmetic bit-for-bit
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    is_new = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        e.withColumn("is_new_session", is_new)
        .withColumn(
            "session_seq",
            F.sum("is_new_session")
            .over(w.rowsBetween(W.unboundedPreceding, 0))
            .cast("long"),
        )
        .select("event_id", "user_id", "session_seq")
    )
