"""Window RANGE frames and null semantics (§2.11 completion).

Time-RANGE window frames (a trailing N-day frame over sparse data —
ROWS frames are wrong when days are missing) and the null-comparison
semantics corner (null-safe equality, NULLS FIRST/LAST ordering)
that silently diverge between engines when left implicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import DEC, dsum
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

TRAILING_DAYS = 7


@query(
    "window_range_frame",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(ROUND(SUM(CAST(CAST(o_totalprice AS STRING) AS DECIMAL(38,10))), 2)
                  AS DOUBLE) AS day_rev
      FROM orders GROUP BY o_orderdate
    )
    SELECT day, day_rev,
           CAST(ROUND(
             SUM(CAST(CAST(day_rev AS STRING) AS DECIMAL(38,10))) OVER (
               ORDER BY day
               RANGE BETWEEN INTERVAL {TRAILING_DAYS - 1} DAYS PRECEDING
                         AND CURRENT ROW
             ), 2) AS DOUBLE) AS trailing7d_rev
    FROM daily
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per day via a RANGE (value-based) frame.

    RANGE differs from ROWS exactly when the series is sparse: a ROWS
    frame of 6 preceding rows spans more than 7 calendar days across
    gaps.  Spark's rangeBetween needs a numeric ordering, so the day
    orders by its epoch-day number with a ±(N-1) bound — semantically
    identical to the SQL INTERVAL frame.  Single global time order:
    at scale this window partitions by a series key (the fixture has
    one series).
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        dsum(F.col("o_totalprice"), "day_rev")
    )
    # unpartitioned by design: per-day aggregate input, ≤36.5k
    # rows/century — the WindowExec single-partition warning is benign
    w = (
        W.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-(TRAILING_DAYS - 1), 0)
    )
    return daily.select(
        "day",
        "day_rev",
        F.round(F.sum(F.col("day_rev").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("trailing7d_rev"),
    )


@query(
    "map_props_entries",
    oracle="""
    WITH kv AS (
      SELECT unnest(json_keys(props)) AS prop_key,
             CAST(json_extract_string(
               props, '$.' || unnest(json_keys(props))) AS BIGINT)
               AS prop_value
      FROM events
    )
    SELECT prop_key, COUNT(*) AS n_entries,
           CAST(SUM(prop_value) AS BIGINT) AS sum_value,
           CAST(MIN(prop_value) AS BIGINT) AS min_value,
           CAST(MAX(prop_value) AS BIGINT) AS max_value
    FROM kv GROUP BY prop_key
    """,
)
def map_props_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType pipeline over semi-structured props: ``from_json`` into
    ``map<string,bigint>`` (one parse per row for ALL keys — the
    at-scale alternative to per-field get_json_object), explode the
    entries, aggregate per key.

    The map explode is the schema-flexible path for property bags
    whose key set isn't known at write time (SURVEY.md §2.12
    multimodal/props columns).
    """
    e = load_table(spark, sf_dir, "events")
    entries = e.select(
        F.explode(
            F.from_json(F.col("props"), "map<string,bigint>")
        ).alias("prop_key", "prop_value")
    )
    return entries.groupBy("prop_key").agg(
        F.count("*").alias("n_entries"),
        F.sum("prop_value").alias("sum_value"),
        F.min("prop_value").alias("min_value"),
        F.max("prop_value").alias("max_value"),
    )


@query(
    "expr_null_semantics",
    oracle="""
    WITH flagged AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_shipdate >= DATE '1998-10-01' THEN NULL
                  ELSE l_returnflag END AS maybe_flag,
             l_quantity
      FROM lineitem
    )
    SELECT a.l_orderkey, a.l_linenumber, a.maybe_flag,
           CAST(a.maybe_flag IS NOT DISTINCT FROM 'R' AS BOOLEAN)
             AS nullsafe_is_r,
           CAST(COALESCE(a.maybe_flag = 'R', FALSE) AS BOOLEAN)
             AS plain_is_r_coalesced
    FROM flagged a
    WHERE a.l_quantity = 50
    """,
)
def expr_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-comparison semantics: null-safe equality (``<=>`` /
    IS NOT DISTINCT FROM) vs plain ``=`` under COALESCE.

    The rows where ``maybe_flag`` is NULL are exactly where the two
    predicates agree only because of the explicit COALESCE — the
    standard three-valued-logic trap in filters and join conditions.
    """
    li = load_table(spark, sf_dir, "lineitem")
    flagged = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            F.col("l_shipdate") >= F.lit("1998-10-01").cast("date"), None
        )
        .otherwise(F.col("l_returnflag"))
        .alias("maybe_flag"),
        "l_quantity",
    ).filter(F.col("l_quantity") == 50)
    return flagged.select(
        "l_orderkey",
        "l_linenumber",
        "maybe_flag",
        F.col("maybe_flag").eqNullSafe(F.lit("R")).alias("nullsafe_is_r"),
        F.coalesce(F.col("maybe_flag") == "R", F.lit(False)).alias(
            "plain_is_r_coalesced"
        ),
    )


# ---------------------------------------------------------------------------
# round 7: rolling z-score anomaly detection (per-entity sliding frame)
# ---------------------------------------------------------------------------

from bitcoin_datawarehouse_spark.functions.numeric import (  # noqa: E402
    SQL_DEC,
    SQL_STR_ROUND6,
    str_round6,
)

#: trailing frame width (rows, inclusive of the current event)
ZSCORE_WINDOW_ROWS = 20


@query(
    "events_rolling_zscore",
    oracle=f"""
    WITH base AS (
      SELECT event_id, user_id, epoch_ms(ts) AS t_ms, value
      FROM events
    ),
    framed AS (
      SELECT event_id, user_id, t_ms, value,
             CAST(CAST(SUM({SQL_DEC("value")}) OVER w AS STRING)
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM({SQL_DEC("value * value")}) OVER w AS STRING)
                  AS DOUBLE) AS sxx,
             CAST(COUNT(value) OVER w AS DOUBLE) AS n
      FROM base
      WINDOW w AS (
        PARTITION BY user_id ORDER BY t_ms, event_id
        ROWS BETWEEN {ZSCORE_WINDOW_ROWS - 1} PRECEDING AND CURRENT ROW
      )
    )
    SELECT event_id, user_id, t_ms, value,
           {SQL_STR_ROUND6("sx / n")} AS rolling_mean,
           {SQL_STR_ROUND6(
               "CASE WHEN (sxx - sx * sx / n) / n > CAST(0 AS DOUBLE)"
               " THEN (value - sx / n)"
               "      / sqrt((sxx - sx * sx / n) / n)"
               " ELSE CAST(0 AS DOUBLE) END"
           )} AS zscore
    FROM framed
    """,
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score over the trailing 20 events — the
    streaming-adjacent anomaly primitive (alert when a metric departs
    its own recent distribution), batch-shaped here over the events
    fact.

    Cross-engine hazard this query exists to pin: windowed SUMs of
    DOUBLES are NOT reproducible across engines — Spark's sliding
    aggregation and DuckDB's segment tree accumulate in different
    orders — so both moments (Σx, Σx²) accumulate in exact
    DECIMAL(38,10) inside the frame, convert through the string
    route, and the mean/variance/z closed form is the IDENTICAL
    double expression on both engines (the profile correlation
    contract, per-frame).  The frame orders by (epoch-ms, event_id):
    the raw timestamp would order at NANOSECOND precision in DuckDB
    but microsecond in Spark (the TIMESTAMP(NANOS) fixture), so the
    ordering key is pinned to the common millisecond grid with the
    id tiebreak.  Degenerate frames (zero variance — every value
    identical, or n = 1) emit z = 0 by the CASE guard on BOTH
    engines.

    Scale: one shuffle on user_id; frames are ROWS-bounded (20), so
    state per window is O(1) and no partition is corpus-sized unless
    one user is (the profile_key_skew diagnostic's job to catch).
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        F.expr("unix_millis(ts)").alias("t_ms"),
        "value",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t_ms", "event_id")
        .rowsBetween(-(ZSCORE_WINDOW_ROWS - 1), 0)
    )
    sx = F.sum(F.col("value").cast(DEC)).over(w).cast("string").cast("double")
    sxx = (
        F.sum((F.col("value") * F.col("value")).cast(DEC))
        .over(w)
        .cast("string")
        .cast("double")
    )
    n = F.count("value").over(w).cast("double")
    mean = sx / n
    var = (sxx - sx * sx / n) / n
    z = F.when(
        var > F.lit(0.0), (F.col("value") - mean) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    return base.select(
        "event_id",
        "user_id",
        "t_ms",
        "value",
        str_round6(mean).alias("rolling_mean"),
        str_round6(z).alias("zscore"),
    )
