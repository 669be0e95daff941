"""Range / interval join (SURVEY.md §7 "what's hard": as-of & range
joins at scale).

A naive interval join (``e.ts BETWEEN i.start AND i.end``) has no
equi-key, so engines fall back to a nested-loop/cartesian plan —
O(|events|×|intervals|) and a single-node broadcast loop at best.
The scale-safe rewrite used here is bucketization: quantize time into
fixed buckets, explode each interval over the buckets it covers, and
join on bucket equality BEFORE refining with the exact range
predicate.  Cost becomes O(|events| + Σ interval_spans) shuffled by a
uniform key — the standard distributed interval-join design (used by
every warehouse's range-join optimization, e.g. the published
range-join bucketing in open-source engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

INTERVAL_DAYS = 7
PRICE_FLOOR = 498000  # ≈p99.9 of o_totalprice → rare orders, gate-sized


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-value orders become [o_orderdate, o_orderdate +
    INTERVAL_DAYS) "campaign windows" — the interval side of the
    join."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_totalprice") > PRICE_FLOOR).select(
        F.col("o_orderkey").alias("campaign_id"),
        F.col("o_orderdate").alias("start_date"),
        F.date_add(F.col("o_orderdate"), INTERVAL_DAYS).alias("end_date"),
    )


@query(
    "join_range_bucketized",
    oracle=f"""
    WITH intervals AS (
      SELECT o_orderkey AS campaign_id,
             o_orderdate AS start_date,
             o_orderdate + INTERVAL {INTERVAL_DAYS} DAYS AS end_date
      FROM orders WHERE o_totalprice > {PRICE_FLOOR}
    )
    SELECT i.campaign_id, l.l_orderkey, l.l_linenumber, l.l_shipdate
    FROM lineitem l
    JOIN intervals i
      ON l.l_shipdate >= i.start_date AND l.l_shipdate < i.end_date
    """,
)
def join_range_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via bucketize-then-refine.

    Each interval explodes over the ~30 daily buckets it covers; each
    lineitem has exactly one bucket (its ship date); the join is a
    plain hash equi-join on the bucket, then the exact range predicate
    filters boundary buckets.  The plan contains NO nested loop
    (asserted in tests/test_plans.py) — at 100 TB both sides shuffle
    once on a uniform date key instead of looping.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    iv = _intervals(spark, sf_dir)
    iv_exploded = iv.select(
        "campaign_id",
        "start_date",
        "end_date",
        F.explode(
            F.sequence(
                F.col("start_date"),
                F.date_sub(F.col("end_date"), 1),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("bucket"),
    )
    return (
        li.join(iv_exploded, li["l_shipdate"] == iv_exploded["bucket"])
        .filter(
            (F.col("l_shipdate") >= F.col("start_date"))
            & (F.col("l_shipdate") < F.col("end_date"))
        )
        .select("campaign_id", "l_orderkey", "l_linenumber", "l_shipdate")
    )
