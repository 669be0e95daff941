"""Co-occurrence affinity (market-basket pairs) over order contents.

The classic "customers who bought X also bought Y" aggregate: which
part brands co-occur in the same order more often than independence
predicts (lift > 1).  The same plan shape serves any co-occurrence
mining — tags per document, tokens per session, services per incident.

Scale design — the ER-block lesson applied to baskets: the pair
explosion is an equi-self-join on the ORDER key, so candidate work is
Σ_orders k² with k = distinct brands per order (≤ 7 lineitems in
TPC-H shape; bounded by basket size in any real catalog, never by
catalog²).  Mechanics: one lineitem⋈part projection to (orderkey,
brand), a DISTINCT to collapse within-order repeats (also bounds k),
the within-order pair join with ``brand_a < brand_b`` (each unordered
pair once), then a brand-pair aggregate whose output is catalog²-
bounded, not order-bounded.  Lift's marginals ride the same distinct
frame.  Every exposed ratio is an exact-integer quotient through the
6-dp string route, so the view hash-gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.cachereg import cache_tracked
from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: report pairs supported by at least this many orders
AFFINITY_MIN_SUPPORT = 5


@query(
    "affinity_brand_pairs",
    oracle=f"""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS orderkey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n_orders AS (
      SELECT CAST(COUNT(DISTINCT orderkey) AS BIGINT) AS n FROM ob
    ),
    marginals AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_brand
      FROM ob GROUP BY brand
    ),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ob a JOIN ob b
        ON a.orderkey = b.orderkey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, n_both,
           ma.n_brand AS n_a, mb.n_brand AS n_b,
           {SQL_STR_ROUND6(
               "(CAST(n_both AS DOUBLE) * CAST(n.n AS DOUBLE))"
               " / (CAST(ma.n_brand AS DOUBLE)"
               " * CAST(mb.n_brand AS DOUBLE))"
           )} AS lift
    FROM pairs
    JOIN marginals ma ON ma.brand = pairs.brand_a
    JOIN marginals mb ON mb.brand = pairs.brand_b
    CROSS JOIN n_orders n
    WHERE n_both >= {AFFINITY_MIN_SUPPORT}
    """,
)
def affinity_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-occurrence with lift — within-basket pair join (work
    Σ_orders k², never catalog²), support-filtered, hash-gated."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = cache_tracked(
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("p_brand").alias("brand"),
        )
        .distinct()
    )
    n_orders = ob.select("orderkey").distinct().count()
    marginals = ob.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brand")
    )
    a = ob.select(
        "orderkey", F.col("brand").alias("brand_a")
    )
    b = ob.select(
        "orderkey", F.col("brand").alias("brand_b")
    )
    pairs = (
        a.join(b, "orderkey")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .where(F.col("n_both") >= AFFINITY_MIN_SUPPORT)
    )
    ma = marginals.select(
        F.col("brand").alias("brand_a"), F.col("n_brand").alias("n_a")
    )
    mb = marginals.select(
        F.col("brand").alias("brand_b"), F.col("n_brand").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            "n_a",
            "n_b",
            str_round6(
                (
                    F.col("n_both").cast("double")
                    * F.lit(float(n_orders))
                )
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                )
            ).alias("lift"),
        )
    )
