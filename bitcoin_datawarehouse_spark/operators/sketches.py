"""Sketch-based approximate aggregates (the 100 TB substitutes).

Exact count-distinct and exact percentiles need a full shuffle of the
distinct values / a per-group sort; at warehouse scale the standard
substitutes are mergeable sketches — HyperLogLog++ for cardinality,
t-digest (Spark's approx_percentile) for quantiles.  Both are
map-side-combinable: the shuffle carries fixed-size sketch state, not
data.

Sketch contents are engine-specific, so these are rows-only in the
gate; tests/test_sketches.py bounds their error against the exact
operators instead (the meaningful contract for an approximation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

HLL_RSD = 0.02  # 2% relative standard deviation


@query("sketch_hll_distinct_per_group")  # rows-only: HLL internals differ per engine
def sketch_hll_distinct_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order-month via HyperLogLog++ (rsd 2%).

    The shuffle carries one ~kilobyte HLL register set per (month)
    group instead of every distinct custkey — the only viable shape
    for count-distinct over billions of keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month")
        )
        .agg(
            F.approx_count_distinct("o_custkey", rsd=HLL_RSD).alias(
                "approx_customers"
            ),
            F.count("*").alias("n_orders"),
        )
    )


@query("sketch_approx_percentiles")  # rows-only: t-digest internals differ per engine
def sketch_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of extended price per return flag via Spark's
    approx_percentile (accuracy parameter 10000 ≈ 0.01% rank error) —
    the mergeable replacement for the exact sort-based percentile.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # one array-returning sketch call, unpacked to scalar columns —
    # the driver's canonicalizer (pandas row sort) cannot sort arrays
    agg = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
            F.lit(10000),
        ).alias("pcts")
    )
    return agg.select(
        "l_returnflag",
        F.col("pcts")[0].alias("approx_p50"),
        F.col("pcts")[1].alias("approx_p90"),
        F.col("pcts")[2].alias("approx_p99"),
    )


CMS_EPS = 0.001  # over-estimate bound: ≤ ε·N (N = total token stream)
CMS_CONF = 0.99
CMS_SEED = 42


@query("sketch_count_min_token_counts")  # rows-only: sketch internals engine-specific
def sketch_count_min_token_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-min sketch over the corpus token stream, queried for the
    vocabulary-head watch-list, reported next to the exact counts.

    The 100 TB shape: the sketch aggregate is ONE fixed-size state
    (width ⌈2/ε⌉ × depth ⌈log(1/(1-conf))⌉ counters) with map-side
    partial merge — the shuffle carries kilobytes regardless of corpus
    size, where the exact histogram shuffles the vocabulary.  Querying
    the sketch is a driver-side probe of a model-sized artifact
    (here via the JVM CountMinSketch reader on the collected binary);
    the watch-list is whatever term set you care about — the fixture
    uses the exact top-K as the watch-list so the error contract
    (exact ≤ estimate ≤ exact + ε·N, seed-deterministic) is directly
    testable (tests/test_sketches_multimodal.py).
    """
    from bitcoin_datawarehouse_spark.operators.dedup import tokens_col
    from bitcoin_datawarehouse_spark.operators.text_stats import (
        text_token_histogram,
    )

    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    tok = (
        docs.repartition(par)
        .select(F.explode(tokens_col(F.col("text"))).alias("token"))
    )
    sk_row = tok.agg(
        F.count_min_sketch(
            "token", F.lit(CMS_EPS), F.lit(CMS_CONF), F.lit(CMS_SEED)
        ).alias("sk")
    ).collect()[0]
    jcms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk_row["sk"])
    )
    watch = text_token_histogram(spark, sf_dir).collect()  # ≤ K rows
    data = [
        (r["token"], int(r["term_count"]), int(jcms.estimateCount(r["token"])))
        for r in watch
    ]
    return spark.createDataFrame(
        data, "token string, exact_count bigint, cms_count bigint"
    )
