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
CMS_SEED = 42
#: standard count-min sizing: width = ⌈2/ε⌉ counters per row, depth
#: rows ⇒ Pr[est > exact + ε·N] ≤ 2^-depth-ish (independent rows)
CMS_WIDTH = 2000
CMS_DEPTH = 5


@query("sketch_count_min_token_counts")  # rows-only: sketch internals engine-specific
def sketch_count_min_token_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Count-min sketch over the corpus token stream, queried for the
    vocabulary-head watch-list, reported next to the exact counts.

    The 100 TB shape: each partition folds its token stream into ONE
    fixed-size counter table (depth × width int64, here 5 × 2000)
    inside an Arrow kernel, emitting only its non-zero cells; a
    map-side-combining sum merges the partials — the shuffle carries
    ≤ partitions × table-size rows regardless of corpus size, where
    the exact histogram shuffles the vocabulary.  The PROBE side is a
    lazy plan too: each watch-list term's depth positions are the
    same md5-derived indices the kernel used, computed JVM-side
    (md5/conv expressions), equi-joined against the counter table,
    and min-reduced per term — so the whole query is one DataFrame
    with no driver-side collect, no ``spark._jvm`` py4j access, and
    no classic-API dependency (Spark Connect-compatible; the previous
    revision pre-computed the result on the driver via the JVM
    CountMinSketch reader, r4 ADVICE).  Estimates are rows-only in
    the gate (sketch internals are ours), but hash-deterministic:
    md5 positions, integer counters.  Error contract (exact ≤
    estimate ≤ exact + ε·N) is pinned in
    tests/test_sketches_multimodal.py.
    """
    import hashlib

    import numpy as np
    import pandas as pd

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

    depth, width, seed = CMS_DEPTH, CMS_WIDTH, CMS_SEED

    def update(batches):
        # one counter table per partition, merged across its batches;
        # per-token positions match the probe expressions bit-for-bit
        table = np.zeros((depth, width), dtype=np.int64)
        memo: dict[str, list[int]] = {}
        for pdf in batches:
            for token, cnt in pdf["token"].value_counts().items():
                pos = memo.get(token)
                if pos is None:
                    if len(memo) >= 200_000:
                        memo.clear()
                    pos = [
                        int(
                            hashlib.md5(
                                f"{seed}:{r}:{token}".encode()
                            ).hexdigest()[:15],
                            16,
                        )
                        % width
                        for r in range(depth)
                    ]
                    memo[token] = pos
                for r in range(depth):
                    table[r, pos[r]] += int(cnt)
        rs, cs = np.nonzero(table)
        yield pd.DataFrame(
            {"r": rs.astype(np.int32), "c": cs.astype(np.int64),
             "cnt": table[rs, cs]}
        )

    counters = (
        tok.mapInPandas(update, "r int, c long, cnt long")
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )

    # probe: same md5-position derivation, as JVM expressions over the
    # bounded watch-list (the exact top-K histogram — so the error
    # contract is directly testable against exact_count)
    watch = text_token_histogram(spark, sf_dir)
    pos_arr = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(f"{seed}:{r}:"), F.col("token"))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % width
            for r in range(depth)
        ]
    )
    probe = watch.select(
        "token",
        F.col("term_count").alias("exact_count"),
        F.posexplode(pos_arr).alias("r", "c"),
    )
    return (
        probe.join(F.broadcast(counters), ["r", "c"], "left")
        .groupBy("token", "exact_count")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_count")
        )
    )
