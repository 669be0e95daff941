"""Planted-hub skew probe for the r12 window-min star passes
(r12 VERDICT item 7 / what's-wrong #2).

The r12 rewrite computes each star pass's per-node minima via
``min() OVER (PARTITION BY u)`` — one exchange where the old
groupBy+re-join form shuffled the edge set twice.  The judge's
concern: a window keeps ALL rows of a hot node in one sorted
partition with no map-side partial aggregation, while the old groupBy
at least pre-aggregated the mins — and AQE's skew split never fires
on narrow rows (CLAUDE.md, 256 MB byte threshold).  This probe plants
the adversarial case — ≥10M canonical edges with 50% incident to ONE
hub — and times one large-star pass under both forms, plus the
uniform case as control.

Probe discipline (CLAUDE.md): warmed session, noop sink, best-of-2
timed runs per form, gc.collect() + JVM System.gc() between runs
(the input is an eager localCheckpoint), forms alternated to cancel
machine drift.

Usage: python tools/probe_star_skew.py [n_edges] [hot_frac]
"""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bitcoin_datawarehouse_spark.operators.graph import (  # noqa: E402
    _large_star,
)
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402


def _large_star_groupby(e: DataFrame) -> DataFrame:
    """The pre-r12 form: per-node minima via groupBy + re-join (two
    shuffles of the edge set per pass, but the aggregate side
    collapses hot keys MAP-SIDE via partial aggregation)."""
    both = e.select(
        F.col("hi").alias("u"), F.col("lo").alias("v")
    ).unionByName(e.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
    mins = both.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        both.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("hi"),
            F.least(F.col("mv"), F.col("u")).alias("lo"),
        )
        .distinct()
    )


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    spark = get_spark("probe-star-skew", shuffle_partitions=32)
    sc = spark.sparkContext

    n_hot = int(n_edges * hot_frac)

    def planted(hot: bool) -> DataFrame:
        # hub = vertex 0 with n_hot neighbors; remainder disjoint pairs
        k_hot = n_hot if hot else 0
        hub = spark.range(1, k_hot + 1).select(
            F.col("id").alias("hi"), F.lit(0).cast("long").alias("lo")
        )
        base = 10_000_000_000
        pairs = spark.range(n_edges - k_hot).select(
            (F.lit(base) + F.col("id") * 2 + 1).alias("hi"),
            (F.lit(base) + F.col("id") * 2).alias("lo"),
        )
        return (
            hub.unionByName(pairs)
            .repartition(sc.defaultParallelism)
            .localCheckpoint()
        )

    for label, hot in (("hot50", True), ("uniform", False)):
        e = planted(hot)
        e.count()
        forms = [("window", _large_star), ("groupby", _large_star_groupby)]
        # untimed warm pass per form
        for name, fn in forms:
            sc.setJobDescription(f"warm {label} {name}")
            _noop(fn(e))
        results: dict[str, list[float]] = {n: [] for n, _ in forms}
        for rep in range(2):
            for name, fn in forms:
                gc.collect()
                sc._jvm.System.gc()
                sc.setJobDescription(f"{label} {name} rep{rep}")
                t0 = time.time()
                _noop(fn(e))
                results[name].append(time.time() - t0)
        for name, ts in results.items():
            print(
                f"{label:8s} {name:8s} best {min(ts):6.2f}s "
                f"runs {[round(t, 2) for t in ts]}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
