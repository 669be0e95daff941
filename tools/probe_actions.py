"""Trace every driver-side action a registered query executes.

Optimization-round instrument (guide §1): at sf0.1 the per-stage
scheduling floor dominates, so a query's wall is largely (number of
sequential driver actions) x (per-action floor).  This probe
monkeypatches the Python-side materialization points — collect /
count / isEmpty / toPandas / localCheckpoint / noop-writes /
saveAsTable — and prints one line per action with its wall seconds
and the caller, then the total.

Usage: python tools/probe_actions.py QUERY [QUERY ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Spark 4 classic-mode instances subclass pyspark.sql.DataFrame and
# OVERRIDE the action methods — patch the classic class, not the parent
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from bitcoin_datawarehouse_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_operators,
)
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402
from bitcoin_datawarehouse_spark.functions.cachereg import (  # noqa: E402
    release_tracked_caches,
)

LOG: list[tuple[str, float, str]] = []
ENABLED = False


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "bitcoin_datawarehouse_spark" in fn:
            return f"{Path(fn).name}:{fr.lineno}:{fr.name}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def wrapper(self, *a, **kw):
        if not ENABLED:
            return orig(self, *a, **kw)
        t0 = time.time()
        out = orig(self, *a, **kw)
        LOG.append((name, time.time() - t0, _caller()))
        return out

    setattr(cls, name, wrapper)


for m in ("collect", "count", "isEmpty", "toPandas", "localCheckpoint"):
    _wrap(DataFrame, m)
for m in ("save", "saveAsTable", "parquet"):
    _wrap(DataFrameWriter, m)


def main() -> int:
    global ENABLED
    names = sys.argv[1:]
    load_all_operators()
    spark = get_spark(
        "probe-actions",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    from bitcoin_datawarehouse_spark.tables import cache_tables

    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cache_tables(
        spark,
        sf_dir,
        ["region", "nation", "customer", "supplier", "part", "orders",
         "lineitem", "events"],
    )
    import pandas as _pd  # noqa: F401

    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = QUERIES[name]
        # untimed warm pass (bench methodology)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_tracked_caches()
        LOG.clear()
        ENABLED = True
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        total = time.time() - t0
        ENABLED = False
        release_tracked_caches()
        print(f"=== {name}: total {total:.2f}s, {len(LOG)} actions")
        for op, dt, caller in LOG:
            print(f"  {dt:7.3f}s  {op:15s}  {caller}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
