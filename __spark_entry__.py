"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real implementation lives in ``bitcoin_datawarehouse_spark``;
this module only adapts the registry to the driver's API.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bitcoin_datawarehouse_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_operators,
    ordered_queries,
)

load_all_operators()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: daily revenue (scan → join →
    time-bucketed aggregation); driver checks rows>0."""
    return QUERIES["agg_daily_revenue"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's 50-slot correctness window (the first 50 insertion-
    ordered entries) spans every operator family — see
    ``registry.DRIVER_WINDOW``."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return dict(ORACLES)
