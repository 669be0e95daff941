"""Fixture-table access (TESTDATA.md).

``load_table`` is the single scan entry point for the analytical
layer: a plain ``spark.read.parquet`` so every downstream
``select``/``filter`` benefits from Catalyst column pruning and
parquet predicate pushdown (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: dimension tables small enough to broadcast at any realistic scale
#: (region/nation are bounded by world geography; in the reference's
#: bitcoin schema the analog is price_usd — one row per day).
BROADCAST_TABLES = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # pin the session timezone on whatever session the caller brings
    # (the correctness driver constructs its own): timestamp/date
    # functions must agree byte-for-byte with the UTC-naive parquet
    # the DuckDB oracle reads, regardless of the host JVM's zone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects (PARQUET_TYPE_ILLEGAL).  Read nanos as long via the
    legacy conf and truncate to a microsecond timestamp with *integer*
    division (ns epoch values exceed 2^53, so float division would
    lose exactness).  DuckDB's CAST(ts_ns AS TIMESTAMP) truncates the
    same way, keeping oracle parity.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
