"""SparkSession factory.

Single place where execution-relevant config lives.  The settings are
chosen for correctness-vs-oracle and for scale:

* ``spark.sql.session.timeZone=UTC`` — the DuckDB oracle reads the
  same parquet with UTC-naive timestamps; pinning the session TZ makes
  timestamp functions (date_trunc, to_date) agree byte-for-byte.
* AQE on — runtime broadcast conversion, skew-join splitting and
  shuffle-partition coalescing; this is the knob that makes the same
  declarative plan work at sf0.001 and at 100 TB.
* shuffle partitions default to the local core count; on a real
  cluster this would be ~2-3× total executor cores (or left to AQE's
  coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bitcoin-dw-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # session-catalog tables (bucketed layouts) land here rather
        # than polluting the working directory
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE_DIR", "/tmp/bds-spark-warehouse"
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
