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


def cluster_conf(
    executor_cores_total: int, target_sf_tb: float = 100.0
) -> dict[str, str]:
    """Recommended conf for the real deployment (a 1000-executor
    cluster over ~100 TB) — the knobs that change from the local[32]
    test profile, with the reasoning each encodes:

    * shuffle partitions ≈ 3× total cores, with AQE coalescing DOWN
      from there — undershooting makes partitions spill, overshooting
      only costs scheduler overhead that AQE removes;
    * 256 MB input splits: fewer, fatter scan tasks — parquet footer
      and task-launch overhead amortize, and the vectorized reader
      streams within a split;
    * 64 MB broadcast threshold — executor memory on a real cluster
      affords bigger dimension broadcasts than a laptop default
      (10 MB), and every broadcast join is a shuffle avoided;
    * AQE on (runtime coalescing, broadcast conversion, skew split) —
      the license to leave logical plans declarative;
    * speculative execution — at 1000 executors a straggler per stage
      is a certainty, not a tail risk;
    * shuffle + RDD compression with zstd — shuffle volume is the
      scarce resource at 100 TB; cycles are cheaper than network.
    * runtime bloom filters — on a selectively-filtered dimension leg
      of a shuffle join, Catalyst builds a bloom filter over the
      build side's join keys and probes it at the fact SCAN, pruning
      rows before they ever enter the exchange (the runtime
      complement of static partition pruning; plan shape pinned in
      tests/test_plans.py::test_runtime_bloom_filter_join_pruning —
      the fixture sits under the 10 GB application-side threshold, so
      the local profile never triggers it spuriously).
    """
    shuffle_parts = max(256, executor_cores_total * 3)
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        "spark.speculation": "true",
        "spark.io.compression.codec": "zstd",
        "spark.shuffle.compress": "true",
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    }
