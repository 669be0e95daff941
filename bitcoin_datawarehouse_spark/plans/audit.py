"""Physical-plan audit helpers — the scale contract, inspectable.

``explain_str`` returns the formatted physical plan for any registered
query; the ``assert_*`` helpers codify the plan properties that make
an operator viable at 100 TB (filters/projections reaching the scan,
dims broadcast, no accidental cartesian products, map-side partial
aggregation).  tests/test_plans.py pins these per-operator; the same
helpers are usable interactively while tuning:

    from bitcoin_datawarehouse_spark.plans.audit import explain_str
    print(explain_str(spark, "agg_daily_revenue", sf_dir))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bitcoin_datawarehouse_spark.registry import QUERIES


def df_plan(df: DataFrame) -> str:
    """Formatted physical plan of a DataFrame (explain('formatted'))."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def explain_str(spark: SparkSession, name: str, sf_dir: str) -> str:
    """Formatted physical plan of a registered query."""
    return df_plan(QUERIES[name](spark, sf_dir))


def assert_no_cartesian(plan: str) -> None:
    assert "CartesianProduct" not in plan, "unexpected cartesian product"


def assert_broadcast_join(plan: str) -> None:
    assert "BroadcastHashJoin" in plan, "expected a broadcast hash join"


def assert_pushed_filter(plan: str, column: str, table: str | None = None) -> None:
    """The filter on ``column`` reaches a parquet scan.  With ``table``
    given, the filter must appear in THAT scan's PushedFilters block —
    in a multi-scan plan, a same-named column pushed on a different
    scan must not mask a pushdown regression on the intended one."""
    if table is None:
        segments = plan.split("PushedFilters")[1:]
        assert segments, "no filters pushed to the scan"
        assert any(column in seg[:300] for seg in segments), (
            f"filter on {column} not pushed to scan"
        )
        return
    scans = [s for s in plan.split("Scan parquet") if table in s[:200]]
    assert scans, f"no parquet scan of {table} in plan"
    assert any(
        column in scan.split("PushedFilters")[1][:300]
        for scan in scans
        if "PushedFilters" in scan
    ), f"filter on {column} not pushed to the {table} scan"


def assert_partial_aggregation(plan: str) -> None:
    assert plan.count("HashAggregate") >= 2, (
        "expected map-side partial + final aggregation"
    )


def scan_read_schema(plan: str, table: str) -> str:
    """The ReadSchema fragment of the scan of ``table`` (for column-
    pruning assertions)."""
    scans = [s for s in plan.split("Scan parquet") if table in s[:200]]
    assert scans, f"no parquet scan of {table} in plan"
    return scans[0].split("ReadSchema:")[1][:400]
