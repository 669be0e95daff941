"""Plan-audit utilities (explain helpers + plan-shape assertions)."""

from bitcoin_datawarehouse_spark.plans.audit import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_partial_aggregation,
    assert_pushed_filter,
    df_plan,
    explain_str,
    scan_read_schema,
)

__all__ = [
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_partial_aggregation",
    "assert_pushed_filter",
    "df_plan",
    "explain_str",
    "scan_read_schema",
]
