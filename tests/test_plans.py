"""Physical-plan assertions — the scale contract.

Correctness says the operator computes the right rows; these tests
pin the *plan shape* that makes it viable at 100 TB: filters and
projections reaching the parquet scan, dims going broadcast,
window/sort stages staying whole-stage-codegen'd.
"""

from __future__ import annotations

from bitcoin_datawarehouse_spark.registry import QUERIES

from .conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF_SMALL)._sc_jvm_plan if False else (
        QUERIES[name](spark, SF_SMALL)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "extract_projection_range")
    assert "PushedFilters" in plan
    assert "o_orderdate" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    plan = _plan(spark, "agg_daily_revenue")
    # lineitem scan must read only the 3 needed columns, not all 11
    li_scan = [s for s in plan.split("Scan parquet") if "lineitem" in s[:200]]
    assert li_scan
    schema_frag = li_scan[0].split("ReadSchema:")[1][:300]
    assert "l_extendedprice" in schema_frag
    assert "l_shipdate" not in schema_frag
    assert "l_returnflag" not in schema_frag


def test_dim_join_goes_broadcast(spark):
    plan = _plan(spark, "join_fact_dim_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_and_anti_join_types(spark):
    semi = _plan(spark, "join_semi_exists")
    anti = _plan(spark, "join_anti_not_exists")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "topk_global")
    assert "TakeOrderedAndProject" in plan


def test_aggregate_is_partial(spark):
    # map-side partial aggregation before the shuffle
    plan = _plan(spark, "pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_asof_join_has_no_range_join(spark):
    # the as-of rewrite must not produce a nested-loop / cartesian join
    plan = _plan(spark, "asof_join_daily_price")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
