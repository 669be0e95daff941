"""SQL-interface queries — the engine's second front door.

Everything else in the registry is DataFrame-API; these run through
``spark.sql`` over temp views (the path sqlrunner.py exposes for
.sql files) to pin that the SQL surface reaches the same Catalyst
plans — including constructs users write in SQL first: correlated
subqueries (decorrelated by Catalyst into joins, not per-row
re-execution) and scalar subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

# The threshold comparison is algebraically rearranged to avoid any
# division or double summation: price > 2*avg  ⇔  price*n > 2*sum,
# with the sum taken in DECIMAL(38,10) — every quantity in the
# predicate is then exact and order-independent, so Spark's parallel
# aggregation and DuckDB's sequential scan cannot disagree by an ulp
# on boundary rows (the repo's float-determinism contract).
_CORRELATED_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM {orders} o
WHERE CAST(CAST(o.o_totalprice AS STRING) AS DECIMAL(38,10)) * (
        SELECT COUNT(*) FROM {orders} o2
        WHERE o2.o_custkey = o.o_custkey
      ) > (
        SELECT 2 * SUM(CAST(CAST(o3.o_totalprice AS STRING) AS DECIMAL(38,10)))
        FROM {orders} o3
        WHERE o3.o_custkey = o.o_custkey
      )
"""

_SCALAR_SUBQUERY_SQL = """
SELECT n.n_name,
       (SELECT r.r_name FROM {region} r
        WHERE r.r_regionkey = n.n_regionkey) AS region_name,
       (SELECT COUNT(*) FROM {customer} c
        WHERE c.c_nationkey = n.n_nationkey) AS n_customers
FROM {nation} n
"""


@query(
    "sql_correlated_subquery",
    oracle=_CORRELATED_SQL.format(orders="orders"),
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders worth more than 2× their customer's average — written as
    a correlated subquery and executed through ``spark.sql``.

    Catalyst decorrelates this into an aggregate + join (visible in
    the plan: no per-row subquery execution exists in Spark), so the
    SQL-first formulation costs the same as the hand-written
    DataFrame aggregation.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sqlq_orders"
    )
    return spark.sql(_CORRELATED_SQL.format(orders="sqlq_orders"))


@query(
    "sql_scalar_subqueries",
    oracle=_SCALAR_SUBQUERY_SQL.format(
        region="region", customer="customer", nation="nation"
    ),
)
def sql_scalar_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row scalar subqueries (dimension lookup + correlated count)
    through ``spark.sql`` — decorrelated into left joins."""
    for t in ("region", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlq_{t}")
    return spark.sql(
        _SCALAR_SUBQUERY_SQL.format(
            region="sqlq_region",
            customer="sqlq_customer",
            nation="sqlq_nation",
        )
    )
