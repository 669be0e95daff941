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


SPINE_DAYS = 60

# Two dialect variants of the same recursive date-spine query.  The
# recursion itself is identical (anchor = earliest order day, step =
# +1 day, bounded by day_idx); only the date-increment spelling
# differs (Spark DATE_ADD(d, 1) vs DuckDB d + 1) and the revenue
# aggregate follows the repo's cross-engine decimal-sum contract
# (Spark direct-casts the double to DECIMAL(38,10); DuckDB routes
# through a string — see functions/numeric.py).
_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE spine(order_day, day_idx) AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS order_day, 0 AS day_idx
  FROM {orders}
  UNION ALL
  SELECT {next_day}, day_idx + 1 FROM spine WHERE day_idx < {max_idx}
),
daily AS (
  SELECT CAST(o.o_orderdate AS DATE) AS order_day,
         {revenue_sum} AS revenue,
         COUNT(*) AS n_items
  FROM {lineitem} l
  JOIN {orders} o ON l.l_orderkey = o.o_orderkey
  GROUP BY CAST(o.o_orderdate AS DATE)
)
SELECT s.order_day, s.day_idx,
       COALESCE(d.revenue, CAST(0 AS DOUBLE)) AS revenue,
       COALESCE(d.n_items, CAST(0 AS BIGINT)) AS n_items
FROM spine s
LEFT JOIN daily d ON s.order_day = d.order_day
"""

_REV_EXPR = "l.l_extendedprice * (1 - l.l_discount)"


def _spine_sql_duckdb() -> str:
    from bitcoin_datawarehouse_spark.functions.numeric import SQL_DEC

    return _RECURSIVE_SPINE_SQL.format(
        orders="orders",
        lineitem="lineitem",
        next_day="order_day + 1",
        max_idx=SPINE_DAYS - 1,
        revenue_sum=(
            f"CAST(ROUND(SUM({SQL_DEC(_REV_EXPR)}), 2) AS DOUBLE)"
        ),
    )


@query("sql_recursive_date_spine", oracle=_spine_sql_duckdb())
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free daily-revenue calendar via ``WITH RECURSIVE`` (Spark
    4.x recursive CTE): a 60-day date spine anchored at the earliest
    order day, left-joined to per-day revenue with zero-fill for days
    that had no orders — the classic time-series gap-filling query,
    written the way a SQL user writes it.

    Plan shape: the recursion materializes a 60-row spine driver-side
    (UnionLoop, bounded by ``day_idx``, far under Spark's default
    100-level recursion limit); the revenue aggregate is the same
    orderkey-shuffle + day-keyed hash aggregate as
    ``agg_daily_revenue``; the spine joins in as the broadcast side.
    The recursion depth is a constant (calendar window), independent
    of data volume — safe at any scale.
    """
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlq_{t}")
    return spark.sql(
        _RECURSIVE_SPINE_SQL.format(
            orders="sqlq_orders",
            lineitem="sqlq_lineitem",
            next_day="DATE_ADD(order_day, 1)",
            max_idx=SPINE_DAYS - 1,
            revenue_sum=(
                "CAST(ROUND(SUM(CAST(" + _REV_EXPR
                + " AS DECIMAL(38,10))), 2) AS DOUBLE)"
            ),
        )
    )
