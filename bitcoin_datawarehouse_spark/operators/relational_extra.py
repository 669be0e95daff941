"""Relational surface completion (SURVEY.md §2.11 gaps).

Full-outer join, HAVING, UNION ALL, ntile/percent_rank/cume_dist, and
exact interpolated percentiles — the remaining standard-SQL shapes not
yet covered by operators/relational.py and operators/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_DSUM,
    SQL_STR_ROUND6,
    dsum,
    str_round6,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table


@query(
    "join_full_outer",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0
    ),
    ords AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(ROUND(SUM(CAST(CAST(o_totalprice AS STRING) AS DECIMAL(38,10))), 2)
                  AS DOUBLE) AS total_spend
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_custkey
    )
    SELECT cust.c_custkey, cust.c_name, ords.o_custkey,
           ords.n_orders, ords.total_spend
    FROM cust FULL OUTER JOIN ords ON cust.c_custkey = ords.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join: even-keyed customers × open-order
    aggregates — rows survive from both unmatched sides.

    Scale note: full-outer cannot broadcast (both sides must be
    preserved), so this is a shuffle join on the key by construction —
    exactly what Catalyst picks; AQE handles skew splitting.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select("c_custkey", "c_name")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "total_spend"),
        )
    )
    return cust.join(
        ords, cust["c_custkey"] == ords["o_custkey"], "full_outer"
    ).select("c_custkey", "c_name", "o_custkey", "n_orders", "total_spend")


@query(
    "agg_having",
    oracle=f"""
    SELECT l_suppkey, COUNT(*) AS n_items,
           {SQL_DSUM("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) >= 200 AND SUM(CAST(CAST(l_quantity AS STRING) AS DECIMAL(38,10))) > 5000
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING: post-aggregation predicate — in Spark simply
    a filter over the aggregate (Catalyst keeps it after the partial/
    final hash aggregate; no extra shuffle)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"), dsum(F.col("l_quantity"), "sum_qty"))
        .filter((F.col("n_items") >= 200) & (F.col("sum_qty") > 5000))
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT 'input' AS flow, o_custkey AS party, o_totalprice AS amount
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT 'output' AS flow, o_custkey AS party, o_totalprice AS amount
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, duplicates kept) — the reference's
    inputs+outputs flow union shape; zero-shuffle in Spark (plain
    concatenation of partitions)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.lit("input").alias("flow"),
        F.col("o_custkey").alias("party"),
        F.col("o_totalprice").alias("amount"),
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("output").alias("flow"),
        F.col("o_custkey").alias("party"),
        F.col("o_totalprice").alias("amount"),
    )
    return a.unionByName(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (multiplicities subtract, not
    collapse): a customer with three F-orders and one O-order keeps
    two rows."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.exceptAll(op)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection (min of multiplicities)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(op)


@query(
    "agg_string_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): collect per
    group, sort INSIDE the aggregate for determinism, join.

    The explicit array_sort is the part that matters: collect_list
    order is partition-arrival order (nondeterministic under
    parallelism), so any string_agg without an ORDER BY is
    unreproducible by construction — here and in any engine.
    """
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations")
        )
    )


@query(
    "window_ntile_dist",
    oracle=f"""
    SELECT c_custkey, c_nationkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           {SQL_STR_ROUND6('percent_rank() OVER w')} AS pct_rank,
           {SQL_STR_ROUND6('cume_dist() OVER w')} AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile quartiles, percent_rank,
    cume_dist per nation ordered by account balance.

    Ranking ties are broken by c_custkey so both engines see one total
    order; the two ratios are rounded to 6 places (they are exact
    small-integer divisions, rounding only guards ulp differences).
    """
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        str_round6(F.percent_rank().over(w)).alias("pct_rank"),
        str_round6(F.cume_dist().over(w)).alias("cume"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90/p99) per group.

    Exact percentile is a sort-based aggregate — fine per bounded
    group; at 100 TB with huge groups the drop-in replacement is
    approx_percentile (t-digest sketch, mergeable map-side) at a
    declared error bound.  All three quantiles come from ONE
    array-percentile aggregate: three scalar percentile() calls each
    buffer the whole group's values independently (measured 2.5 s →
    0.9 s at sf0.1); the array form buffers once and reads three
    points off the same sorted run.  Rounded to 4 places: the
    interpolation ``lo + frac*(hi-lo)`` can differ by 1 ulp between
    engines.
    """
    ps = F.percentile(
        "l_extendedprice",
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(ps.alias("_ps"))
        .select(
            "l_returnflag",
            F.round(F.col("_ps")[0], 4).alias("p50"),
            F.round(F.col("_ps")[1], 4).alias("p90"),
            F.round(F.col("_ps")[2], 4).alias("p99"),
        )
    )
