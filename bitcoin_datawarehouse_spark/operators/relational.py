"""Core relational operator inventory (SURVEY.md §2.11).

The reference delegates all of these to a remote SQL engine behind
opaque ``query_id``s (reference ``etl_system/etl_job.csv:2-6``); this
module brings the surface in-process as declarative DataFrame plans so
Catalyst/AQE picks physical strategies (broadcast vs sort-merge joins,
partial aggregation, pushdown).

Every query here is paired with a DuckDB oracle.  Scale notes are in
each docstring: the fixtures are TPC-H-shaped, so the standard
cluster-scale playbook applies — fact-fact joins shuffle on the join
key, fact-dim joins broadcast the dim, aggregates are partial-agg'd
map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import (
    DEC,
    SQL_DAVG,
    SQL_DSUM,
    davg,
    dsum,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table


# ---------------------------------------------------------------------------
# Projection + range filter — the shape of the reference's five extract
# queries (`SELECT <cols> FROM <src> WHERE <time col> >= :date`,
# SURVEY.md §2.11 row 1; watermark pushdown F3).
# ---------------------------------------------------------------------------

@query(
    "extract_projection_range",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def extract_projection_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + high-watermark range filter.

    At scale: both the column projection and the ``>=`` predicate reach
    the parquet scan (ReadSchema / PushedFilters), so row groups whose
    max(o_orderdate) is below the watermark are skipped entirely — the
    same effect as the reference's source-side parameter pushdown
    (reference ``dune_extractor.py:59``).
    """
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: the canonical groupBy-agg.
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {SQL_DSUM("l_quantity", "sum_qty")},
      {SQL_DSUM("l_extendedprice", "sum_base_price")},
      {SQL_DSUM("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
      {SQL_DSUM("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
      {SQL_DAVG("l_quantity", "avg_qty")},
      {SQL_DAVG("l_extendedprice", "avg_price")},
      {SQL_DAVG("l_discount", "avg_disc")},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY with 8 aggregates (sum/avg/count) over the fact table.

    At scale: hash aggregate with map-side partial combine — the
    shuffle carries only (flag,status)×partials, not rows.  Grouping
    cardinality is tiny (≤6 groups), so AQE coalesces the post-shuffle
    partitions.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.11 rows 2-5, §2.6)
# ---------------------------------------------------------------------------

@query(
    "join_fact_dim_broadcast",
    oracle=f"""
    SELECT
      c.c_mktsegment,
      COUNT(*) AS n_orders,
      {SQL_DSUM("o.o_totalprice", "segment_value")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_fact_dim_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join fact↔dim with an explicit broadcast hint.

    At scale: customer (the dim side here) is broadcast, so the join is
    shuffle-free on the fact table; the groupBy then shuffles only
    5 segment partials.  The analog in the reference's schema is
    transactions ⋈ block (SURVEY.md §1.3).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice"), "segment_value"),
        )
    )


@query(
    "join_star_regional_revenue",
    oracle=f"""
    SELECT
      r.r_name,
      n.n_name,
      {SQL_DSUM("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY r.r_name, n.n_name
    """,
)
def join_star_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table star join (local-supplier revenue by nation).

    At scale: lineitem⋈orders and orders⋈customer are fact-fact
    shuffles on their keys; supplier/nation/region are broadcast.  The
    date filter is pushed to the orders scan, shrinking the largest
    shuffle before it happens.  This mirrors the reference's implied
    star schema joins (SURVEY.md §1.3).
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "join_left_order_counts",
    oracle=f"""
    SELECT
      c.c_custkey,
      c.c_name,
      COUNT(o.o_orderkey) AS n_orders,
      CAST(ROUND(COALESCE(SUM(CAST(CAST(o.o_totalprice AS STRING) AS DECIMAL(38,10))),
                          CAST(0 AS DECIMAL(38,10))), 2) AS DOUBLE)
        AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders.

    At scale: both sides shuffle on custkey (fact-fact); count/sum are
    partial-agg'd.  COALESCE pins the no-orders group to 0.0 in both
    engines.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0).cast(DEC)
                ),
                2,
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


@query(
    "join_semi_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with ≥1 urgent order.

    At scale: semi join never duplicates left rows and Spark can stop
    probing per key at first match; the priority filter is pushed to
    the orders scan before the shuffle.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi")


@query(
    "join_anti_not_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders.

    Same physical shape as the merge rewrite in the pipeline loader
    (old ⟕anti new) — SURVEY.md §2.2 K7.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@query(
    "join_self_nation_pairs",
    oracle="""
    SELECT
      a.n_name AS nation_a,
      b.n_name AS nation_b,
      a.n_regionkey AS shared_regionkey
    FROM nation a
    JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_self_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with aliases — same-region nation pairs.

    The analog of the reference's implied block-chain self-join
    (``block.previous_block_hash = parent.hash``, SURVEY.md §1.3).
    The ``<`` condition halves the pair space and makes output
    deterministic.
    """
    n = load_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
            F.col("a.n_regionkey").alias("shared_regionkey"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation variants (SURVEY.md §2.11 rows 6-7)
# ---------------------------------------------------------------------------

@query(
    "agg_daily_revenue",
    oracle=f"""
    SELECT
      CAST(o.o_orderdate AS DATE) AS order_day,
      {SQL_DSUM("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
      COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY CAST(o.o_orderdate AS DATE)
    """,
)
def agg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed revenue (flagship query; entry() runs this).

    At scale: one fact-fact shuffle on orderkey, then an aggregate
    keyed by day — ~2.5k groups, partial-agg'd map-side.  At 100 TB
    the orders table would be date-partitioned so the day grouping
    aligns with partition boundaries.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(DISTINCT o_custkey) AS n_customers,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group.

    At scale: Spark expands distinct aggregation into a two-phase
    plan (partial distinct on (priority, custkey), then count); for
    100 TB cardinality estimation use the approx variant below.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query("agg_approx_count_distinct")  # rows-only: HLL sketches are engine-specific
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB-scale variant
    of agg_count_distinct.  No oracle: sketch estimates are
    engine-specific by design; tests assert ≤2% relative error vs the
    exact count instead.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a column pair — exact dedup of the key space."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (SURVEY.md §2.11 row 11)
# ---------------------------------------------------------------------------

@query(
    "topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tiebreak.

    At scale: Spark compiles orderBy+limit to TakeOrderedAndProject —
    each partition keeps its local top-20, only 20×P rows reach the
    driver-side merge; no global sort.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.11 row 12)
# ---------------------------------------------------------------------------

@query(
    "setop_union",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.unionByName(op).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — customers with both statuses."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers with F-status but no O-status orders."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(op)


# ---------------------------------------------------------------------------
# Rollup / cube / grouping sets (SURVEY.md §2.11 row 13)
# ---------------------------------------------------------------------------

@query(
    "rollup_revenue",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {SQL_DSUM("l_quantity", "sum_qty")},
      COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: (flag,status) + (flag) subtotals + grand total."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity"), "sum_qty"), F.count("*").alias("n_rows"))
    )


@query(
    "cube_revenue",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {SQL_DSUM("l_quantity", "sum_qty")},
      COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the same pair — all 4 grouping combinations."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity"), "sum_qty"), F.count("*").alias("n_rows"))
    )


@query(
    "grouping_sets_priority",
    oracle=f"""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n_orders,
      {SQL_DSUM("o_totalprice", "total_value")}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL over a temp view."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT
          o_orderstatus,
          o_orderpriority,
          COUNT(*) AS n_orders,
          {SQL_DSUM("o_totalprice", "total_value")}
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# Scalar functions / expressions (SURVEY.md §2.11 row 14; P2 `UPPER` parity)
# ---------------------------------------------------------------------------

@query(
    "scalar_functions_showcase",
    oracle="""
    SELECT
      c_custkey,
      UPPER(c_name) AS name_upper,
      SUBSTRING(c_name, 1, 9) AS name_prefix,
      CONCAT(c_mktsegment, ':', c_name) AS segment_tag,
      LENGTH(c_name) AS name_len,
      CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
      ABS(c_acctbal) AS bal_abs,
      c_acctbal * 2.0 + 1.0 AS bal_scaled,
      COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other
    FROM customer
    """,
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math functions incl. the reference's only transform
    function, ``UPPER([entity])`` (reference
    ``column_transform.yaml:8``; SURVEY.md §2.3 P2).

    All JVM-side built-ins — one narrow whole-stage-codegen pass, no
    shuffle, no Python.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias(
            "segment_tag"
        ),
        F.length("c_name").alias("name_len"),
        F.floor("c_acctbal").alias("bal_floor"),
        F.abs(F.col("c_acctbal")).alias("bal_abs"),
        (F.col("c_acctbal") * 2.0 + 1.0).alias("bal_scaled"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("segment_or_other"),
    )


@query(
    "expr_case_when_buckets",
    oracle=f"""
    SELECT
      CASE
        WHEN o_totalprice < 50000 THEN 'small'
        WHEN o_totalprice < 200000 THEN 'medium'
        ELSE 'large'
      END AS size_bucket,
      COUNT(*) AS n_orders,
      {SQL_DSUM("o_totalprice", "bucket_value")}
    FROM orders
    GROUP BY 1
    """,
)
def expr_case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregate."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("size_bucket")).agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice"), "bucket_value"),
    )


# ---------------------------------------------------------------------------
# Time bucketing + JSON (SURVEY.md §2.11 row 15; §2.12 MapType props)
# ---------------------------------------------------------------------------

@query(
    "time_bucket_hourly",
    oracle=f"""
    SELECT
      date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_hour,
      event_type,
      COUNT(*) AS n_events,
      {SQL_DSUM("value", "sum_value")}
    FROM events
    GROUP BY 1, 2
    """,
)
def time_bucket_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour, per-type event aggregation (batch analog of a
    streaming tumbling window; the streaming variant lives in
    streaming/incremental.py).
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "sum_value"))
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT
      event_type,
      CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS sum_k,
      COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
        AS n_with_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``props.k`` out of the JSON
    string column and aggregate it (SURVEY.md §2.12 MapType props).

    get_json_object is JVM-side (Jackson), no Python; at scale prefer
    `from_json` with an explicit schema once the shape is known —
    shown in tests — since it parses once per row for many fields.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
    )


# ---------------------------------------------------------------------------
# Pivot (wide aggregation)
# ---------------------------------------------------------------------------

@query(
    "pivot_status_value",
    oracle=f"""
    SELECT
      o_orderpriority,
      {SQL_DSUM("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", "F")},
      {SQL_DSUM("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", "O")},
      {SQL_DSUM("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", "P")}
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order value by status into wide columns.

    Explicit pivot values keep the plan static (no extra distinct-scan
    job to discover them — important at scale).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum(F.col("o_totalprice").cast(DEC)), 2).cast("double"))
    )
