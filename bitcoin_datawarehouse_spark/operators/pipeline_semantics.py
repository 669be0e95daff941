"""Oracle-gated, read-only expressions of the pipeline operators.

The loader's write-path semantics (SURVEY.md §2.2 K5-K8, §2.4 F3,
§2.5 A1) are exercised by tests/test_pipeline.py against a temp
warehouse; the queries here express the SAME dataflow shapes as pure
reads over the fixtures so the driver's DuckDB gate checks them at
sf0.01:

* merge/upsert  — new-batch-wins anti-join + union (pg_loader.py:219-270);
* delete        — predicate filter-rewrite (pg_loader.py:272-294);
* watermark     — MAX-probe then source-side lower-bound filter
                  (pg_loader.py:296-318 + __main__.py:102,114-115).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table


@query(
    "pipeline_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    batch AS (
      SELECT o_orderkey, 'M' AS o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice
    FROM target t
    LEFT JOIN batch b ON b.o_orderkey = t.o_orderkey
    WHERE b.o_orderkey IS NULL
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM batch
    """,
)
def pipeline_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged-upsert dataflow: batch wins on key conflict, all non-key
    columns replaced; unmatched target rows kept; batch-only rows
    inserted.

    Scale shape: one anti-join on the merge key (broadcast when the
    batch is small — the loader broadcasts below a row threshold) +
    union; the target is read and written exactly once.
    """
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    batch = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit("M").alias("o_orderstatus"),
        "o_totalprice",
    )
    return target.join(
        F.broadcast(batch), "o_orderkey", "left_anti"
    ).unionByName(batch)


@query(
    "pipeline_delete_where",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000)
    """,
)
def pipeline_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE-by-predicate as filter-rewrite: survivors of
    ``DELETE WHERE o_orderstatus='F' AND o_totalprice<50000``.

    The engine's Loader.delete_by_condition compiles the same free-form
    condition through F.expr; at scale the anti-predicate is pushed to
    the parquet scan (min/max row-group skipping on o_totalprice).
    """
    orders = load_table(spark, sf_dir, "orders")
    pred = F.expr("o_orderstatus = 'F' AND o_totalprice < 50000")
    return orders.filter(~pred).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "pipeline_watermark_extract",
    oracle="""
    WITH wm AS (
      SELECT MAX(o_orderdate) AS w FROM orders WHERE o_orderdate < DATE '1996-01-01'
    )
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
    FROM orders o, wm
    WHERE o.o_orderdate > wm.w
    """,
)
def pipeline_watermark_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental high-watermark extract: MAX-probe over the 'already
    loaded' slice, then a strict lower-bound filter — the engine's F3
    pushdown.

    The watermark is a one-row aggregate broadcast into the filter (no
    driver collect in the plan); on parquet the ``> wm`` predicate
    prunes row groups by min/max stats, the at-scale equivalent of the
    reference pushing the parameter into the remote query.
    """
    orders = load_table(spark, sf_dir, "orders")
    wm = (
        orders.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
        .agg(F.max("o_orderdate").alias("w"))
    )
    return (
        orders.crossJoin(F.broadcast(wm))
        .filter(F.col("o_orderdate") > F.col("w"))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )
