"""Table profiling (data-quality / catalog statistics view).

One row of statistics per column — null count, exact distinct count,
typed min/max — the view a warehouse surfaces as ``ANALYZE`` output
and an ELT pipeline reads to validate a load (the reference's
notebook count-verification loop is the manual version of this;
`data_integration` README §verification).

Scale design: the whole profile is ONE aggregate pass over the table.
Exact COUNT(DISTINCT) on k columns makes Spark expand the input k-way
before the hash aggregate (still map-side partial, no extra shuffle
of the raw table) — the standard exact path.  At 100 TB swap
``approx_count_distinct`` (HLL, one pass, no expand) and keep min/max
exact; the fixture keeps exact distinct so the DuckDB oracle matches
bit-for-bit.  Numeric min/max are exposed as DOUBLE (min/max select an
actual row value, identical in both engines — no decimal surface, see
functions/numeric.py on decimal canonicalization) and string/timestamp
ones as VARCHAR (a raw double→string cast formats differently across
engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: (column, kind) of the profiled table; kind picks the min/max slot
_ORDERS_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "str"),
    ("o_orderpriority", "str"),
]

_DEC = "double"


def _profile_struct(name: str, kind: str) -> Column:
    c = F.col(name)
    if kind == "num":
        min_num, max_num = F.min(c).cast(_DEC), F.max(c).cast(_DEC)
        min_str = max_str = F.lit(None).cast("string")
    else:
        min_num = max_num = F.lit(None).cast(_DEC)
        min_str, max_str = (
            F.min(c).cast("string"),
            F.max(c).cast("string"),
        )
    return F.struct(
        F.lit(name).alias("col"),
        (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_nulls"),
        F.count_distinct(c).cast("long").alias("n_distinct"),
        min_num.alias("min_num"),
        max_num.alias("max_num"),
        min_str.alias("min_str"),
        max_str.alias("max_str"),
    )


def _oracle_leg(name: str, kind: str) -> str:
    if kind == "num":
        mins = (
            f"CAST(MIN({name}) AS DOUBLE) AS min_num, "
            f"CAST(MAX({name}) AS DOUBLE) AS max_num, "
            "CAST(NULL AS VARCHAR) AS min_str, "
            "CAST(NULL AS VARCHAR) AS max_str"
        )
    else:
        mins = (
            "CAST(NULL AS DOUBLE) AS min_num, "
            "CAST(NULL AS DOUBLE) AS max_num, "
            f"CAST(MIN({name}) AS VARCHAR) AS min_str, "
            f"CAST(MAX({name}) AS VARCHAR) AS max_str"
        )
    return (
        f"SELECT '{name}' AS col, "
        f"COUNT(*) - COUNT({name}) AS n_nulls, "
        f"COUNT(DISTINCT {name}) AS n_distinct, {mins} FROM orders"
    )


@query(
    "profile_column_stats",
    oracle=" UNION ALL ".join(
        _oracle_leg(n, k) for n, k in _ORDERS_COLS
    ),
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``orders``: nulls, exact distinct, typed
    min/max — one aggregate pass, then a 6-row explode of the
    single result row into long form (no second scan, no collect)."""
    orders = load_table(spark, sf_dir, "orders")
    one = orders.agg(
        F.array(
            *[_profile_struct(n, k) for n, k in _ORDERS_COLS]
        ).alias("cols")
    )
    return one.select(F.explode("cols").alias("c")).select("c.*")
