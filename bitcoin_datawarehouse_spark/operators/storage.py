"""Storage-layout operators: z-order clustering for multi-dimensional
data skipping.

A 100 TB fact table answers single-dimension range scans well if it is
sorted by that dimension — and terribly on every other dimension,
because each parquet row group's min/max for the un-sorted columns
span the whole domain.  Z-ordering (bit-interleaving order-preserving
bucket ids, functions/zorder.py) makes contiguous key ranges small
hyper-rectangles, so row-group stats stay tight on BOTH interleaved
dimensions and 2-D predicates prune most of the table
(tools/probe_zorder.py measures the effect at sf10; SCALING.md).

The gate query exposes the z-cell map of `orders` over
(customer, order-day): runtime-adaptive bucket scales (scalar MAX
subqueries — the AUTO_BITS_SQL precedent), exact monotone integer
bucketing, and the Morton interleave — all integer arithmetic, so the
DuckDB oracle computes bit-identical cell ids with `<<`/`&`/`|`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.zorder import (
    bucketize,
    sql_bucketize,
    sql_zorder2,
    zorder2,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: z-key resolution per dimension (16 bits each → 32-bit Morton key)
Z_BITS = 16


@query(
    "storage_zorder_cells",
    oracle=f"""
    WITH scale AS (
      SELECT CAST(MAX(o_custkey) + 1 AS BIGINT) AS mc,
             MIN(CAST(o_orderdate AS DATE)) AS d0,
             CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                            MAX(CAST(o_orderdate AS DATE))) + 1 AS BIGINT)
               AS md
      FROM orders
    ),
    buckets AS (
      SELECT
        {sql_bucketize("o_custkey", "mc", Z_BITS)} AS cust_bucket,
        {sql_bucketize(
            "date_diff('day', d0, CAST(o_orderdate AS DATE))",
            "md",
            Z_BITS,
        )} AS day_bucket
      FROM orders, scale
    ),
    cells AS (
      SELECT cust_bucket, day_bucket, COUNT(*) AS n_orders
      FROM buckets GROUP BY cust_bucket, day_bucket
    )
    SELECT {sql_zorder2("cust_bucket", "day_bucket")} AS zcell,
           cust_bucket, day_bucket,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM cells
    """,
)
def storage_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-cell map of `orders` over (customer, order day): the Morton
    key every row would be clustered by, with per-cell row counts —
    the planning view a layout job inspects before rewriting a table
    (cell skew here = range-partition skew there).

    One scalar-aggregate broadcast (the two bucket scales) + one hash
    aggregate on the bucket pair; the interleave runs once per
    DISTINCT cell, after the aggregate.  Everything is exact integer
    arithmetic (monotone ``(v<<16)//(max+1)`` bucketing + magic-number
    bit spread), hash-gated bit-for-bit against the SQL mirror.
    """
    orders = load_table(spark, sf_dir, "orders")
    # BOTH date bounds are runtime-adaptive: a fixed epoch with the
    # fixture's exact MIN date had zero headroom — one earlier order
    # would make the day index negative, where the engines diverge
    # hard (DuckDB errors on shifting negatives, Spark's bucket
    # aliases onto legitimate cells; review-caught)
    scale = orders.agg(
        (F.max("o_custkey") + 1).cast("long").alias("mc"),
        F.min(F.to_date("o_orderdate")).alias("d0"),
        (
            F.datediff(
                F.to_date(F.max("o_orderdate")),
                F.to_date(F.min("o_orderdate")),
            )
            + 1
        )
        .cast("long")
        .alias("md"),
    )
    day = F.datediff(F.to_date("o_orderdate"), F.col("d0"))
    cells = (
        orders.crossJoin(F.broadcast(scale))
        .select(
            bucketize(F.col("o_custkey"), F.col("mc"), Z_BITS).alias(
                "cust_bucket"
            ),
            bucketize(day, F.col("md"), Z_BITS).alias("day_bucket"),
        )
        .groupBy("cust_bucket", "day_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    return cells.select(
        zorder2(F.col("cust_bucket"), F.col("day_bucket")).alias("zcell"),
        "cust_bucket",
        "day_bucket",
        "n_orders",
    )


# ---------------------------------------------------------------------------
# file-skipping manifest: Delta/Iceberg-style stats without the format
# ---------------------------------------------------------------------------

def build_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file statistics manifest of a parquet directory: row count
    + min/max of each listed column, keyed by file path — ONE scan,
    grouped on the reader's ``_metadata.file_path``.

    At 100 TB the point is not row-group pruning (the parquet reader
    already does that from footers) but FILE pruning without touching
    footers at all: a million-file table costs a million footer reads
    per planned scan, while this manifest is one small table consulted
    once.  Pairs with :func:`write_zordered` — z-clustered files have
    tight per-file min/max on every interleaved dimension, so the
    manifest prunes multi-dimensional predicates (measured in
    tests/test_zorder.py and SCALING.md).  Rebuild (or append, via the
    same aggregate over only the new files) after each load.
    """
    df = spark.read.parquet(path).select(
        F.col("_metadata.file_path").alias("file_path"), *cols
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("file_path").agg(*aggs)


def manifest_pruned_read(
    spark: SparkSession,
    manifest: DataFrame,
    ranges: dict[str, tuple],
) -> tuple[DataFrame, int, int]:
    """Read only the files whose manifest stats intersect every
    ``col: (lo, hi)`` range, then re-apply the exact predicate.

    Returns ``(frame, files_read, files_total)``.  The manifest is
    file-count-sized (collected driver-side deliberately — that IS the
    design: planning state small enough to hold, so the executors
    never list or open skipped files).  Correctness does not depend on
    manifest freshness precision: stats are conservative (a stale-wide
    range only reads more), and the exact predicate re-applies on the
    surviving rows.
    """
    rows = manifest.collect()
    if not rows:
        raise ValueError("empty manifest — build it over a written table")
    keep = [
        r["file_path"]
        for r in rows
        if all(
            # NULL stats mean the file's column is ALL NULL (min/max
            # skip nulls) — no row can satisfy a range predicate, so
            # skipping is exact, and comparing would TypeError
            r[f"min_{c}"] is not None
            and r[f"min_{c}"] <= hi
            and r[f"max_{c}"] >= lo
            for c, (lo, hi) in ranges.items()
        )
    ]
    pred = None
    for c, (lo, hi) in ranges.items():
        p = (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
        pred = p if pred is None else (pred & p)
    if not keep:
        base = spark.read.parquet(
            *[r["file_path"] for r in rows[:1]]
        ).where(F.lit(False))
        return base, 0, len(rows)
    return (
        spark.read.parquet(*keep).where(pred),
        len(keep),
        len(rows),
    )
