"""Measure z-order data skipping at sf10: row groups intersecting a
2-D predicate + warmed scan wall, across three layouts of the same
15 M-row `orders` table (natural, custkey-sorted, z-ordered).

Usage: python tools/probe_zorder.py [sf_dir] [scratch_dir]
Defaults: /tmp/sf10  /tmp/zorder_probe
"""

from __future__ import annotations

import pathlib
import sys
import time

import pyarrow.parquet as pq
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bitcoin_datawarehouse_spark.functions.zorder import (  # noqa: E402
    bucketize,
    write_zordered,
    zorder2,
)
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402

N_FILES = 16
BLOCK = 4 * 1024 * 1024  # 4 MB row groups -> several groups per file


def intersecting(path: str, col: str, lo, hi) -> tuple[int, int]:
    hit = total = 0
    for f in pathlib.Path(path).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        idx = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.num_columns)
        }[col]
        for g in range(md.num_row_groups):
            s = md.row_group(g).column(idx).statistics
            total += 1
            if s.min <= hi and s.max >= lo:
                hit += 1
    return hit, total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/zorder_probe"
    spark = get_spark("probe_zorder", shuffle_partitions=32)
    spark.sparkContext._jsc.hadoopConfiguration().setInt(
        "parquet.block.size", BLOCK
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    mc, md_days, max_key = (
        orders.agg(
            (F.max("o_custkey") + 1).cast("long"),
            (
                F.datediff(
                    F.to_date(F.max("o_orderdate")), F.lit("1995-01-01")
                )
                + 1
            ).cast("long"),
            F.max("o_custkey"),
        ).first()
    )
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01"))
    zkey = zorder2(
        bucketize(F.col("o_custkey"), F.lit(mc)),
        bucketize(day, F.lit(md_days)),
    )

    paths = {k: f"{scratch}/{k}" for k in ("natural", "bykey", "zorder")}
    t = time.time()
    orders.repartition(N_FILES).write.mode("overwrite").option(
        "parquet.block.size", BLOCK
    ).parquet(paths["natural"])
    orders.repartitionByRange(N_FILES, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.mode("overwrite").option("parquet.block.size", BLOCK).parquet(
        paths["bykey"]
    )
    t_sorted = time.time()
    write_zordered(
        orders,
        paths["zorder"],
        zkey,
        N_FILES,
        **{"parquet.block.size": str(BLOCK)},
    )
    print(f"write: zorder {time.time() - t_sorted:.1f}s "
          f"(others {t_sorted - t:.1f}s)")

    # 2-D predicate: the BI shape — a 20% customer segment x one
    # quarter (~4% of days).  Key-sorted prunes only on the key
    # (~20% of groups survive); z-order prunes on BOTH.
    key_lo, key_hi = int(max_key * 0.40), int(max_key * 0.60)
    import datetime

    d_lo = datetime.datetime(1997, 4, 1)
    d_hi = datetime.datetime(1997, 7, 1)
    for name, path in paths.items():
        kh, kt = intersecting(path, "o_custkey", key_lo, key_hi)
        dh, _ = intersecting(path, "o_orderdate", d_lo, d_hi)
        both = 0
        for f in pathlib.Path(path).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            idx = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.num_columns)
            }
            for g in range(md.num_row_groups):
                sk = md.row_group(g).column(idx["o_custkey"]).statistics
                sd = md.row_group(g).column(idx["o_orderdate"]).statistics
                if (
                    sk.min <= key_hi
                    and sk.max >= key_lo
                    and sd.min <= d_hi
                    and sd.max >= d_lo
                ):
                    both += 1
        walls = []
        for _ in range(3):
            t = time.time()
            n = (
                spark.read.parquet(path)
                .where(
                    (F.col("o_custkey") >= key_lo)
                    & (F.col("o_custkey") <= key_hi)
                    & (F.col("o_orderdate") >= F.lit("1997-04-01").cast("timestamp"))
                    & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
                )
                .agg(F.count(F.lit(1)), F.sum("o_totalprice"))
                .first()[0]
            )
            walls.append(time.time() - t)
        print(
            f"{name:8s} groups: key {kh}/{kt}, date {dh}/{kt}, "
            f"2-D {both}/{kt}; rows {n}; "
            f"walls {[round(w, 2) for w in walls]}"
        )


if __name__ == "__main__":
    main()
