"""SCD2 loader probe at dimension scale (SCALING.md evidence).

Builds a wide dimension from the fixture's orders table (one row per
o_orderkey), runs the initial SCD2 load, then a second load in which
a third of the keys changed — the realistic daily-dimension-feed
shape.  Reports wall clock for both loads and the history-integrity
counts (closed versions == changed keys; one open version per key).

Usage: python tools/probe_scd2_scale.py SRC_DIR [src2 ...]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse  # noqa: E402
from bitcoin_datawarehouse_spark.pipeline.loader import Loader  # noqa: E402
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402
from bitcoin_datawarehouse_spark.tables import load_table  # noqa: E402


def main() -> int:
    dirs = sys.argv[1:]
    if not dirs:
        print("usage: probe_scd2_scale.py DIR [DIR ...]")
        return 2
    spark = get_spark("scd2-probe", shuffle_partitions=96)
    for d in dirs:
        dim = load_table(spark, d, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_totalprice").alias("price"),
        )
        n = dim.count()
        wh = Warehouse(spark, tempfile.mkdtemp(prefix="scd2_probe_"))
        ld = Loader(wh, "dim", "orders_dim")

        t0 = time.time()
        ld.load_scd2(dim, unique_keys=["k"], batch_ts="2024-01-01")
        first_s = round(time.time() - t0, 1)

        # day-2 feed: FULL re-delivery with a third of the keys changed
        batch2 = dim.withColumn(
            "status",
            F.when(F.col("k") % 3 == 0, F.lit("CHG")).otherwise(
                F.col("status")
            ),
        )
        t0 = time.time()
        ld.load_scd2(batch2, unique_keys=["k"], batch_ts="2024-02-01")
        second_s = round(time.time() - t0, 1)

        hist = wh.read("dim", "orders_dim")
        closed = hist.filter(~F.col("is_current")).count()
        open_ = hist.filter(F.col("is_current")).count()
        print(
            json.dumps(
                {
                    "dir": d,
                    "n_keys": n,
                    "first_load_s": first_s,
                    "second_load_s": second_s,
                    "closed_versions": closed,
                    "open_versions": open_,
                    "integrity": open_ == n
                    and closed == hist.filter(F.col("k") % 3 == 0)
                    .select("k")
                    .distinct()
                    .count(),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
