"""HllSketchTable ingest-cost probe (round 10).

The class's scale claim: per-ingest cost = one pass over the BATCH
(collapsing to ≤ groups×m register rows before touching state) plus a
register-table-sized merge — so trigger walls stay FLAT as the state
accumulates, the property that makes a sketch table cheaper than
re-aggregating history per refresh.  Probed by folding a scaled
orders fixture in N equal batches and timing each ingest; the final
estimates are cross-checked against the one-shot build (the
sequential law at scale).

Prints one JSON line per batch + a final check line.

Usage: python tools/probe_sketch_ingest.py [DIR] [N_BATCHES]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bitcoin_datawarehouse_spark.operators.sketches import (  # noqa: E402
    HllSketchTable,
    _HLL_MONTH_EXPR,
    _hll_explicit,
)
from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse  # noqa: E402
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfo10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("sketch-ingest-probe", shuffle_partitions=96)
    scratch = Path(tempfile.mkdtemp(prefix="sketch_ingest_"))
    try:
        orders = spark.read.parquet(f"{d}/orders.parquet")
        n = orders.count()
        keyed = orders.selectExpr(
            f"{_HLL_MONTH_EXPR} AS order_month",
            "CAST(o_custkey AS STRING) AS hkey",
            f"o_orderkey % {n_batches} AS _b",
        )
        tbl = HllSketchTable(
            Warehouse(spark, str(scratch / "wh")), ["order_month"]
        )
        # warm codegen against a tiny slice, then reset state
        tbl.ingest(keyed.limit(1000).drop("_b"))
        tbl.wh.drop_table("models", tbl.name)

        for b in range(n_batches):
            t0 = time.time()
            tbl.ingest(keyed.filter(F.col("_b") == b).drop("_b"))
            print(
                json.dumps(
                    {
                        "batch": b,
                        "rows": n // n_batches,
                        "s": round(time.time() - t0, 2),
                    }
                ),
                flush=True,
            )

        got = {
            r["order_month"]: r["hll_estimate"]
            for r in tbl.estimates(spark).collect()
        }
        oneshot = {
            r["order_month"]: r["hll_estimate"]
            for r in _hll_explicit(
                spark, d, _HLL_MONTH_EXPR, "order_month"
            ).select("order_month", "hll_estimate").collect()
        }
        print(
            json.dumps(
                {
                    "corpus": n,
                    "groups": len(got),
                    "sequential_equals_oneshot": got == oneshot,
                }
            ),
            flush=True,
        )
        return 0 if got == oneshot else 1
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
