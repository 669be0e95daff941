"""Bucketed co-location probe for the Q17 self-agg shape (SCALING.md).

The sf100 decade table flags Q17 as the one composed query at the
data slope (10.6×/decade): its per-part threshold re-aggregation adds
a second full shuffle of lineitem on l_partkey.  The cluster-scale
lever is storage layout, not plan surgery — bucket lineitem by
l_partkey (``Warehouse.write_bucketed``) and BOTH fact passes read
pre-hashed, so the aggregate and the gated join plan with ZERO
exchanges.  This probe measures that claim at sf10:

* baseline: the registered plan over plain parquet;
* bucketed: the same ``q17_shape`` dataflow over the bucketed table;
* prints the Exchange count of each plan and two timed runs, plus the
  one-time bucketed-write cost (the layout is amortized across every
  partkey-keyed query, exactly like a real warehouse bucket layout).

Usage: python tools/probe_bucketed_q17.py SRC_DIR [n_buckets]
"""

from __future__ import annotations

import json
import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bitcoin_datawarehouse_spark.operators.tpch_extra import (  # noqa: E402
    q17_shape,
)
from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse  # noqa: E402
from bitcoin_datawarehouse_spark.plans.audit import df_plan  # noqa: E402
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402
from bitcoin_datawarehouse_spark.tables import load_table  # noqa: E402


def n_exchanges(df) -> int:
    return len(re.findall(r"\(\d+\) Exchange", df_plan(df)))


def timed(df) -> list[float]:
    runs = []
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 1))
    return runs


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("q17-bucket-probe", shuffle_partitions=96)
    li = load_table(spark, src, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, src, "part")

    base = q17_shape(load_table(spark, src, "lineitem"), part)
    base.write.format("noop").mode("overwrite").save()  # warm
    out = {
        "src": src,
        "n_buckets": n_buckets,
        "baseline_exchanges": n_exchanges(base),
        "baseline_runs_s": timed(base),
    }

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="q17_bucket_wh_"))
    t0 = time.time()
    name = wh.write_bucketed(
        li, "probe", "lineitem_by_partkey",
        bucket_cols=["l_partkey"], n_buckets=n_buckets,
        sort_cols=["l_partkey"],
    )
    out["bucketed_write_s"] = round(time.time() - t0, 1)

    bl = spark.table(name)
    bq = q17_shape(bl, part)
    out["bucketed_exchanges"] = n_exchanges(bq)
    out["bucketed_runs_s"] = timed(bq)
    # same answer either way
    out["results_equal"] = sorted(map(tuple, base.collect())) == sorted(
        map(tuple, bq.collect())
    )
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
