"""Decade probe for the composed TPC-H family (SCALING.md evidence).

Times the twelve composed multi-join queries (operators/tpch.py +
tpch_extra.py) end-to-end (noop sink) at each fixture dir in ONE
warmed session, two timed runs per (query, fixture) — the family is
broadcast-dim + single-fact-shuffle by construction (plan-tested),
so wall clock should track the lineitem scan volume ~linearly.

Usage: python tools/probe_tpch_scale.py DIR [DIR ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bitcoin_datawarehouse_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_operators,
)
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402

NAMES = [
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q12_lateship_priority",
    "tpch_q14_promo_revenue",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_customers",
    # round-7 derived-partsupp tail (the partsupp DISTINCT is an
    # extra fact-pair aggregate these four share)
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_excess_stock_suppliers",
]


def main() -> int:
    dirs = sys.argv[1:]
    if not dirs:
        print("usage: probe_tpch_scale.py DIR [DIR ...]")
        return 2
    load_all_operators()
    spark = get_spark("tpch-probe", shuffle_partitions=96)
    # warm (codegen + JIT) against the FIRST passed dir — a hardcoded
    # fixture path would crash on hosts whose fixtures live elsewhere
    for name in NAMES:
        QUERIES[name](spark, dirs[0]).write.format("noop").mode(
            "overwrite"
        ).save()
    for d in dirs:
        out = {"dir": d}
        for name in NAMES:
            runs = []
            for _ in range(2):
                t0 = time.time()
                QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.time() - t0, 1))
            out[name] = runs
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
