"""Decade probe for the PQ family (SCALING.md evidence).

Times ``similarity_pq_encode``, ``similarity_pq_adc_topk`` and
``similarity_ivfpq_topk`` end-to-end (noop sink) at each fixture dir
in ONE warmed session, two timed runs per (query, fixture) — the
family is linear by construction (encode: one kernel pass; ADC: 8
lookups + 7 adds per candidate; IVF-PQ: nprobe/K of the corpus), and
this records the measured slopes.

Usage: python tools/probe_pq_scale.py DIR [DIR ...]
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
    "similarity_pq_encode",
    "similarity_pq_adc_topk",
    "similarity_ivfpq_topk",
]


def main() -> int:
    dirs = sys.argv[1:]
    if not dirs:
        print("usage: probe_pq_scale.py DIR [DIR ...]")
        return 2
    load_all_operators()
    spark = get_spark("pq-probe", shuffle_partitions=96)
    # warm (codegen + JIT + Arrow path) against the FIRST passed
    # dir — a hardcoded fixture path crashes on other hosts
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
