"""Decade probe for the auto-K SemDeDup pass (SCALING.md evidence).

Runs ``dedup_semantic_semdedup_auto`` end-to-end (noop sink) at each
given fixture dir in ONE warmed session — decade-probe discipline per
CLAUDE.md: warm the session first, time repeated runs, record both.

Usage: python tools/probe_semdedup_scale.py DIR [DIR ...]
Prints one JSON line per fixture:
  {"dir": ..., "n_vectors": N, "k": K, "dropped": D,
   "runs_s": [r1, r2]}
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


def main() -> int:
    dirs = sys.argv[1:]
    if not dirs:
        print("usage: probe_semdedup_scale.py DIR [DIR ...]")
        return 2
    load_all_operators()
    from bitcoin_datawarehouse_spark.operators.semdedup import (
        two_level_sizes,
    )

    # the decade-probe session profile (96 shuffle partitions)
    spark = get_spark("semdedup-probe", shuffle_partitions=96)
    fn = QUERIES["dedup_semantic_semdedup_auto"]

    # warm (codegen + JIT + Arrow path) against the first passed
    # dir — a hardcoded fixture path crashes on other hosts
    fn(spark, dirs[0]).write.format("noop").mode(
        "overwrite"
    ).save()

    for d in dirs:
        from bitcoin_datawarehouse_spark.operators.embeddings_extra import (
            _normed,
        )

        n = _normed(spark, d).count()
        fine_k, coarse_k = two_level_sizes(n)
        runs = []
        dropped = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, d, n_vectors=n).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 1))
        dropped = (
            fn(spark, d, n_vectors=n)
            .filter("NOT keep")
            .count()
        )
        print(
            json.dumps(
                {
                    "dir": d,
                    "n_vectors": n,
                    "fine_k": fine_k, "coarse_k": coarse_k,
                    "dropped": dropped,
                    "runs_s": runs,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
