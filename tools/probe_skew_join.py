"""Skew-join probe: plain vs AQE skew-split vs salted (SCALING.md).

Constructs the classic web-scale hazard — a fact whose join key is
dominated by one hot value (the "default id" / "null key" shape) —
joined to a second fact too large to broadcast, and times three
treatments of the same join:

* plain sort-merge join with AQE OFF (the straggler baseline: every
  hot-key row lands in ONE reducer);
* the same join with AQE ON (runtime skew-partition splitting — the
  session default, session.py);
* ``functions.skew.salted_join`` with AQE OFF (the explicit plan-level
  lever for engines/paths where AQE cannot help).

All three must return identical aggregate results (asserted).  The
fact is synthesized in-memory (range + modular arithmetic), so the
probe needs no fixture and scales by one knob.

Usage: python tools/probe_skew_join.py [n_rows] [hot_fraction]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bitcoin_datawarehouse_spark.functions.skew import salted_join  # noqa: E402
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    n_keys = 100_000
    spark = get_spark("skew-probe", shuffle_partitions=96)
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", "-1"
    )  # force the shuffle join — the skew under test

    # hot fraction of rows carry key 0; the rest spread uniformly
    big = spark.range(n_rows).select(
        F.when(
            (F.col("id") % F.lit(int(1 / hot))) == 0, F.lit(0)
        )
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )

    def agg_of(joined):
        return joined.agg(
            F.sum(F.col("v").cast("decimal(38,10)")).alias("sv"),
            F.sum("w").alias("sw"),
            F.count(F.lit(1)).alias("n"),
        )

    def timed(fn):
        runs = []
        for _ in range(2):
            t0 = time.time()
            rows = fn().collect()
            runs.append(round(time.time() - t0, 1))
        return runs, tuple(rows[0])

    out = {"n_rows": n_rows, "hot_fraction": hot, "n_keys": n_keys}

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["plain_noaqe_s"], r_plain = timed(
        lambda: agg_of(big.join(small, "k"))
    )
    out["salted_noaqe_s"], r_salt = timed(
        lambda: agg_of(salted_join(big, small, "k", n_salts=32))
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    out["plain_aqe_s"], r_aqe = timed(lambda: agg_of(big.join(small, "k")))

    out["results_equal"] = r_plain == r_salt == r_aqe
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
