"""Isolated sf10 probe for dedup_embedding_cosine_lsh_auto (r13
VERDICT item 2): warmed session, noop sink, two timed runs, stage-level
attribution via per-phase noop writes of the intermediate frames.

Usage: python tools/probe_lsh_sf10.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bitcoin_datawarehouse_spark.functions.cachereg import (  # noqa: E402
    release_tracked_caches,
)
from bitcoin_datawarehouse_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_operators,
)
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return out, dt


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/tmp/sf10_panel"
    )
    load_all_operators()
    spark = get_spark("lsh-sf10-probe", shuffle_partitions=96)
    sc = spark.sparkContext

    from bitcoin_datawarehouse_spark.operators.embeddings_extra import (
        auto_lsh_bits,
    )
    from bitcoin_datawarehouse_spark.operators.similarity import (
        lsh_bucket_assignments,
    )
    from bitcoin_datawarehouse_spark.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    bits = auto_lsh_bits(n)
    print(f"n_vectors={n} auto_bits={bits}", flush=True)

    # phase attribution (separate session-warm pass)
    sc.setJobDescription("phase: sigs kernel")
    timed("sigs_kernel_noop", lambda: noop(
        lsh_bucket_assignments(spark, sf_dir, bits=bits)
    ))
    buckets = lsh_bucket_assignments(spark, sf_dir, bits=bits)
    from pyspark.sql import functions as F

    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )
    sc.setJobDescription("phase: candidate join (pre-distinct count)")
    _, _ = timed("cand_count", lambda: print("  candidates:", cands.count()))
    sc.setJobDescription("phase: candidate distinct")
    dcands = cands.distinct()
    _, _ = timed("dcand_count", lambda: print("  distinct:", dcands.count()))

    # full query, warmed, twice
    q = QUERIES["dedup_embedding_cosine_lsh_auto"]
    for i in range(3):
        release_tracked_caches()
        sc.setJobDescription(f"lsh_auto full run {i}")
        timed(f"lsh_auto_run{i}", lambda: noop(q(spark, sf_dir)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
