"""Million-entry manifest PLANNING probe (r7 VERDICT item 5).

The manifest's claimed win is planning I/O at large file counts —
exactly what a 257-file fixture cannot show.  This probe synthesizes
the manifest TABLE directly (no data files needed: planning cost is a
property of the manifest, not the data):

1. pruned planning — ``filter(ranges) → collect(survivors)`` (what
   ``manifest_pruned_read`` does before touching any data file);
2. collect-ALL planning — the pre-r6 shape (driver holds every row);
3. an EXTRAPOLATED footer walk — measured per-footer parquet-metadata
   open × N (labeled extrapolation: we do not create a million files);
4. ``sync_manifest``'s driver-side set algebra against a REAL
   100k-file directory (empty files — with no unseen files the verb
   never reads parquet data, so the full listing-diff + vanished
   anti-join path runs for real).

Usage: python tools/probe_manifest_million.py [N]
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bitcoin_datawarehouse_spark.operators.storage import (  # noqa: E402
    sync_manifest,
)
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("manifest-probe", shuffle_partitions=32)
    base = pathlib.Path("/tmp/manifest_probe")
    if base.exists():
        shutil.rmtree(base)
    base.mkdir(parents=True)

    # -- synthesize the manifest: z-ordered-style tight per-file ranges
    mpath = str(base / "manifest")
    (
        spark.range(n)
        .select(
            F.format_string(
                "file:/synth/part-%07d.parquet", F.col("id")
            ).alias("file_path"),
            F.lit(10_000).cast("long").alias("n_rows"),
            (F.col("id") * 100).alias("min_a"),
            (F.col("id") * 100 + 99).alias("max_a"),
            (F.col("id") % 1000).alias("min_b"),
            (F.col("id") % 1000 + 10).alias("max_b"),
        )
        .write.mode("overwrite")
        .parquet(mpath)
    )
    manifest = spark.read.parquet(mpath)
    manifest.count()  # warm page cache

    # 1. pruned planning (filter → collect survivors)
    lo, hi = 42_000_000, 42_050_000  # ~500 of N files on a
    t = time.time()
    surv = (
        manifest.filter(
            (F.col("min_a") <= hi)
            & (F.col("max_a") >= lo)
            & (F.col("min_b") <= 50)
            & (F.col("max_b") >= 40)
        )
        .select("file_path")
        .collect()
    )
    pruned_s = time.time() - t

    # 2. collect-ALL planning (the pre-r6 shape)
    t = time.time()
    rows = manifest.collect()
    keep = [
        r["file_path"]
        for r in rows
        if r["min_a"] <= hi
        and r["max_a"] >= lo
        and r["min_b"] <= 50
        and r["max_b"] >= 40
    ]
    collect_all_s = time.time() - t
    assert len(keep) == len(surv)

    # 3. extrapolated footer walk: per-open cost on a real footer
    import pyarrow.parquet as pq

    real = next(pathlib.Path(mpath).glob("*.parquet"))
    reps = 2000
    t = time.time()
    for _ in range(reps):
        pq.ParquetFile(str(real)).metadata
    per_open = (time.time() - t) / reps
    footer_walk_est_s = per_open * n

    # 4. sync_manifest set algebra against a REAL empty-file directory
    n_dir = 100_000
    ddir = base / "table" / "data"
    ddir.mkdir(parents=True)
    for i in range(n_dir):
        (ddir / f"part-{i:07d}.parquet").touch()
    # manifest covers all current files PLUS 500 vanished entries
    m2 = spark.range(n_dir + 500).select(
        F.format_string(
            f"file:{ddir}/part-%07d.parquet", F.col("id")
        ).alias("file_path"),
        F.lit(1).cast("long").alias("n_rows"),
        F.col("id").alias("min_a"),
        F.col("id").alias("max_a"),
    )
    m2 = m2.localCheckpoint()
    t = time.time()
    synced = sync_manifest(spark, m2, str(ddir), ["a"])
    n_synced = synced.count()
    sync_s = time.time() - t
    assert n_synced == n_dir, n_synced

    print(
        json.dumps(
            {
                "n_manifest": n,
                "survivors": len(surv),
                "pruned_planning_s": round(pruned_s, 3),
                "collect_all_planning_s": round(collect_all_s, 3),
                "per_footer_open_us": round(per_open * 1e6, 1),
                "footer_walk_extrapolated_s": round(
                    footer_walk_est_s, 1
                ),
                "sync_dir_files": n_dir,
                "sync_vanished": 500,
                "sync_s": round(sync_s, 3),
            }
        )
    )
    shutil.rmtree(base)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
