"""Scale probe for the file-skipping manifest lifecycle (SCALING.md
round 7 evidence).

Over a z-ordered copy of the given fixture's lineitem (suppkey ×
partkey-bucket dims), in ONE warmed session:

1. full `build_manifest` wall (the per-load cost the incremental
   verbs exist to avoid),
2. `append_manifest` wall after a small ingest (must be ∝ batch),
3. `manifest_pruned_read` vs full-scan-filter wall + files read,
4. `sync_manifest` wall after the ingest (listing diff + batch stats).

Usage: python tools/probe_manifest_scale.py SRC_SF_DIR WORK_DIR
Prints one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bitcoin_datawarehouse_spark.functions.zorder import (  # noqa: E402
    write_zordered,
    zorder2,
)
from bitcoin_datawarehouse_spark.operators.storage import (  # noqa: E402
    append_manifest,
    build_manifest,
    manifest_pruned_read,
    sync_manifest,
)
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402
from bitcoin_datawarehouse_spark.tables import load_table  # noqa: E402


def main() -> int:
    src, work = sys.argv[1], sys.argv[2]
    spark = get_spark("manifest-probe", shuffle_partitions=96)
    li = load_table(spark, src, "lineitem").select(
        "l_suppkey",
        (F.col("l_partkey") % 4096).alias("pk"),
        "l_quantity",
        "l_extendedprice",
    )
    path = str(pathlib.Path(work) / "zli")
    n_files = 256
    write_zordered(
        li, path, zorder2(F.col("l_suppkey"), F.col("pk")), n_files
    )
    out: dict = {"src": src, "rows": li.count(), "files": n_files}

    t0 = time.time()
    man = build_manifest(spark, path, ["l_suppkey", "pk"])
    man_rows = man.collect()
    out["build_s"] = round(time.time() - t0, 2)
    man = spark.createDataFrame(man_rows, schema=man.schema)

    # small ingest: ~1/64 of the table appended as 2 files
    batch = li.limit(li.count() // 64)
    batch.coalesce(2).write.mode("append").parquet(path)
    known = {r["file_path"] for r in man_rows}
    new_paths = sorted(
        f"file:{p}"
        for p in pathlib.Path(path).glob("*.parquet")
        if f"file:{p}" not in known
    )
    t0 = time.time()
    appended = append_manifest(spark, man, new_paths, ["l_suppkey", "pk"])
    appended_rows = appended.collect()
    out["append_s"] = round(time.time() - t0, 2)
    out["append_files"] = len(new_paths)
    appended = spark.createDataFrame(appended_rows, schema=appended.schema)

    t0 = time.time()
    sync_manifest(spark, man, path, ["l_suppkey", "pk"]).collect()
    out["sync_s"] = round(time.time() - t0, 2)

    ranges = {"l_suppkey": (10, 20), "pk": (100, 400)}
    for _ in range(2):  # warm + timed
        t0 = time.time()
        pruned, read, total = manifest_pruned_read(spark, appended, ranges)
        n_pruned = pruned.count()
        out["pruned_read_s"] = round(time.time() - t0, 2)
    out["files_read"] = read
    out["files_total"] = total
    for _ in range(2):
        t0 = time.time()
        n_full = (
            spark.read.parquet(path)
            .where(
                (F.col("l_suppkey") >= 10) & (F.col("l_suppkey") <= 20)
                & (F.col("pk") >= 100) & (F.col("pk") <= 400)
            )
            .count()
        )
        out["full_scan_s"] = round(time.time() - t0, 2)
    assert n_pruned == n_full, (n_pruned, n_full)
    out["result_rows"] = n_pruned
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
