"""Storage-tier loop demo — z-ordered clustered table end to end.

The third Warehouse-style production loop (after the LSH dedup and
IVF serving loops in index_loops_demo.py): a fact table clustered by
a Morton z-key over (customer, order-day), exercised on the smallest
fixture through every verb —

1. **seed** the z-block table from the first half of `orders`;
2. **stream** the second half in as micro-batches
   (``streaming/ztable_stream.run_ztable_ingest_stream`` — replay-
   guarded, auto-compacting);
3. **compact** and show per-block file counts stay bounded;
4. **read_range** a (customer segment × date window) rectangle and
   show the block pruning + exact-equality against a full-scan
   filter;
5. build the **file-skipping manifest** over the same data dir and
   prune with it.

Run: ``python examples/storage_loop_demo.py [workdir]``
"""

from __future__ import annotations

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bitcoin_datawarehouse_spark.operators.storage import (  # noqa: E402
    build_manifest,
    manifest_pruned_read,
)
from bitcoin_datawarehouse_spark.operators.ztable import (  # noqa: E402
    ZOrderedTable,
)
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402
from bitcoin_datawarehouse_spark.streaming.jobs import (  # noqa: E402
    run_stream_to_completion,
)
from bitcoin_datawarehouse_spark.streaming.ztable_stream import (  # noqa: E402
    run_ztable_ingest_stream,
)
from bitcoin_datawarehouse_spark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main(workdir: str | None = None) -> dict:
    work = pathlib.Path(
        workdir
        or (sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp())
    )
    spark = get_spark("storage_loop_demo", shuffle_partitions=8)

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias(
            "day"
        ),
        "o_totalprice",
    )
    max_cust = orders.agg(F.max("o_custkey")).first()[0]
    max_day = orders.agg(F.max("day")).first()[0]
    mid = orders.agg(F.expr("percentile(o_orderkey, 0.5)")).first()[0]

    tab = ZOrderedTable(
        spark,
        str(work / "orders_z"),
        [("o_custkey", int(max_cust) + 1), ("day", int(max_day) + 1)],
        block_bits=3,
        max_files_per_block=2,
    )
    tab.seed(orders.where(F.col("o_orderkey") <= mid))
    print(f"seeded {tab.read_all().count()} rows")

    src = work / "arrivals"
    rest = orders.where(F.col("o_orderkey") > mid)
    for i in range(3):
        rest.where(F.col("o_orderkey") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"f{i}"))
    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, day int, o_totalprice double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_stream_to_completion(
        run_ztable_ingest_stream(
            stream, tab, "o_orderkey", str(work / "ck")
        )
    )
    counts = [
        len(list(d.glob("*.parquet")))
        for d in pathlib.Path(tab.path, "data").glob("zblock=*")
    ]
    print(
        f"streamed to {tab.read_all().count()} rows; "
        f"{len(counts)} blocks, max files/block {max(counts)}"
    )

    rect = {
        "o_custkey": (1, int(max_cust) // 4),
        "day": (0, int(max_day) // 4),
    }
    df, read, total = tab.read_range(rect)
    got = df.count()
    want = (
        tab.read_all()
        .where(
            (F.col("o_custkey") >= 1)
            & (F.col("o_custkey") <= int(max_cust) // 4)
            & (F.col("day") >= 0)
            & (F.col("day") <= int(max_day) // 4)
        )
        .count()
    )
    assert got == want, (got, want)
    print(f"read_range: {got} rows from {read}/{total} blocks (exact)")

    man = build_manifest(spark, str(tab.path / "data"), ["o_custkey", "day"])
    pruned, files_read, files_total = manifest_pruned_read(
        spark, man, rect
    )
    assert pruned.count() == want
    print(
        f"manifest-pruned: {files_read}/{files_total} files (exact)"
    )
    print("storage loop demo OK")
    return {
        "rows_total": tab.read_all().count(),
        "max_files_per_block": max(counts),
        "blocks_read": read,
        "blocks_total": total,
        "range_rows": got,
        "manifest_files_read": files_read,
        "manifest_files_total": files_total,
    }


if __name__ == "__main__":
    main()
