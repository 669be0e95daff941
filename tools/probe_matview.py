"""Materialized-view maintenance at fact scale: incremental vs rebuild.

The matview claim is O(change), not O(base): absorbing an append
touches the batch + the state; an update touches the batch + the
touched groups' rows.  This probe measures that against the naive
per-batch full re-aggregate on an sf10 ``orders`` fact (15 M rows),
for BOTH state shapes that matter:

* ``lowcard``  — 15 groups (status × priority): state is trivially
  small, the win is skipping the 15 M-row scan;
* ``highcard`` — ~1.5 M groups (o_custkey): the state itself is a
  real table, so the append path's state-sized key join AND the
  full-state rewrite are the costs being bought instead of the base
  scan;
* ``highcard_bucketed`` — the same view with ``state_buckets=256``
  and a DIMENSION-SHAPED narrow batch (~50 customers): the rewrite
  shrinks to the touched buckets.  The same narrow batch also runs
  against the UNBUCKETED highcard view, so the bucketing win is a
  controlled pair (hash bucketing is honest-to-useless for a batch
  spraying ≫256 groups — that is the spread-batch row above);
* ``monthgrain`` — (o_month, o_orderpriority) view with
  ``state_partition_key='o_month'`` fed a one-month-aligned batch:
  the continuous-aggregate layout — per-batch state I/O is one month
  directory regardless of history length.

Each op runs twice (same session, state rebuilt in between) — single
cold walls are not results (SCALING.md probe discipline).  After the
timed runs the incrementally-maintained view is verified row-for-row
against a from-scratch rebuild (exceptAll both ways == 0).

Usage:
    python tools/probe_matview.py [SF_DIR] [--factor N]

Default: /root/testdata/sf0.1 scaled ×100 (sf10) into /tmp scratch.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SCRATCH = Path("/tmp/matview_probe")
NEW_KEY_OFFSET = 10**12


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.1"
    factor = 100
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    if SCRATCH.exists():
        shutil.rmtree(SCRATCH)
    SCRATCH.mkdir(parents=True)
    gen = SCRATCH / "sf"
    subprocess.run(
        [sys.executable, str(REPO / "tools/gen_sf.py"), src, str(gen),
         str(factor), "--tables", "orders"],
        check=True,
    )

    from pyspark.sql import functions as F

    from bitcoin_datawarehouse_spark.pipeline import Warehouse
    from bitcoin_datawarehouse_spark.pipeline.matview import (
        MaterializedAggView,
        Measure,
    )
    from bitcoin_datawarehouse_spark.session import get_spark

    spark = get_spark("matview_probe", cpus=32, shuffle_partitions=32)
    wh = Warehouse(spark, str(SCRATCH / "wh"))
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
            "o_totalprice", "o_orderdate"]
    base = spark.read.parquet(str(gen / "orders.parquet")).select(*cols)
    wh.write_atomic(base, "facts", "orders")
    base = wh.read("facts", "orders")
    n = base.count()

    # a 1% batch: new keys for append, existing keys re-priced for upsert
    append_batch = (
        base.filter(F.col("o_orderkey") % 100 == 7)
        .withColumn("o_orderkey", F.col("o_orderkey") + NEW_KEY_OFFSET)
    )
    wh.write_atomic(append_batch, "facts", "append_batch")
    append_batch = wh.read("facts", "append_batch")
    update_batch = (
        base.filter(F.col("o_orderkey") % 100 == 7)
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(0.9))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    wh.write_atomic(update_batch, "facts", "update_batch")
    update_batch = wh.read("facts", "update_batch")
    base_after = base.join(
        update_batch.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(update_batch)
    wh.write_atomic(base_after, "facts", "orders_after")
    base_after = wh.read("facts", "orders_after")
    m = update_batch.count()

    measures = [
        Measure("sum_price", "sum", "o_totalprice"),
        Measure("n_orders", "count", None),
        Measure("max_price", "max", "o_totalprice"),
        Measure("avg_price", "avg", "o_totalprice"),
    ]
    shapes = {
        "lowcard": ["o_orderstatus", "o_orderpriority"],
        "highcard": ["o_custkey"],
    }

    def emit(**kw) -> None:
        print(json.dumps({"probe": "matview", "rows": n, "batch_rows": m,
                          "factor": factor, **kw}), flush=True)

    for shape, keys in shapes.items():
        v = MaterializedAggView(wh, "mv", f"v_{shape}", keys, measures)
        for rep in (1, 2):
            t0 = time.time()
            v.full_refresh(base)
            emit(view=shape, op="full_refresh", rep=rep,
                 wall_s=round(time.time() - t0, 2))

            t0 = time.time()
            v.apply_append(append_batch)
            emit(view=shape, op="append", rep=rep,
                 wall_s=round(time.time() - t0, 2))

            # reset to the pre-append state so upsert timing is comparable
            v.full_refresh(base)
            t0 = time.time()
            v.sync_upsert(base, base_after, update_batch, ["o_orderkey"])
            emit(view=shape, op="upsert", rep=rep,
                 wall_s=round(time.time() - t0, 2))

        # verify the final (upsert-maintained) state against a rebuild
        ref = MaterializedAggView(wh, "mv", f"ref_{shape}", keys, measures)
        ref.full_refresh(base_after)
        a, b = v.read(), ref.read()
        bad = a.exceptAll(b).count() + b.exceptAll(a).count()
        emit(view=shape, op="verify_upsert", mismatch_rows=bad)
        assert bad == 0, f"{shape}: incremental != rebuild ({bad} rows)"

    # ---- controlled pair: narrow (dimension-shaped) batch, bucketed
    # vs flat state over the same ~1.5M-group view --------------------
    narrow = (
        base.filter(F.col("o_custkey") % 30011 == 7)
        .withColumn("o_orderkey", F.col("o_orderkey") + 2 * NEW_KEY_OFFSET)
    )
    wh.write_atomic(narrow, "facts", "narrow_batch")
    narrow = wh.read("facts", "narrow_batch")
    nk = narrow.select("o_custkey").distinct().count()
    flat_hc = MaterializedAggView(
        wh, "mv", "v_hc_flat", ["o_custkey"], measures
    )
    bkt_hc = MaterializedAggView(
        wh, "mv", "v_hc_bkt", ["o_custkey"], measures, state_buckets=256
    )
    for rep in (1, 2):
        for label, v in (("highcard_flat", flat_hc), ("highcard_bucketed", bkt_hc)):
            v.full_refresh(base)
            t0 = time.time()
            v.apply_append(narrow)
            emit(view=label, op="append_narrow", rep=rep, touched_groups=nk,
                 wall_s=round(time.time() - t0, 2))

    # ---- month-grain continuous aggregate, month-aligned arrivals ---
    mcol = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    base_m = base.withColumn("o_month", mcol)
    mkeys = ["o_month", "o_orderpriority"]
    vm = MaterializedAggView(
        wh, "mv", "v_month", mkeys, measures, state_partition_key="o_month"
    )
    month_batch = (
        base_m.filter(F.col("o_month") == F.lit("1995-06-01").cast("date"))
        .withColumn("o_orderkey", F.col("o_orderkey") + 3 * NEW_KEY_OFFSET)
    )
    wh.write_atomic(month_batch, "facts", "month_batch")
    month_batch = wh.read("facts", "month_batch")
    mb = month_batch.count()
    for rep in (1, 2):
        t0 = time.time()
        vm.full_refresh(base_m)
        emit(view="monthgrain", op="full_refresh", rep=rep,
             wall_s=round(time.time() - t0, 2))
        t0 = time.time()
        vm.apply_append(month_batch)
        emit(view="monthgrain", op="append_month", rep=rep, batch_rows=mb,
             wall_s=round(time.time() - t0, 2))
    ref_m = MaterializedAggView(wh, "mv", "ref_month", mkeys, measures)
    ref_m.full_refresh(base_m.unionByName(month_batch))
    a, b = vm.read(), ref_m.read()
    bad = a.exceptAll(b).count() + b.exceptAll(a).count()
    emit(view="monthgrain", op="verify_append", mismatch_rows=bad)
    assert bad == 0, f"monthgrain: incremental != rebuild ({bad} rows)"

    # ---- r12: partition-pruned sync_upsert vs the 2-base-pass law ----
    # Base laid out by a group-key prefix (o_month, the loader's
    # partitioned path); an update re-prices ONE month.  The flat-API
    # sync_upsert pays two filtered FULL base passes (replaced-row
    # derivation + recompute); the partitioned path reads only the
    # touched month's directory twice.  Both maintained states must
    # equal the post-change rebuild.
    from bitcoin_datawarehouse_spark.pipeline import Loader

    Loader(wh, "facts", "opart_pre").load_incremental_partitioned(
        base_m, ["o_orderkey"], "o_month"
    )
    upd_m = (
        base_m.filter(F.col("o_month") == F.lit("1995-06-01").cast("date"))
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(0.9))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    # materialize the batch (CLAUDE.md: a batch left as a filter over
    # the base re-scans history per action and buries the signal)
    wh.write_atomic(upd_m, "facts", "upd_month")
    upd_m = wh.read("facts", "upd_month")
    post_m = base_m.join(
        upd_m.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(upd_m)
    Loader(wh, "facts", "opart_post").load_incremental_partitioned(
        post_m, ["o_orderkey"], "o_month"
    )
    pre_frame = wh.read("facts", "opart_pre")
    post_frame = wh.read("facts", "opart_post")
    um = upd_m.count()
    vpp = MaterializedAggView(wh, "mv", "v_pp", mkeys, measures)
    for rep in (1, 2):
        vpp.full_refresh(pre_frame)
        t0 = time.time()
        vpp.sync_upsert(pre_frame, post_frame, upd_m, ["o_orderkey"])
        emit(view="monthpart", op="upsert_flat_law", rep=rep, batch_rows=um,
             wall_s=round(time.time() - t0, 2))
        vpp.full_refresh(pre_frame)
        t0 = time.time()
        touched = vpp.sync_upsert_partitioned(
            "facts", "opart_pre", "o_month", upd_m, ["o_orderkey"]
        )
        vpp.apply_changes_partitioned(
            "facts", "opart_post", "o_month", touched
        )
        emit(view="monthpart", op="upsert_pruned", rep=rep, batch_rows=um,
             wall_s=round(time.time() - t0, 2))
    ref_pp = MaterializedAggView(wh, "mv", "ref_pp", mkeys, measures)
    ref_pp.full_refresh(post_frame)
    a, b = vpp.read(), ref_pp.read()
    bad = a.exceptAll(b).count() + b.exceptAll(a).count()
    emit(view="monthpart", op="verify_pruned_upsert", mismatch_rows=bad)
    assert bad == 0, f"monthpart: pruned upsert != rebuild ({bad} rows)"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
