"""Z-order clustering: interleave correctness, bucketize engine
parity, and the data-skipping property the layout exists for."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.zorder import (
    bucketize,
    write_zordered,
    zorder2,
)


def _morton_ref(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=10, deadline=None)
def test_zorder2_matches_bitwise_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder2(F.col("a"), F.col("b")).alias("z"))
        .collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == _morton_ref(a, b)


@given(
    v=st.integers(0, 2**31 - 1),
    d=st.one_of(
        st.integers(1, 2**37 - 1),
        # adversarial: divisors just under the documented 2^37 bound
        st.integers(2**37 - 2**16, 2**37 - 1),
    ),
)
@settings(max_examples=2000, deadline=None)
def test_bucketize_double_floor_equals_integer_division(v, d):
    """The Spark side floors a DOUBLE quotient; the oracle divides in
    exact integers.  The zorder.bucketize docstring's argument says
    they agree for divisors < 2^37 — pin it across the range,
    including just under the boundary."""
    n = v << 16
    assert math.floor(n / d) == n // d


def test_write_zordered_prunes_2d_predicates_where_1d_sort_cannot(
    spark, tmp_path
):
    """The point of the layout: on a synthetic 2-D grid, a rectangle
    predicate must intersect (by parquet row-group min/max stats) far
    fewer row groups in the z-ordered copy than in the copy sorted by
    x alone — and both layouts hold identical data."""
    import pyarrow.parquet as pq

    n_side = 256  # 64k rows on a 256x256 grid
    grid = spark.range(n_side * n_side).select(
        (F.col("id") % n_side).alias("x"),
        (F.col("id") / n_side).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "x")
    write_zordered(
        grid, zpath, zorder2(F.col("x"), F.col("y")), num_files=16
    )
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    def intersecting_groups(path: str, lo: int, hi: int) -> tuple[int, int]:
        """(row groups whose y-stats intersect [lo, hi], total)."""
        hit = total = 0
        import pathlib

        for f in pathlib.Path(path).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            ycol = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.num_columns)
            }["y"]
            for g in range(md.num_row_groups):
                s = md.row_group(g).column(ycol).statistics
                total += 1
                if s.min <= hi and s.max >= lo:
                    hit += 1
        return hit, total

    # identical data in both copies
    assert (
        spark.read.parquet(zpath).orderBy("x", "y").collect()
        == spark.read.parquet(xpath).orderBy("x", "y").collect()
    )
    # a narrow y-band: the x-sorted layout cannot skip on y at all
    z_hit, z_total = intersecting_groups(zpath, 100, 107)
    x_hit, x_total = intersecting_groups(xpath, 100, 107)
    assert x_hit == x_total, "x-sorted layout has no y locality"
    assert z_hit < z_total / 2, (
        f"z-order should prune >half the row groups: {z_hit}/{z_total}"
    )


def test_storage_zorder_cells_counts_partition_the_table(spark):
    from bitcoin_datawarehouse_spark.operators.storage import (
        storage_zorder_cells,
    )
    from bitcoin_datawarehouse_spark.tables import load_table
    from tests.conftest import SF_SMALL

    cells = storage_zorder_cells(spark, SF_SMALL).collect()
    n = load_table(spark, SF_SMALL, "orders").count()
    assert sum(r["n_orders"] for r in cells) == n
    for r in cells:
        assert 0 <= r["cust_bucket"] < 2**16
        assert 0 <= r["day_bucket"] < 2**16
        assert r["zcell"] == _morton_ref(r["cust_bucket"], r["day_bucket"])


def test_manifest_pruned_read_equals_full_scan_and_skips_files(
    spark, tmp_path
):
    """The file-skipping manifest over a z-ordered write: the pruned
    read returns EXACTLY the full scan's rows for a 2-D range while
    opening a minority of the files; an empty-result range reads zero
    files."""
    from bitcoin_datawarehouse_spark.operators.storage import (
        build_manifest,
        manifest_pruned_read,
    )

    n_side = 128
    grid = spark.range(n_side * n_side).select(
        (F.col("id") % n_side).alias("x"),
        (F.col("id") / n_side).cast("long").alias("y"),
    )
    path = str(tmp_path / "zgrid")
    write_zordered(grid, path, zorder2(F.col("x"), F.col("y")), 16)
    man = build_manifest(spark, path, ["x", "y"])
    assert man.count() == 16
    ranges = {"x": (10, 30), "y": (100, 120)}
    pruned, read, total = manifest_pruned_read(spark, man, ranges)
    expect = sorted(
        (r["x"], r["y"])
        for r in grid.where(
            (F.col("x") >= 10) & (F.col("x") <= 30)
            & (F.col("y") >= 100) & (F.col("y") <= 120)
        ).collect()
    )
    got = sorted((r["x"], r["y"]) for r in pruned.collect())
    assert got == expect and expect
    assert read < total / 2, f"manifest should skip most files: {read}/{total}"
    empty, read0, _ = manifest_pruned_read(
        spark, man, {"x": (500, 600), "y": (0, 5)}
    )
    assert read0 == 0 and empty.count() == 0


def _ztab_fixture_rows(spark, lo, hi, n_side=64, stride=1, offset=0):
    base = spark.range(lo, hi)
    if stride > 1:
        base = base.where(F.col("id") % stride == offset)
    return base.select(
        (F.col("id") % n_side).alias("x"),
        ((F.col("id") / n_side).cast("long") % n_side).alias("y"),
        F.col("id").alias("payload"),
    )


def test_ztable_loop_ingest_equals_oneshot_and_compact_is_local(
    spark, tmp_path
):
    """The storage production loop: seed + two ingests hold exactly the
    one-shot seed's data; compact() rewrites ONLY over-threshold blocks
    (every other block directory byte-identical) and changes nothing
    about the table's content."""
    import hashlib
    import pathlib

    from bitcoin_datawarehouse_spark.operators.ztable import ZOrderedTable

    dims = [("x", 64), ("y", 64)]
    one = ZOrderedTable(
        spark, str(tmp_path / "one"), dims, block_bits=2
    )
    one.seed(_ztab_fixture_rows(spark, 0, 3000))

    tab = ZOrderedTable(
        spark,
        str(tmp_path / "loop"),
        dims,
        block_bits=2,
        max_files_per_block=2,
    )
    tab.seed(_ztab_fixture_rows(spark, 0, 3000, stride=3, offset=0))
    # second handle re-opens from the sidecar (no dims passed)
    again = ZOrderedTable(
        spark, str(tmp_path / "loop"), max_files_per_block=2
    )
    assert again.dims == [("x", 64), ("y", 64)]
    for off in (1, 2):
        again.ingest(
            _ztab_fixture_rows(spark, 0, 3000, stride=3, offset=off)
        )

    def content(t):
        return sorted(
            (r["x"], r["y"], r["payload"])
            for r in t.read_all().collect()
        )

    assert content(again) == content(one)

    def digests(t):
        out = {}
        for d in pathlib.Path(t.path, "data").glob("zblock=*"):
            for f in sorted(d.glob("*.parquet")):
                out[f"{d.name}/{f.name}"] = hashlib.md5(
                    f.read_bytes()
                ).hexdigest()
        return out

    before = digests(again)
    over = {
        d.name
        for d in pathlib.Path(again.path, "data").glob("zblock=*")
        if len(list(d.glob("*.parquet"))) > 2
    }
    assert over, "fixture must push some blocks over the threshold"
    rewritten = set(again.compact())
    assert rewritten == over
    after = digests(again)
    untouched = {
        k: v for k, v in before.items() if k.split("/")[0] not in rewritten
    }
    assert untouched == {
        k: v for k, v in after.items() if k.split("/")[0] not in rewritten
    }
    for b in rewritten:
        assert (
            len([k for k in after if k.startswith(b + "/")]) == 1
        ), "compacted block should be one file"
    assert content(again) == content(one)


def test_ztable_read_range_prunes_blocks_and_matches_filter(
    spark, tmp_path
):
    from bitcoin_datawarehouse_spark.operators.ztable import ZOrderedTable

    tab = ZOrderedTable(
        spark, str(tmp_path / "t"), [("x", 64), ("y", 64)], block_bits=3
    )
    tab.seed(_ztab_fixture_rows(spark, 0, 4096))
    ranges = {"x": (5, 12), "y": (40, 47)}
    df, read, total = tab.read_range(ranges)
    got = sorted((r["x"], r["y"], r["payload"]) for r in df.collect())
    want = sorted(
        (r["x"], r["y"], r["payload"])
        for r in tab.read_all()
        .where(
            (F.col("x") >= 5) & (F.col("x") <= 12)
            & (F.col("y") >= 40) & (F.col("y") <= 47)
        )
        .collect()
    )
    assert got == want and want
    assert read < total / 2, f"block pruning expected: {read}/{total}"
    # out-of-domain rectangle reads nothing
    empty, r0, _ = tab.read_range({"x": (63, 63), "y": (0, 0)})
    assert empty.count() == (
        tab.read_all()
        .where((F.col("x") == 63) & (F.col("y") == 0))
        .count()
    )


def test_ztable_streaming_ingest_equals_batch_and_replay_is_noop(
    spark, tmp_path
):
    """The storage tier's streaming arrival path: streamed micro-batch
    ingests produce the IDENTICAL table content as the batch loop,
    auto-compaction keeps per-block file counts bounded while the
    stream runs, and a full replay from a fresh checkpoint appends
    nothing (the anti-join replay guard)."""
    from bitcoin_datawarehouse_spark.operators.ztable import ZOrderedTable
    from bitcoin_datawarehouse_spark.streaming.jobs import (
        run_stream_to_completion,
    )
    from bitcoin_datawarehouse_spark.streaming.ztable_stream import (
        run_ztable_ingest_stream,
    )

    all_rows = _ztab_fixture_rows(spark, 0, 3200)
    src = tmp_path / "in"
    # four single-file arrivals after the seed's [0, 800)
    for i, (lo, hi) in enumerate(
        [(800, 1400), (1400, 2000), (2000, 2600), (2600, 3200)]
    ):
        all_rows.where(
            (F.col("payload") >= lo) & (F.col("payload") < hi)
        ).coalesce(1).write.parquet(str(src / f"f{i}"))

    tab = ZOrderedTable(
        spark,
        str(tmp_path / "t"),
        [("x", 64), ("y", 64)],
        block_bits=2,
        max_files_per_block=2,
    )
    tab.seed(_ztab_fixture_rows(spark, 0, 800))

    def stream():
        return (
            spark.readStream.schema("x long, y long, payload long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )

    run_stream_to_completion(
        run_ztable_ingest_stream(
            stream(), tab, "payload", str(tmp_path / "ck1")
        )
    )
    one = ZOrderedTable(
        spark, str(tmp_path / "one"), [("x", 64), ("y", 64)], block_bits=2
    )
    one.seed(_ztab_fixture_rows(spark, 0, 3200))

    def content(t):
        return sorted(
            (r["x"], r["y"], r["payload"]) for r in t.read_all().collect()
        )

    assert content(tab) == content(one)
    # auto-compaction bounded the per-block file count while streaming
    import pathlib

    for d in pathlib.Path(tab.path, "data").glob("zblock=*"):
        assert len(list(d.glob("*.parquet"))) <= 2 + 1, d

    # full replay from a fresh checkpoint: the anti-join makes it a no-op
    run_stream_to_completion(
        run_ztable_ingest_stream(
            stream(), tab, "payload", str(tmp_path / "ck2")
        )
    )
    assert content(tab) == content(one)


def test_append_manifest_equals_rebuild_and_stats_only_new_files(
    spark, tmp_path
):
    """After an ingest, append_manifest over just the new files must
    produce the IDENTICAL manifest a full rebuild does; re-appending
    the same paths is idempotent (re-stat replaces, never duplicates).
    """
    from bitcoin_datawarehouse_spark.operators.storage import (
        append_manifest,
        build_manifest,
    )

    path = str(tmp_path / "t")
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    write_zordered(grid, path, zorder2(F.col("x"), F.col("y")), 8)
    man0 = build_manifest(spark, path, ["x", "y"])
    known = {r["file_path"] for r in man0.collect()}

    grid2 = spark.range(4096, 5120).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    grid2.coalesce(2).write.mode("append").parquet(path)
    import pathlib

    new_paths = sorted(
        f"file:{p}"
        for p in pathlib.Path(path).glob("*.parquet")
        if f"file:{p}" not in known
    )
    assert new_paths, "append wrote no new files?"

    def rows(m):
        return sorted(tuple(r) for r in m.collect())

    appended = append_manifest(spark, man0, new_paths, ["x", "y"])
    rebuilt = build_manifest(spark, path, ["x", "y"])
    assert rows(appended) == rows(rebuilt)
    # idempotent: splicing the same paths again changes nothing
    again = append_manifest(spark, appended, new_paths, ["x", "y"])
    assert rows(again) == rows(rebuilt)
    # empty batch is a no-op frame
    assert rows(append_manifest(spark, appended, [], ["x", "y"])) == rows(
        rebuilt
    )


def test_sync_manifest_drops_vanished_and_stats_new(spark, tmp_path):
    """sync_manifest must reconcile BOTH directions: entries for
    deleted files vanish (a stale entry is a missing-file read
    failure), new files get stat'd — and the result equals a rebuild."""
    import pathlib

    from bitcoin_datawarehouse_spark.operators.storage import (
        build_manifest,
        sync_manifest,
    )

    path = str(tmp_path / "t")
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    write_zordered(grid, path, zorder2(F.col("x"), F.col("y")), 8)
    # materialize the manifest — stored planning state, as in the
    # sidecar flow; a LIVE aggregate plan over the same files would
    # (correctly) fail once they are deleted underneath it
    man0 = spark.createDataFrame(
        build_manifest(spark, path, ["x", "y"]).collect()
    )

    # simulate a compaction: remove two files, add one
    files = sorted(pathlib.Path(path).glob("*.parquet"))
    for f in files[:2]:
        f.unlink()
    spark.range(9000, 9100).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    ).coalesce(1).write.mode("append").parquet(path)

    synced = sorted(
        tuple(r) for r in sync_manifest(spark, man0, path, ["x", "y"]).collect()
    )
    rebuilt = sorted(
        tuple(r) for r in build_manifest(spark, path, ["x", "y"]).collect()
    )
    assert synced == rebuilt
    # from-nothing sync is a rebuild
    fresh = sorted(
        tuple(r) for r in sync_manifest(spark, None, path, ["x", "y"]).collect()
    )
    assert fresh == rebuilt


def test_manifest_pruned_read_collects_only_survivors(spark, tmp_path):
    """The range intersect must run on the manifest FRAME before the
    collect: the files the function opens are exactly the survivors an
    independent python evaluation of the stats picks, and the returned
    frame's input files are that same set (nothing extra planned)."""
    from bitcoin_datawarehouse_spark.operators.storage import (
        build_manifest,
        manifest_pruned_read,
    )

    path = str(tmp_path / "t")
    grid = spark.range(128 * 128).select(
        (F.col("id") % 128).alias("x"),
        (F.col("id") / 128).cast("long").alias("y"),
    )
    write_zordered(grid, path, zorder2(F.col("x"), F.col("y")), 16)
    man = build_manifest(spark, path, ["x", "y"])
    ranges = {"x": (10, 30), "y": (100, 120)}
    expected = {
        r["file_path"]
        for r in man.collect()
        if all(
            r[f"min_{c}"] is not None
            and r[f"min_{c}"] <= hi
            and r[f"max_{c}"] >= lo
            for c, (lo, hi) in ranges.items()
        )
    }
    pruned, read, total = manifest_pruned_read(spark, man, ranges)
    assert read == len(expected) and read < total

    def canon(uri):  # inputFiles says file:///x, _metadata file:/x
        return "/" + uri.split(":", 1)[1].lstrip("/")

    assert {canon(u) for u in pruned.inputFiles()} == {
        canon(u) for u in expected
    }


def test_ztable_stream_keeps_manifest_fresh_at_every_trigger(
    spark, tmp_path
):
    """Composition contract (r6 VERDICT item 4): with manifest_cols
    set, the streaming ingest loop refreshes the file-skipping sidecar
    every trigger — so at EVERY trigger boundary (including ones where
    auto-compaction rewrote blocks) the manifest lists exactly the
    live files, manifest_pruned_read equals the full-scan filter, and
    it still skips files."""
    import pathlib

    from bitcoin_datawarehouse_spark.operators.storage import (
        manifest_pruned_read,
    )
    from bitcoin_datawarehouse_spark.operators.ztable import ZOrderedTable
    from bitcoin_datawarehouse_spark.streaming.jobs import (
        run_stream_to_completion,
    )
    from bitcoin_datawarehouse_spark.streaming.ztable_stream import (
        run_ztable_ingest_stream,
    )

    all_rows = _ztab_fixture_rows(spark, 0, 3200)
    src = tmp_path / "in"
    tab = ZOrderedTable(
        spark,
        str(tmp_path / "t"),
        [("x", 64), ("y", 64)],
        block_bits=2,
        max_files_per_block=2,
    )
    tab.seed(_ztab_fixture_rows(spark, 0, 800))
    ranges = {"x": (5, 20), "y": (2, 12)}
    compacted_any = False
    batches = [(800, 1400), (1400, 2000), (2000, 2600), (2600, 3200)]
    for i, (lo, hi) in enumerate(batches):
        all_rows.where(
            (F.col("payload") >= lo) & (F.col("payload") < hi)
        ).coalesce(1).write.parquet(str(src / f"f{i}"))
        files_before = {
            str(p) for p in pathlib.Path(tab.path, "data").rglob("*.parquet")
        }
        run_stream_to_completion(
            run_ztable_ingest_stream(
                spark.readStream.schema("x long, y long, payload long")
                .parquet(str(src / "*")),
                tab,
                "payload",
                str(tmp_path / "ck"),
                manifest_cols=["x", "y"],
            )
        )
        files_after = {
            str(p) for p in pathlib.Path(tab.path, "data").rglob("*.parquet")
        }
        if files_before - files_after:
            compacted_any = True
        # trigger boundary: the sidecar lists exactly the live files
        man = spark.read.parquet(str(pathlib.Path(tab.path, "manifest")))
        assert {r["file_path"] for r in man.collect()} == {
            f"file:{p}" for p in files_after
        }
        pruned, read, total = manifest_pruned_read(spark, man, ranges)
        want = sorted(
            (r["x"], r["y"], r["payload"])
            for r in tab.read_all()
            .where(
                (F.col("x") >= 5) & (F.col("x") <= 20)
                & (F.col("y") >= 2) & (F.col("y") <= 12)
            )
            .collect()
        )
        got = sorted(
            (r["x"], r["y"], r["payload"]) for r in pruned.collect()
        )
        assert got == want and want
        assert read < total, "z-clustered blocks should let files skip"
    assert compacted_any, (
        "fixture must force at least one mid-stream compaction"
    )


def test_ztable_refuses_mismatched_geometry(spark, tmp_path):
    """Re-opening a table with DIFFERENT dims or block_bits must
    refuse loudly — silently honoring the stale sidecar would alias
    z-keys and clamp read ranges (review-caught)."""
    import pytest

    from bitcoin_datawarehouse_spark.operators.ztable import ZOrderedTable

    path = str(tmp_path / "t")
    ZOrderedTable(spark, path, [("x", 64), ("y", 64)], block_bits=2)
    # same geometry re-open is fine
    ZOrderedTable(spark, path, [("x", 64), ("y", 64)], block_bits=2)
    with pytest.raises(ValueError, match="pinned dims"):
        ZOrderedTable(spark, path, [("x", 128), ("y", 64)], block_bits=2)
    with pytest.raises(ValueError, match="block_bits"):
        ZOrderedTable(spark, path, [("x", 64), ("y", 64)], block_bits=3)


def test_warehouse_read_pruned_equals_filter_and_skips_files(
    spark, tmp_path
):
    """The catalog-level manifest read (r8 VERDICT item 7):
    Warehouse.read(..., ranges, use_manifest=True) must return
    exactly the plain-filter rows while OPENING fewer files, survive
    an atomic table replace (the sidecar resyncs: vanished entries
    dropped, new files statted), and key its sidecar by stat-column
    set."""
    from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(1000).select(
        F.col("id").alias("v"), (F.col("id") * 7 % 13).alias("w")
    )
    # range-clustered files → tight per-file min/max on v
    wh.write_atomic(df.repartitionByRange(8, "v"), "lake", "t")

    ranges = {"v": (100, 199)}
    pruned, files_read, files_total = wh.read_pruned("lake", "t", ranges)
    want = sorted(
        tuple(r) for r in wh.read("lake", "t", ranges=ranges).collect()
    )
    got = sorted(tuple(r) for r in pruned.collect())
    got2 = sorted(
        tuple(r)
        for r in wh.read(
            "lake", "t", ranges=ranges, use_manifest=True
        ).collect()
    )
    assert got == want == got2 and len(got) == 100
    assert files_read < files_total
    # the sidecar is a catalog-invisible table keyed by column set
    assert "t" in wh.list_tables("lake")
    assert all(".__manifest_" not in n for n in wh.list_tables("lake"))

    # atomic replace: all files vanish, new ones appear — the synced
    # sidecar must neither fail (stale entry = missing input) nor
    # over-keep
    df2 = spark.range(500).select(
        (F.col("id") + 2000).alias("v"), F.lit(0).alias("w")
    )
    wh.write_atomic(df2.repartitionByRange(4, "v"), "lake", "t")
    pruned2, read2, total2 = wh.read_pruned("lake", "t", ranges)
    assert pruned2.count() == 0 and total2 == 4
    pr3, read3, total3 = wh.read_pruned(
        "lake", "t", {"v": (2000, 2099)}
    )
    assert pr3.count() == 100 and read3 < total3

    # a different predicate column builds its OWN sidecar (never
    # mispruning on stats the first sidecar does not have)
    prw, readw, totalw = wh.read_pruned("lake", "t", {"w": (0, 0)})
    assert prw.count() == 500 and totalw == 4


def test_ztable_read_range_manifest_matches_block_read(spark, tmp_path):
    """ZOrderedTable.read_range_manifest (the sidecar-routed range
    read) must equal read_range's rows and the full-scan filter, and
    self-heal when the sidecar is absent or maintained over different
    stat columns."""
    from bitcoin_datawarehouse_spark.operators.ztable import ZOrderedTable

    tab = ZOrderedTable(
        spark, str(tmp_path / "t"), [("x", 64), ("y", 64)], block_bits=2
    )
    rows = spark.range(2000).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") / 64).cast("long") % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    tab.seed(rows)
    ranges = {"x": (5, 20), "y": (2, 12)}
    want = sorted(
        (r["x"], r["y"], r["payload"])
        for r in tab.read_range(ranges)[0].collect()
    )
    # no sidecar yet → built on first use
    pruned, files_read, files_total = tab.read_range_manifest(ranges)
    got = sorted(
        (r["x"], r["y"], r["payload"]) for r in pruned.collect()
    )
    assert got == want and got
    assert files_read <= files_total
    # different stat columns → served from a TRANSIENT stats pass,
    # never by clobbering the maintained sidecar (the streaming
    # loop's next refresh would union mismatched column sets)
    import pathlib

    before = sorted(
        p.name
        for p in pathlib.Path(tab.path, "manifest").glob("*.parquet")
    )
    pr2, _, _ = tab.read_range_manifest({"payload": (100, 199)})
    assert pr2.count() == 100
    man = spark.read.parquet(str(pathlib.Path(tab.path, "manifest")))
    assert "min_x" in man.columns and "min_payload" not in man.columns
    assert sorted(
        p.name
        for p in pathlib.Path(tab.path, "manifest").glob("*.parquet")
    ) == before
