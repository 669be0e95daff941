"""CLI, SQL-file runner, replay-source, and bitcoin-demo tests."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

from bitcoin_datawarehouse_spark.__main__ import main as cli_main
from bitcoin_datawarehouse_spark.pipeline import (
    FileReplaySource,
    Warehouse,
    register_warehouse_views,
    rows_to_df,
    run_sql_file,
)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples.bitcoin_warehouse_demo import (  # noqa: E402
    TRANSFORM_SPEC,
    record_responses,
    run_demo,
    synth_rows,
)


@pytest.fixture()
def recorded(tmp_path):
    d = tmp_path / "responses"
    record_responses(d, synth_rows(8))
    return d


def test_file_replay_source_watermark_filter(recorded):
    src = FileReplaySource(str(recorded), param_column="date")
    all_rows = src.fetch(2177266)
    newer = src.fetch(2177266, parameters="2025-01-01")
    assert len(all_rows) == 8
    assert 0 < len(newer) < len(all_rows)
    assert all(r["date"] > "2025-01-01" for r in newer)
    # execute/poll protocol equivalence
    assert src.poll(src.execute(2177266, "2025-01-01")) == newer


def test_cli_end_to_end(tmp_path, recorded):
    jobs_csv = tmp_path / "jobs.csv"
    jobs_csv.write_text(
        "JOB_NAME,QUERY_ID,TARGET_TABLE,P_KEY,STATUS,ACTIVE,INCREMENTAL_COLUMN\n"
        "bitcoin_block,2177266,block,hash,0,1,date\n"
        "inactive_job,2177353,input,transaction_id,0,0,date\n"
    )
    spec = tmp_path / "transform.yaml"
    spec.write_text(TRANSFORM_SPEC)
    rc = cli_main(
        [
            "--warehouse", str(tmp_path / "wh"),
            "--source-dir", str(recorded),
            "--seed-jobs", str(jobs_csv),
            "--transform-spec", str(spec),
            "--param-column", "date",
        ]
    )
    assert rc == 0
    assert (tmp_path / "wh" / "bitcoin" / "block").exists()
    assert not (tmp_path / "wh" / "bitcoin" / "input").exists()  # inactive


def test_cli_continue_on_error_exit_code(tmp_path, recorded):
    jobs_csv = tmp_path / "jobs.csv"
    jobs_csv.write_text(
        "JOB_NAME,QUERY_ID,TARGET_TABLE,P_KEY,STATUS,ACTIVE,INCREMENTAL_COLUMN\n"
        "bitcoin_block,2177266,block,hash,0,1,date\n"
        "broken,999,b,x,0,1,date\n"
    )
    rc = cli_main(
        [
            "--warehouse", str(tmp_path / "wh"),
            "--source-dir", str(recorded),
            "--seed-jobs", str(jobs_csv),
        ]
    )
    assert rc == 1  # broken job failed…
    assert (tmp_path / "wh" / "bitcoin" / "block").exists()  # …good one ran


def test_sql_file_runner(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write_atomic(
        rows_to_df(spark, [{"k": 1, "v": 10.0}, {"k": 2, "v": 20.0}]),
        "s", "t",
    )
    names = register_warehouse_views(spark, wh)
    assert names == ["s_t"]
    f = tmp_path / "q.sql"
    f.write_text(
        "CREATE OR REPLACE TEMP VIEW doubled AS SELECT k, v * 2 AS v2 FROM s_t;\n"
        "SELECT SUM(v2) AS total FROM doubled;\n"
    )
    [row] = run_sql_file(spark, str(f)).collect()
    assert row["total"] == 60.0


def test_bitcoin_demo_end_to_end(spark, tmp_path):
    out = run_demo(str(tmp_path), spark=spark)
    assert out["all_ok"]
    # incremental grew the chain without duplicating
    assert out["second_sync"]["bitcoin_block"] == 52
    assert out["first_sync"]["bitcoin_block"] == 40
    [chain] = out["answers"]["chain_check"]
    assert chain["linked_blocks"] == 51  # every non-genesis block links
    assert {r["entity"] for r in out["answers"]["entity_flow"]} == {
        "MINER", "EXCHANGE", "USER",
    }
    assert json.dumps(out["answers"]["daily_fees"], default=str)  # serializable


def test_index_loops_demo_end_to_end(tmp_path):
    """The persisted-index production loops demo: both loops complete,
    the streamed documents/vectors are decided/searchable, and the
    dedup ledger covers every streamed doc."""
    from examples.index_loops_demo import main

    out = main(str(tmp_path / "work"))
    assert out["dedup"]["docs_streamed"] > 0
    assert out["dedup"]["index_docs"] > out["dedup"]["docs_streamed"]
    assert out["ann"]["queries_served"] > 0
    assert out["ann"]["hits"] >= out["ann"]["queries_served"]
    # new vectors became searchable without a rebuild
    assert out["ann"]["streamed_vectors_in_results"] > 0
    # ...and taken-down vectors stopped being served, also no rebuild
    assert out["ann"]["deleted"] > 0
    assert out["ann"]["deleted_still_served"] == 0
    # the PQ serving tier answers every query from code-payload lists;
    # the storage claim is on the payload COLUMN (512 B/vec float32 →
    # 4 B/vec nibble-packed code, so ≥10× compressed even at 500 rows)
    # — raw directory bytes at demo scale are file-count-floor noise
    # (hundreds of tiny files × ~0.5 KB footers), only reported
    assert out["ivfpq"]["queries_served"] == out["ann"]["queries_served"]
    assert out["ivfpq"]["pq_list_bytes"] < out["ivfpq"]["vec_list_bytes"]
    assert (
        out["ivfpq"]["pq_payload_bytes"] * 10
        < out["ivfpq"]["vec_payload_bytes"]
    )


def test_storage_loop_demo_end_to_end(tmp_path):
    """The storage-tier production loop demo: seed + streamed ingests
    complete, auto-compaction keeps blocks bounded, and both pruned
    read paths (block dirs, stats manifest) return exact results
    while reading a minority of the data."""
    from examples.storage_loop_demo import main

    out = main(str(tmp_path / "work"))
    assert out["rows_total"] > 0
    assert out["max_files_per_block"] <= 2
    assert 0 < out["blocks_read"] < out["blocks_total"] / 2
    assert out["range_rows"] > 0
    assert 0 < out["manifest_files_read"] < out["manifest_files_total"] / 2


def test_cli_incremental_value_first_sync(tmp_path, recorded):
    """--incremental-value drives a FIRST sync from the supplied
    watermark (reference arguments.py:19-24): only rows past the
    value load, where the default first-sync path would full-refresh
    everything."""
    import duckdb

    jobs_csv = tmp_path / "jobs.csv"
    jobs_csv.write_text(
        "JOB_NAME,QUERY_ID,TARGET_TABLE,P_KEY,STATUS,ACTIVE,INCREMENTAL_COLUMN\n"
        "bitcoin_block,2177266,block,hash,0,1,date\n"
    )
    src = FileReplaySource(str(recorded), param_column="date")
    expect = src.fetch(2177266, parameters="2025-01-01")
    assert 0 < len(expect) < len(src.fetch(2177266))

    rc = cli_main(
        [
            "--warehouse", str(tmp_path / "wh"),
            "--source-dir", str(recorded),
            "--seed-jobs", str(jobs_csv),
            "--param-column", "date",
            "--incremental-value", "2025-01-01",
        ]
    )
    assert rc == 0
    tbl = tmp_path / "wh" / "bitcoin" / "block"
    got = duckdb.sql(
        f"SELECT COUNT(*) AS n, MIN(date) AS lo FROM '{tbl}/*.parquet'"
    ).fetchone()
    assert got[0] == len(expect)
    assert str(got[1]) > "2025-01-01"

def test_cli_incremental_value_ignored_without_inc_col(tmp_path, recorded):
    """A watermark override on a job with NO incremental column is
    ignored (with a warning), not silently applied: the job still
    loads EVERYTHING via its normal first-sync full refresh instead
    of a delta keyed only by the source's param column (r10 ADVICE)."""
    import duckdb

    jobs_csv = tmp_path / "jobs.csv"
    jobs_csv.write_text(
        "JOB_NAME,QUERY_ID,TARGET_TABLE,P_KEY,STATUS,ACTIVE\n"
        "bitcoin_block,2177266,block,hash,0,1\n"
    )
    src = FileReplaySource(str(recorded), param_column="date")
    everything = src.fetch(2177266)

    rc = cli_main(
        [
            "--warehouse", str(tmp_path / "wh"),
            "--source-dir", str(recorded),
            "--seed-jobs", str(jobs_csv),
            "--param-column", "date",
            "--incremental-value", "2025-01-01",
        ]
    )
    assert rc == 0
    tbl = tmp_path / "wh" / "bitcoin" / "block"
    got = duckdb.sql(
        f"SELECT COUNT(*) AS n FROM '{tbl}/*.parquet'"
    ).fetchone()
    assert got[0] == len(everything)
