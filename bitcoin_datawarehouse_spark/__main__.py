"""Pipeline CLI — reference parity for ``data_integration/arguments.py``.

The reference's CLI (``arguments.py:10-33``) exposes ``--full-refresh``,
``--incremental-value`` and ``--select t1 t2 …`` over the job registry;
this CLI drives the same controls (plus spec/schema knobs) against the
Spark engine:

    python -m bitcoin_datawarehouse_spark \
        --warehouse /tmp/wh \
        --source-dir recorded_responses/ \
        [--seed-jobs jobs.csv] [--select bitcoin_inputs ...] \
        [--full-refresh] [--incremental-column date] \
        [--incremental-value 2024-01-01] \
        [--transform-spec column_transform.yaml]

The source is a :class:`FileReplaySource` directory of recorded
``{query_id}.json`` responses (the remote API's JSON shape) — swap in
``RestPollingSource`` with a real transport for live extraction.
Exit code is non-zero if any job failed (the reference only logs;
SURVEY §2.8 continue-on-error is preserved — all jobs still run).
"""

from __future__ import annotations

import argparse
import json
import sys

from bitcoin_datawarehouse_spark.pipeline import (
    LoadStrategy,
    Pipeline,
    FileReplaySource,
    Warehouse,
    parse_spec,
)
from bitcoin_datawarehouse_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bitcoin_datawarehouse_spark")
    p.add_argument("--warehouse", required=True, help="warehouse root dir")
    p.add_argument(
        "--source-dir",
        required=True,
        help="dir of recorded {query_id}.json responses",
    )
    p.add_argument(
        "--seed-jobs",
        help="CSV seeding the etl job registry (reference etl_job.csv shape)",
    )
    # the reference's three flags (arguments.py:26-41)
    p.add_argument(
        "--full-refresh",
        action="store_true",
        help="truncate-and-reload every selected table",
    )
    p.add_argument(
        "--incremental-column",
        help="watermark column for incremental sync (overrides registry)",
    )
    p.add_argument(
        "--incremental-value",
        help="explicit initial watermark: fetch only rows past this "
        "value instead of probing the target's MAX (reference "
        "arguments.py:19-24 — dev/backfill from a chosen point, "
        "works on a first sync too)",
    )
    p.add_argument(
        "--select",
        nargs="*",
        help="subset of job names to sync (default: all active)",
    )
    p.add_argument(
        "--param-column",
        help="source column the watermark parameter filters on (replay source)",
    )
    p.add_argument(
        "--transform-spec", help="YAML column-transform spec (reference shape)"
    )
    p.add_argument("--target-schema", default="bitcoin")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = get_spark("bitcoin-dw-pipeline")
    wh = Warehouse(spark, args.warehouse)
    specs = {}
    if args.transform_spec:
        with open(args.transform_spec) as fh:
            specs = parse_spec(fh.read())
    pipe = Pipeline(
        spark,
        wh,
        FileReplaySource(args.source_dir, param_column=args.param_column),
        target_schema=args.target_schema,
        specs=specs,
    )
    if args.seed_jobs:
        pipe.control.seed_from_csv(args.seed_jobs)
    strategy = (
        LoadStrategy.FULL_REFRESH
        if args.full_refresh
        else LoadStrategy.INCREMENTAL
    )
    results = pipe.run(
        select=args.select,
        strategy=strategy,
        incremental_column=args.incremental_column,
        incremental_value=args.incremental_value,
    )
    for r in results:
        print(
            json.dumps(
                {
                    "job": r.job_name,
                    "ok": r.ok,
                    "rows": r.rows_loaded,
                    "error": r.error,
                }
            )
        )
    return 0 if all(r.ok for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
