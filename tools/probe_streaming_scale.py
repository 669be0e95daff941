"""Streaming-layer throughput probe (SCALING.md evidence).

The scale table covers batch analytics, the loader, and the index
loops; this probe measures the STREAMING layer itself: the events
fixture re-staged as N files → N micro-batches driven availableNow
through the two production shapes —

* windowed counts (watermarked tumbling window + state store), to a
  noop-equivalent memory sink;
* foreachBatch key-merge into a parquet warehouse table
  (``merge_stream_into_table`` — the reference's incremental loop as
  a continuous process).

Reports wall clock, micro-batch count, and rows/s per (fixture,
shape).  Rows/s is the honest unit: micro-batch streaming pays a
per-trigger floor (offset commit + planning), so throughput, not
per-query latency, is the scaling claim.

Usage: python tools/probe_streaming_scale.py DIR [DIR ...]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse  # noqa: E402
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402
from bitcoin_datawarehouse_spark.streaming.jobs import (  # noqa: E402
    EVENTS_SCHEMA,
    merge_stream_into_table,
    run_stream_to_completion,
    windowed_event_counts,
)
from bitcoin_datawarehouse_spark.tables import load_table  # noqa: E402

N_FILES = 8  # micro-batches per run (maxFilesPerTrigger=1)


def main() -> int:
    dirs = sys.argv[1:]
    if not dirs:
        print("usage: probe_streaming_scale.py DIR [DIR ...]")
        return 2
    spark = get_spark("streaming-probe", shuffle_partitions=32)
    for d in dirs:
        events = load_table(spark, d, "events")
        n = events.count()
        stage = Path(tempfile.mkdtemp(prefix="stream_stage_"))
        # N files -> N micro-batches; repartition(1) per slice keeps
        # file count exact without a global coalesce
        for i in range(N_FILES):
            events.filter(F.col("event_id") % N_FILES == i).repartition(
                1
            ).write.parquet(str(stage / f"f{i}"))

        def read_stream():
            return (
                spark.readStream.schema(EVENTS_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(stage / "*"))
            )

        out = {"dir": d, "n_rows": n, "micro_batches": N_FILES}

        t0 = time.time()
        q = (
            windowed_event_counts(read_stream())
            .writeStream.format("memory")
            .queryName("probe_wc")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        run_stream_to_completion(q)
        wall = time.time() - t0
        out["windowed_counts_s"] = round(wall, 1)
        out["windowed_counts_rows_per_s"] = int(n / wall)

        wh = Warehouse(spark, tempfile.mkdtemp(prefix="stream_wh_"))
        t0 = time.time()
        run_stream_to_completion(
            merge_stream_into_table(
                read_stream(), wh, "s", "events",
                keys=["event_id"],
                checkpoint_dir=tempfile.mkdtemp(prefix="ck_"),
            )
        )
        wall = time.time() - t0
        out["merge_stream_s"] = round(wall, 1)
        out["merge_stream_rows_per_s"] = int(n / wall)
        assert wh.read("s", "events").count() == n

        # partition-scoped merge leg: batches arrive in EVENT-TIME
        # order (the streaming reality), so each touches ~1/N of the
        # day partitions — the cost model under test
        from bitcoin_datawarehouse_spark.streaming.jobs import (
            merge_stream_into_partitioned_table,
        )

        stage2 = Path(tempfile.mkdtemp(prefix="stream_stage2_"))
        ev_day = events.withColumn("day", F.to_date("ts"))
        bounds = ev_day.select(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).first()
        span = (bounds["hi"] - bounds["lo"]) / N_FILES
        for i in range(N_FILES):
            lo = bounds["lo"] + i * span
            hi = bounds["hi"] if i == N_FILES - 1 else lo + span
            sl = ev_day.filter(
                (F.col("ts") >= F.lit(lo))
                & (F.col("ts") <= F.lit(hi) if i == N_FILES - 1
                   else F.col("ts") < F.lit(hi))
            )
            sl.repartition(1).write.parquet(str(stage2 / f"f{i}"))
        day_schema = EVENTS_SCHEMA.add("day", "date")
        pwh = Warehouse(spark, tempfile.mkdtemp(prefix="stream_pwh_"))
        t0 = time.time()
        run_stream_to_completion(
            merge_stream_into_partitioned_table(
                spark.readStream.schema(day_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(stage2 / "*")),
                pwh, "s", "events",
                keys=["event_id", "day"], partition_col="day",
                checkpoint_dir=tempfile.mkdtemp(prefix="ckp_"),
            )
        )
        wall = time.time() - t0
        out["merge_partitioned_s"] = round(wall, 1)
        out["merge_partitioned_rows_per_s"] = int(n / wall)
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
