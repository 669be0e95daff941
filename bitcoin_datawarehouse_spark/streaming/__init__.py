"""Structured Streaming layer — see streaming/jobs.py."""

from bitcoin_datawarehouse_spark.streaming.jobs import (
    EVENTS_SCHEMA,
    dedup_within_watermark,
    merge_stream_into_table,
    read_event_stream,
    run_stream_to_completion,
    windowed_event_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "dedup_within_watermark",
    "merge_stream_into_table",
    "read_event_stream",
    "run_stream_to_completion",
    "windowed_event_counts",
]
