"""Source adapters (re-exported from the pipeline layer).

Canonical implementations live in ``pipeline/source.py`` — the
execute-then-poll REST state machine (reference parity) and the
in-memory test source.  This package is the stable import point for
source implementations as formats are added (CSV/JSON scan helpers
live on ``pipeline.jobs.JobControl.seed_from_csv`` and
``pipeline.schema.rows_to_df``).
"""

from bitcoin_datawarehouse_spark.pipeline.source import (
    QueryState,
    RestPollingSource,
    Source,
    StaticSource,
    fetch_as_df,
)

__all__ = [
    "QueryState",
    "RestPollingSource",
    "Source",
    "StaticSource",
    "fetch_as_df",
]
