"""Pipeline layer: the reference's local operator surface, Spark-native.

See SURVEY.md §2.1-2.10 — catalog (namespaces, atomic writes), load
strategies (full refresh / incremental merge / delete), 5-type schema
inference, declarative column transforms, polling source adapter, and
the job-control runner.
"""

from bitcoin_datawarehouse_spark.pipeline.catalog import (
    Warehouse,
    lakehouse_pair,
)
from bitcoin_datawarehouse_spark.pipeline.jobs import (
    JobControl,
    JobResult,
    LoadStrategy,
    Pipeline,
)
from bitcoin_datawarehouse_spark.pipeline.loader import Loader
from bitcoin_datawarehouse_spark.pipeline.schema import infer_schema, rows_to_df
from bitcoin_datawarehouse_spark.pipeline.source import (
    FileReplaySource,
    RestPollingSource,
    StaticSource,
    fetch_as_df,
)
from bitcoin_datawarehouse_spark.pipeline.quality import (
    CheckedFrame,
    Expectation,
    QualityError,
    QualityGate,
    expect_between,
    expect_min_rows,
    expect_mostly_unique,
    expect_no_nulls,
)
from bitcoin_datawarehouse_spark.pipeline.sqlrunner import (
    read_file,
    register_warehouse_views,
    run_sql,
    run_sql_file,
)
from bitcoin_datawarehouse_spark.pipeline.transform import (
    TableSpec,
    compile_expr,
    lowercase_columns,
    parse_spec,
    with_audit_column,
)

__all__ = [
    "Warehouse",
    "lakehouse_pair",
    "Loader",
    "JobControl",
    "JobResult",
    "LoadStrategy",
    "Pipeline",
    "infer_schema",
    "rows_to_df",
    "FileReplaySource",
    "RestPollingSource",
    "StaticSource",
    "fetch_as_df",
    "read_file",
    "register_warehouse_views",
    "run_sql",
    "run_sql_file",
    "CheckedFrame",
    "Expectation",
    "QualityError",
    "QualityGate",
    "expect_between",
    "expect_min_rows",
    "expect_mostly_unique",
    "expect_no_nulls",
    "TableSpec",
    "compile_expr",
    "lowercase_columns",
    "parse_spec",
    "with_audit_column",
]
