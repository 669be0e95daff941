"""SQL-file query runner (SURVEY.md §2.1 S6).

The reference carries a file-reader utility for ``.sql`` files
(``data_integration/utils/utils.py:20-40``) as scaffolding for
file-based SQL jobs; here it becomes a real capability: register the
warehouse's tables as views and run SQL text or ``.sql`` files
through Spark SQL — the same Catalyst path as the DataFrame API, so
file-authored queries get identical plans and optimizations.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse


def read_file(relpath: str, anchor_file: str) -> str:
    """Read a text file relative to the caller's file (the reference's
    relpath reader, utils.py:20-40)."""
    return (Path(anchor_file).resolve().parent / relpath).read_text()


def register_warehouse_views(
    spark: SparkSession, wh: Warehouse, schemas: list[str] | None = None
) -> list[str]:
    """Expose every warehouse table as a temp view named
    ``{schema}_{table}`` (Spark temp views are single-level).
    Returns the view names registered."""
    names = []
    for schema in schemas or _schemas(wh):
        for table in wh.list_tables(schema):
            name = f"{schema}_{table}"
            wh.read(schema, table).createOrReplaceTempView(name)
            names.append(name)
    return names


def _schemas(wh: Warehouse) -> list[str]:
    # skip dot-dirs (advisory locks) — they are warehouse plumbing,
    # not namespaces
    return sorted(
        d.name
        for d in wh.root.iterdir()
        if d.is_dir() and not d.name.startswith(".")
    )


def run_sql(spark: SparkSession, sql_text: str) -> DataFrame:
    """Run SQL text (single statement) through Spark SQL."""
    return spark.sql(sql_text)


def run_sql_file(spark: SparkSession, path: str) -> DataFrame:
    """Run the last statement of a ``.sql`` file (earlier ``;``-split
    statements — view definitions etc. — are executed in order)."""
    stmts = [s.strip() for s in Path(path).read_text().split(";") if s.strip()]
    for s in stmts[:-1]:
        spark.sql(s)
    return spark.sql(stmts[-1])
