"""Query registry: named analytical operators + their SQL oracles.

Every implemented operator from SURVEY.md §2 registers here via the
``@query`` decorator.  ``QUERIES[name]`` is a callable
``(spark, sf_dir) -> DataFrame``; ``ORACLES[name]`` (optional) is the
ANSI-SQL equivalent DuckDB runs on the same parquet for the driver's
correctness gate.  Queries without an oracle (genuinely
non-SQL-expressible ops) get a weaker rows-only check.

Column-name contract: every computed column is aliased identically in
the DataFrame code and the SQL so the driver's order-insensitive
value hash lines up.

Float determinism contract: aggregates over doubles use the
decimal-sum pattern (see functions/numeric.py) so Spark's parallel
partial aggregation and DuckDB's sequential aggregation produce
bit-identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an analytical operator, optionally with a DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_operators() -> None:
    """Import every operator module so registrations run."""
    from bitcoin_datawarehouse_spark.operators import (  # noqa: F401
        relational,
        windows,
        asof,
        dedup,
        similarity,
        text,
        multimodal,
        pipeline_semantics,
        streaming_ops,
        relational_extra,
        embeddings_extra,
        rangejoin,
        sketches,
        graph,
        text_stats,
        cogroup,
        sql_surface,
        window_extra,
        tpch,
        kmeans,
        trainprep,
        curation,
        substring,
        lm_quality,
        profiling,
        incremental,
        behavior,
    )
