"""Job control table + pipeline runner.

Reference parity (SURVEY.md §1.4, §2.2, §3): the reference drives
syncs from ``etl.etl_job`` (seeded by ``etl_system/etl_job.csv``) —
scan active jobs (``pull_raw/utils.py:34-38``), mark start
(status=-1, ``:80-85``) / end (status=1, ``:120-125``), and run each
table with continue-on-error (``pull_raw/__main__.py:173-177``).
Incremental runs read the target's MAX(incremental_column) watermark
and push it to the source as a parameter
(``__main__.py:102,114-115``); a missing watermark falls back to full
refresh (``:105-112``).

Design fixes over the reference, deliberate (SURVEY §3 drift bugs):
an explicit ``LoadStrategy`` enum instead of a boolean doubling as a
sentinel; a single ``run_job`` composing fetch→transform→load; and
``error_message``/status actually recorded on failure (the reference
declares the column but never writes it).

The control table is a small parquet managed read-modify-overwrite —
metadata-scale data (one row per job), so driver-side mutation is
correct; the *data* path stays fully distributed.
"""

from __future__ import annotations

import enum
import logging
import traceback
from dataclasses import dataclass
from typing import Any

from pyspark.sql import SparkSession, functions as F

from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse
from bitcoin_datawarehouse_spark.pipeline.loader import Loader
from bitcoin_datawarehouse_spark.pipeline.source import fetch_as_df
from bitcoin_datawarehouse_spark.pipeline.transform import (
    TableSpec,
    lowercase_columns,
    with_audit_column,
)

_LOG = logging.getLogger(__name__)

ETL_SCHEMA = "etl"
JOB_TABLE = "etl_job"

#: reference status protocol (pull_raw/utils.py:80-85,120-125)
STATUS_RUNNING = -1
STATUS_DONE = 1
STATUS_FAILED = 2  # extension: the reference never records failure


class LoadStrategy(enum.Enum):
    FULL_REFRESH = "full_refresh"
    INCREMENTAL = "sync_incremental"


@dataclass
class JobResult:
    job_name: str
    ok: bool
    rows_loaded: int
    error: str | None = None


@dataclass(frozen=True)
class ModelRefreshSpec:
    """Close the model-lifecycle loop (r11 VERDICT item 8): attach a
    registry-managed model to the pipeline so every :meth:`Pipeline.run`
    consults drift/volume AFTER its syncs and retrains through the
    registered fit-parts builder only when the policy fires.

    * ``docs_for(spark, wh)`` reads the serving corpus (usually the
      just-synced target table);
    * ``build_parts(docs)`` fits the model's part frames from it (the
      same builders ``ModelRegistry.publish`` takes);
    * ``watch_jobs`` limits the check to runs where one of the named
      jobs synced rows (None = any successful sync);
    * the decision rides ``ModelRegistry.refresh_if_needed`` — atomic
      generation publish, serving reads unaffected mid-swap.
    """

    name: str
    registry: Any  # ModelRegistry (Any avoids a hard import cycle)
    docs_for: Any  # Callable[[SparkSession, Warehouse], DataFrame]
    build_parts: Any  # Callable[[DataFrame], dict[str, DataFrame]]
    policy: Any | None = None  # RefreshPolicy
    watch_jobs: frozenset[str] | None = None
    keep_back: int = 1


class JobControl:
    """The ``etl.etl_job`` analog."""

    def __init__(self, spark: SparkSession, wh: Warehouse) -> None:
        self.spark = spark
        self.wh = wh

    def seed(self, rows: list[dict[str, Any]]) -> None:
        """Seed the registry (reference load_metadata.ipynb: CSV →
        lowercase columns → stamp last_updated_ts → load)."""
        # localframe-exempt: seeding relies on Spark's dict-row type
        # INFERENCE (no DDL to give local_rows_df, and pandas would
        # infer differently, e.g. None-bearing ints to float); runs
        # once per deployment, so the slice tax is irrelevant
        df = self.spark.createDataFrame(rows)  # type: ignore[arg-type]
        df = _ensure_ledger_columns(with_audit_stamp(lowercase_columns(df)))
        self.wh.write_atomic(df, ETL_SCHEMA, JOB_TABLE, coalesce=1)

    def seed_from_csv(self, csv_path: str) -> None:
        df = self.spark.read.csv(csv_path, header=True, inferSchema=True)
        df = _ensure_ledger_columns(with_audit_stamp(lowercase_columns(df)))
        self.wh.write_atomic(df, ETL_SCHEMA, JOB_TABLE, coalesce=1)

    def tables_to_sync(self, select: list[str] | None = None):
        """Active-job scan (reference pull_raw/utils.py:18-63) with the
        CLI ``--select`` subsetting (reference arguments.py:26-33)."""
        rows = (
            self.wh.read(ETL_SCHEMA, JOB_TABLE)
            .filter(F.col("active") == 1)
            .collect()
        )
        out = [r.asDict() for r in rows]
        if select:
            out = [r for r in out if r["job_name"] in select]
        return out

    def _update_job(self, job_name: str, **sets: Any) -> None:
        df = self.wh.read(ETL_SCHEMA, JOB_TABLE)
        cond = F.col("job_name") == job_name
        for col, val in sets.items():
            if val == "NOW()":
                df = df.withColumn(
                    col, F.when(cond, F.current_timestamp()).otherwise(F.col(col))
                )
            else:
                df = df.withColumn(
                    col, F.when(cond, F.lit(val)).otherwise(F.col(col))
                )
        self.wh.write_atomic(df, ETL_SCHEMA, JOB_TABLE, coalesce=1)

    def start_job(self, job_name: str) -> None:
        """status=-1, start_ts=NOW() (reference utils.py:80-85)."""
        self._update_job(job_name, status=STATUS_RUNNING, start_ts="NOW()")

    def end_job(self, job_name: str) -> None:
        """status=1, end_ts=NOW() (reference utils.py:120-125)."""
        self._update_job(job_name, status=STATUS_DONE, end_ts="NOW()")

    def fail_job(self, job_name: str, error: str) -> None:
        self._update_job(
            job_name, status=STATUS_FAILED, end_ts="NOW()", error_message=error[:2000]
        )

    def job_status(self, job_name: str) -> dict[str, Any] | None:
        rows = (
            self.wh.read(ETL_SCHEMA, JOB_TABLE)
            .filter(F.col("job_name") == job_name)
            .collect()
        )
        return rows[0].asDict() if rows else None


def with_audit_stamp(df):
    return with_audit_column(df)


#: run-ledger columns the reference declares in etl_job.csv:1 (typed
#: null when the seed omits them, so start/end/fail updates resolve)
_LEDGER_COLUMNS = {
    "status": "bigint",
    "start_ts": "timestamp",
    "end_ts": "timestamp",
    "error_message": "string",
}


def _ensure_ledger_columns(df):
    for col, typ in _LEDGER_COLUMNS.items():
        if col not in df.columns:
            df = df.withColumn(col, F.lit(None).cast(typ))
    return df


class Pipeline:
    """fetch → transform → load per job; continue-on-error across jobs."""

    def __init__(
        self,
        spark: SparkSession,
        wh: Warehouse,
        source: Any,
        target_schema: str = "bitcoin",
        specs: dict[str, TableSpec] | None = None,
        model_refresh: list[ModelRefreshSpec] | None = None,
    ) -> None:
        self.spark = spark
        self.wh = wh
        self.source = source
        self.target_schema = target_schema
        self.specs = specs or {}
        self.control = JobControl(spark, wh)
        self.model_refresh = model_refresh or []
        #: per-run model decisions, keyed by model name (read after run())
        self.last_refresh: dict[str, Any] = {}

    def run_job(
        self,
        job: dict[str, Any],
        strategy: LoadStrategy = LoadStrategy.INCREMENTAL,
        incremental_column: str | None = None,
        incremental_value: str | None = None,
    ) -> JobResult:
        name = job["job_name"]
        loader = Loader(self.wh, self.target_schema, job["target_table"])
        self.control.start_job(name)
        try:
            parameters = None
            effective = strategy
            keys = [
                k.strip()
                for k in str(job.get("p_key") or "").split(",")
                if k.strip()
            ]
            # watermark pushdown is only safe when the load can MERGE:
            # without merge keys the load is a full replace, and
            # replacing the table with a delta-only fetch would destroy
            # history — so keyless jobs always fetch everything
            if strategy is LoadStrategy.INCREMENTAL and keys:
                inc_col = incremental_column or job.get("incremental_column")
                if incremental_value is not None and not inc_col:
                    # a watermark override for a job with NO incremental
                    # column would silently turn its full fetch into a
                    # delta keyed only by the source's param column —
                    # ignore it loudly instead
                    _LOG.warning(
                        "--incremental-value %r ignored for job %s: no "
                        "incremental column defined",
                        incremental_value,
                        name,
                    )
                if incremental_value is not None and inc_col:
                    # explicit initial-watermark override (reference
                    # --incremental-value, arguments.py:26-33: "load
                    # data of last year/month for developing purpose")
                    # — drives a delta fetch from the SUPPLIED value,
                    # including on a first sync where the MAX probe
                    # would otherwise force a full refresh
                    parameters = incremental_value
                else:
                    last = loader.get_max_value(inc_col) if inc_col else None
                    if last is None:
                        # first-sync fallback (reference __main__.py:105-112)
                        effective = LoadStrategy.FULL_REFRESH
                    else:
                        parameters = str(last)
            df = fetch_as_df(
                self.spark, self.source, int(job["query_id"]), parameters
            )
            if df is None:
                # empty-batch short-circuit (dune_to_pg_worker.py:87-89)
                self.control.end_job(name)
                return JobResult(name, True, 0)
            spec = self.specs.get(name)
            if spec is not None:
                df = spec.apply(df)
            df = with_audit_column(df)
            if effective is LoadStrategy.FULL_REFRESH or not keys:
                loader.load_full_refresh(df)
            else:
                loader.load_incremental(df, keys)
            n = loader.get_record_count()
            self.control.end_job(name)
            return JobResult(name, True, n)
        except Exception as e:  # noqa: BLE001 — continue-on-error per table
            self.control.fail_job(name, f"{e}\n{traceback.format_exc()}")
            return JobResult(name, False, 0, str(e))

    def run(
        self,
        select: list[str] | None = None,
        strategy: LoadStrategy = LoadStrategy.INCREMENTAL,
        incremental_column: str | None = None,
        incremental_value: str | None = None,
    ) -> list[JobResult]:
        """Sync every active job (reference run_pipeline,
        __main__.py:132-184); a failed table logs and the loop
        continues (``:173-177``).

        The whole run holds the warehouse's advisory lock: the control
        table and targets are mutated read-modify-overwrite, so two
        concurrent pipelines over one warehouse would corrupt each
        other (the reference leaned on Postgres transactions here).
        """
        with self.wh.lock("pipeline"):
            results = []
            for job in self.control.tables_to_sync(select):
                results.append(
                    self.run_job(
                        job, strategy, incremental_column, incremental_value
                    )
                )
            self._maybe_refresh_models(results)
            return results

    def _maybe_refresh_models(self, results: list[JobResult]) -> None:
        """Consult every attached :class:`ModelRefreshSpec` after the
        sync loop (still under the pipeline lock — a publish is a
        warehouse mutation).  A model-refresh failure is recorded like
        a job failure, never fatal to the run: the synced tables are
        good and the previous generation keeps serving."""
        self.last_refresh = {}
        synced_ok = {r.job_name for r in results if r.ok and r.rows_loaded > 0}
        for spec in self.model_refresh:
            if spec.watch_jobs is not None and not (
                set(spec.watch_jobs) & synced_ok
            ):
                continue
            try:
                docs = spec.docs_for(self.spark, self.wh)
                decision = spec.registry.refresh_if_needed(
                    spec.name,
                    docs,
                    lambda docs=docs, spec=spec: spec.build_parts(docs),
                    policy=spec.policy,
                    keep_back=spec.keep_back,
                )
                self.last_refresh[spec.name] = decision
                _LOG.info(
                    "model %s: refresh=%s (%s)",
                    spec.name,
                    decision.refresh,
                    decision.reason,
                )
            except Exception as e:  # noqa: BLE001 — continue-on-error
                self.last_refresh[spec.name] = e
                _LOG.warning("model %s refresh failed: %s", spec.name, e)
