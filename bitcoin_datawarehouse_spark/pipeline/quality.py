"""Single-pass data-quality checks (the load-time gate).

Production pipelines refuse bad batches BEFORE they reach the
warehouse (null keys, out-of-range amounts, empty loads).  The naive
implementation runs one action per check; this one rides
``DataFrame.observe`` — every metric is computed as an aggregate
piggy-backed on the SAME job that writes the data, so a batch with
ten checks still makes exactly one pass over the rows.  (The same
design as open-source data-quality-on-Spark libraries, e.g. the
published Deequ architecture.)

Usage::

    checked = QualityGate([
        expect_no_nulls("tx_id"),
        expect_min_rows(1),
        expect_between("amount", 0, 21_000_000),
    ]).attach(df)
    loader.load_incremental(checked.df, keys)   # one pass
    checked.verify()                            # raises QualityError
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from bitcoin_datawarehouse_spark.functions.localframe import local_rows_df


class QualityError(RuntimeError):
    """A batch violated its expectations; the message lists them."""


@dataclass
class Expectation:
    name: str
    metric: Column           # aggregate expression computed in-pass
    predicate: Callable[[Any], bool]
    describe: str


def expect_min_rows(n: int) -> Expectation:
    return Expectation(
        name=f"min_rows_{n}",
        metric=F.count(F.lit(1)).alias(f"min_rows_{n}"),
        predicate=lambda v: (v or 0) >= n,
        describe=f"at least {n} rows",
    )


def expect_no_nulls(col: str) -> Expectation:
    return Expectation(
        name=f"no_nulls_{col}",
        metric=F.sum(
            F.when(F.col(col).isNull(), 1).otherwise(0)
        ).alias(f"no_nulls_{col}"),
        predicate=lambda v: (v or 0) == 0,
        describe=f"no NULL {col}",
    )


def expect_between(col: str, lo: float, hi: float) -> Expectation:
    return Expectation(
        name=f"between_{col}",
        metric=F.sum(
            F.when(
                F.col(col).isNotNull()
                & (~F.col(col).between(F.lit(lo), F.lit(hi))),
                1,
            ).otherwise(0)
        ).alias(f"between_{col}"),
        predicate=lambda v: (v or 0) == 0,
        describe=f"{col} in [{lo}, {hi}]",
    )


def expect_mostly_unique(col: str, max_dup_ratio: float = 0.03) -> Expectation:
    """Approximate key-uniqueness: (count - approx_distinct)/count.

    ``observe`` metrics cannot use DISTINCT aggregates (they must be
    mergeable partial aggregates), so uniqueness rides HyperLogLog —
    the ratio threshold must stay above the sketch's ~1-2% error.
    This catches bulk duplication (a re-sent batch, a bad join);
    EXACT per-key uniqueness is enforced downstream anyway by the
    merge's key-dedupe."""
    return Expectation(
        name=f"mostly_unique_{col}",
        metric=(
            (
                F.count(F.col(col)).cast("double")
                - F.approx_count_distinct(col, rsd=0.01).cast("double")
            )
            / F.greatest(F.count(F.col(col)), F.lit(1)).cast("double")
        ).alias(f"mostly_unique_{col}"),
        predicate=lambda v: (v or 0.0) <= max_dup_ratio,
        describe=f"{col} mostly unique (dup ratio ≤ {max_dup_ratio})",
    )


@dataclass
class CheckedFrame:
    df: DataFrame
    observation: Observation
    expectations: list[Expectation]

    def verify(self, timeout_s: float = 60.0) -> dict[str, Any]:
        """Read the observed metrics (available once an action ran on
        ``df``) and raise :class:`QualityError` listing every violated
        expectation.  Returns the metric values when all pass.

        ``Observation.get`` blocks until the observed plan finishes
        its first action; if the caller verifies before any action ran
        (or the load raised before executing this plan), that wait
        would hang the pipeline forever — so the read is bounded and
        times out into a QualityError naming the real problem.
        """
        import threading

        # the blocking read runs in a DAEMON thread: a ThreadPoolExecutor
        # here would deadlock on timeout (its shutdown — and the
        # interpreter's atexit hook — join a worker stuck forever in
        # Observation.get), turning the timeout guard into the very hang
        # it exists to prevent
        result: dict[str, Any] = {}

        def _read() -> None:
            try:
                result["got"] = self.observation.get
            except Exception as e:  # noqa: BLE001 — re-raised on the caller
                result["err"] = e

        t = threading.Thread(target=_read, daemon=True)
        t.start()
        t.join(timeout_s)
        if t.is_alive():
            raise QualityError(
                f"no action has executed the observed plan within "
                f"{timeout_s}s — run the load before verify()"
            )
        if "err" in result:
            raise result["err"]
        got = result["got"]
        failures = [
            f"{e.describe} (metric {e.name}={got[e.name]!r})"
            for e in self.expectations
            if not e.predicate(got[e.name])
        ]
        if failures:
            raise QualityError("; ".join(failures))
        return dict(got)


class QualityGate:
    def __init__(self, expectations: list[Expectation]) -> None:
        if not expectations:
            raise ValueError("at least one expectation required")
        self.expectations = expectations

    def attach(self, df: DataFrame) -> CheckedFrame:
        obs = Observation()
        observed = df.observe(obs, *[e.metric for e in self.expectations])
        return CheckedFrame(observed, obs, self.expectations)


# -- metric history + anomaly detection (the Deequ-style loop) -------------
#
# A per-batch gate catches ABSOLUTE violations (null key, negative
# amount); the failure mode it cannot see is a batch that is
# internally valid but WRONG AGAINST HISTORY — a half-sized load, a
# null-ratio that doubled, a mean that jumped an order of magnitude.
# Production systems keep the per-batch metrics and flag deviations
# from the trailing distribution (the published Deequ
# anomaly-detection architecture).  The detector here is median ± k·MAD
# rather than mean ± k·σ: one prior bad batch inflates a standard
# deviation enough to mask the next bad batch, while the median
# absolute deviation barely moves (breakdown point 50%).


@dataclass(frozen=True)
class Anomaly:
    metric: str
    value: float
    median: float
    mad: float
    threshold: float

    def __str__(self) -> str:  # pragma: no cover - formatting
        return (
            f"{self.metric}={self.value} outside median {self.median} "
            f"± {self.threshold} (MAD {self.mad})"
        )


class MetricHistory:
    """Persisted per-batch quality-metric ledger for one warehouse.

    ``record`` appends the verified metric dict of a batch (one row
    per metric — the table stays ledger-sized: batches × metrics);
    ``check`` compares a new batch's metrics against the trailing
    ``window`` batches with the median ± k·MAD rule.  The history
    read is two aggregates over a bounded frame (the window filter
    keeps the most recent ``window`` DISTINCT batch_seq values — rank,
    not value, so sparse/jumpy caller-supplied seqs such as
    epoch-derived ids neither shrink the baseline below
    ``min_history`` nor stretch it past the intended window — r11
    ADVICE), never a driver-side loop over raw rows.
    """

    def __init__(self, wh, job: str, schema: str = "etl",
                 table: str = "quality_metrics") -> None:
        self.wh = wh
        self.job = job
        self.schema = schema
        self.table = table

    def _exists(self) -> bool:
        return self.wh.table_exists(self.schema, self.table)

    def last_seq(self) -> int:
        if not self._exists():
            return 0
        df = self.wh.read(self.schema, self.table)
        row = df.filter(F.col("job") == self.job).agg(
            F.max("batch_seq").alias("mx")
        ).first()
        return int(row["mx"] or 0)

    def record(self, metrics: dict[str, Any], batch_seq: int | None = None) -> int:
        """Append one batch's metrics; returns its sequence number.

        The derived-seq path (``batch_seq=None``) is a
        read-modify-write over the shared ledger (``last_seq()+1``
        then append), so it runs under the warehouse lock — two
        concurrent jobs recording for the same job name would
        otherwise assign the SAME seq and double-weight those batches
        in the median/MAD baseline (r11 ADVICE).  Caller-supplied
        seqs skip the lock: uniqueness is then the caller's contract.
        """
        if batch_seq is None:
            with self.wh.lock(f"metric_history_{self.schema}_{self.table}"):
                return self._record_at(self.last_seq() + 1, metrics)
        return self._record_at(batch_seq, metrics)

    def _record_at(self, seq: int, metrics: dict[str, Any]) -> int:
        sess = self.wh.spark
        rows = [
            (self.job, int(seq), str(k), float(v))
            for k, v in metrics.items()
            if v is not None
        ]
        df = local_rows_df(sess, 
            rows, "job string, batch_seq long, metric string, value double"
        )
        if self._exists():
            self.wh.append(df, self.schema, self.table)
        else:
            self.wh.write_atomic(df, self.schema, self.table, coalesce=1)
        return seq

    def check(
        self,
        metrics: dict[str, Any],
        k: float = 3.0,
        window: int = 100,
        floor: float = 0.0,
        min_history: int = 4,
    ) -> list[Anomaly]:
        """Flag metrics outside ``median ± max(k·MAD, floor)`` of the
        trailing ``window`` batches.  Returns [] while fewer than
        ``min_history`` batches exist (a two-batch 'history' flags
        everything).  ``floor`` keeps a zero-MAD history (constant
        metric) from flagging benign jitter."""
        if not self._exists():
            return []
        mine = self.wh.read(self.schema, self.table).filter(
            F.col("job") == self.job
        )
        # trailing window by RANK over distinct batch_seq, not by seq
        # VALUE (seqs are caller-supplied and may be sparse — e.g.
        # epoch-derived; a value window would then cover the wrong
        # number of batches).  The floor probe is one distributed
        # TakeOrdered over the batches-sized distinct-seq frame — not
        # a third full-table read through last_seq().
        floor_row = (
            mine.select("batch_seq")
            .distinct()
            .orderBy(F.desc("batch_seq"))
            .limit(window)
            .agg(F.min("batch_seq").alias("floor_seq"))
            .first()
        )
        if floor_row["floor_seq"] is None:
            return []
        hist = mine.filter(F.col("batch_seq") >= floor_row["floor_seq"])
        med = hist.groupBy("metric").agg(
            F.median("value").alias("med"),
            F.count("value").alias("n"),
        )
        mad = (
            hist.join(F.broadcast(med), "metric")
            .groupBy("metric")
            .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
        )
        stats = {
            r["metric"]: r
            for r in med.join(mad, "metric").collect()
        }
        out: list[Anomaly] = []
        for name, value in metrics.items():
            if value is None or name not in stats:
                continue
            s = stats[name]
            if s["n"] < min_history:
                continue
            thr = max(k * s["mad"], floor)
            if abs(float(value) - s["med"]) > thr:
                out.append(
                    Anomaly(name, float(value), s["med"], s["mad"], thr)
                )
        return out
