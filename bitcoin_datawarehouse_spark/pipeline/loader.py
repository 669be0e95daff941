"""Load operators: full refresh, incremental merge, delete, probes.

Reference parity (SURVEY.md §2.2): this is the Spark rebuild of
``PgLoader`` (reference ``data_integration/utils/worker/pg_loader.py``):

* full refresh   — truncate+reload (``:126-163``) → atomic overwrite;
* incremental    — staged upsert ``INSERT … ON CONFLICT DO UPDATE``
  (``:165-270``) → dropDuplicates + left-anti join + unionByName;
* delete         — ``DELETE … WHERE`` (``:272-294``) → filter-rewrite;
* MAX probe      — watermark read (``:296-318``);
* COUNT probe    — post-load verification (``:320-339``).

Merge semantics preserved exactly: new row wins on key conflict and
ALL non-key columns are replaced (``pg_loader.py:246-259``).  Two
deliberate hardenings over the reference (SURVEY §2.7/§2.8): a batch
with duplicate keys would make Postgres ``ON CONFLICT`` error — here
intra-batch duplicates are resolved deterministically (last by
``order_col`` if given, else an arbitrary-but-stable first); and a
batch with new/missing columns would fail the reference's INSERT —
here ``unionByName(allowMissingColumns=True)`` fills either side's
missing columns with null (schema drift tolerated, documented).

Scale notes: the merge reads the target once and writes it once —
one shuffle on the merge keys for the anti-join (broadcast when the
batch is small, which is the common incremental case — batches are
"rows since last watermark").  No driver-side row handling anywhere.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from bitcoin_datawarehouse_spark.functions.cachereg import cache_tracked
from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse

#: broadcast the incremental batch into the anti-join below this many
#: rows — incremental batches are usually tiny relative to the target
BROADCAST_BATCH_MAX_ROWS = 2_000_000


class Loader:
    """Load strategies for one ``schema.table`` target."""

    def __init__(self, wh: Warehouse, schema: str, table: str) -> None:
        self.wh = wh
        self.schema = schema
        self.table = table

    # -- strategies --------------------------------------------------------
    def load_full_refresh(self, df: DataFrame) -> None:
        """Atomic replace (reference truncate+insert, pg_loader.py:126-163)."""
        self.wh.write_atomic(df, self.schema, self.table)

    def load_incremental(
        self,
        df: DataFrame,
        unique_keys: list[str] | None,
        order_col: str | None = None,
        strict_schema: bool = False,
    ) -> None:
        """Merge ``df`` into the target on ``unique_keys``.

        Reference dispatch preserved (pg_loader.py:165-217): no keys →
        full refresh; target missing → create+insert; else upsert.

        ``strict_schema=True`` refuses a batch whose columns differ
        from the target (the reference's INSERT would have failed —
        a production control for catching upstream contract breaks);
        the default tolerates drift by null-filling either side.
        """
        if not unique_keys:
            self.load_full_refresh(df)
            return
        # cache the deduped batch: it is read three times below (count
        # probe, anti-join build side, union) and its upstream plan may
        # be arbitrarily expensive — without the cache every merge
        # recomputes it per consumer
        batch = cache_tracked(_dedupe_batch(df, unique_keys, order_col))
        try:
            if not self.wh.table_exists(self.schema, self.table):
                self.wh.write_atomic(batch, self.schema, self.table)
                return
            old = self.wh.read(self.schema, self.table)
            if strict_schema and set(batch.columns) != set(old.columns):
                raise ValueError(
                    f"{self.schema}.{self.table}: batch schema drift "
                    f"(batch-only: {sorted(set(batch.columns) - set(old.columns))}, "
                    f"target-only: {sorted(set(old.columns) - set(batch.columns))})"
                )
            if batch.count() <= BROADCAST_BATCH_MAX_ROWS:
                keep = old.join(F.broadcast(batch), unique_keys, "left_anti")
            else:
                keep = old.join(batch, unique_keys, "left_anti")
            merged = keep.unionByName(batch, allowMissingColumns=True)
            self.wh.write_atomic(merged, self.schema, self.table)
        finally:
            batch.unpersist()

    def load_incremental_partitioned(
        self,
        df: DataFrame,
        unique_keys: list[str],
        partition_col: str,
        order_col: str | None = None,
        max_records_per_file: int | None = None,
    ) -> None:
        """Partition-scoped merge: upsert ``df`` into a Hive-partitioned
        target, rewriting ONLY the partitions the batch touches.

        This is the merge that survives 100 TB: ``load_incremental``
        reads and rewrites the whole table per batch, which is fine
        for dimension-sized tables and absurd for a date-partitioned
        fact table — a daily batch should cost O(touched days), not
        O(history).  Mechanics:

        1. the batch's distinct partition values prune the target read
           (PartitionFilters — only touched directories are scanned);
        2. the usual key-dedupe + anti-join + union on that slice;
        3. a partitionBy write under dynamic partition-overwrite mode
           replaces exactly the touched partition directories, leaving
           every other partition's files physically untouched.

        The merge key set should include (or functionally determine)
        the partition column — a row whose partition value CHANGES
        between loads would otherwise survive in its old partition.
        Schema drift caveat: because only touched partitions rewrite,
        a batch with NEW columns leaves old partitions on the old
        schema — plain parquet reads then resolve to an arbitrary
        footer; read such tables with ``mergeSchema`` or keep
        partitioned facts on ``strict_schema`` discipline.
        """
        batch = cache_tracked(_dedupe_batch(df, unique_keys, order_col))
        try:
            path = str(self.wh.table_path(self.schema, self.table))
            if not self.wh.table_exists_partitioned(self.schema, self.table):
                self.wh.create_schema(self.schema)
                _write_day_partitioned(
                    batch, partition_col, path, max_records_per_file
                )
                return
            touched = [
                r[0] for r in batch.select(partition_col).distinct().collect()
            ]
            # read ONLY the touched partition directories: a Spark
            # read of the table root builds a file index over EVERY
            # partition before pruning.  On the local-NVMe probe that
            # listing was a ~2 s constant (tools/probe_loader_scale.py
            # — NOT the dominant term there; a probe artifact was),
            # but at 100k partitions it is the difference between
            # seconds and minutes, so the pruned read stays.  The dir
            # lookup goes through a NAMES-ONLY scandir + Hive
            # unescape, never `tp / f"{col}={v}"` string building —
            # Spark %XX-escapes special chars in partition dir names
            # (a ':' in a timestamp day, a literal '%'), and a raw-
            # value existence probe would silently treat such an
            # EXISTING partition as new, dropping its history in the
            # dynamic overwrite (review-caught).  basePath keeps the
            # partition column in the schema; genuinely-new partition
            # values have no dir yet and merge as pure inserts.
            tp = self.wh.table_path(self.schema, self.table)
            spark = batch.sparkSession
            by_value = _partition_dirs(tp, partition_col)
            existing = [
                by_value[_part_key(v)]
                for v in touched
                if _part_key(v) in by_value
            ]
            if existing:
                old_slice = spark.read.option(
                    "basePath", str(tp)
                ).parquet(*existing)
            else:
                old_slice = batch.limit(0)
            # same broadcast guard as load_incremental: a backfill-sized
            # batch must not be force-broadcast into the anti-join
            if batch.count() <= BROADCAST_BATCH_MAX_ROWS:
                keep = old_slice.join(
                    F.broadcast(batch), unique_keys, "left_anti"
                )
            else:
                keep = old_slice.join(batch, unique_keys, "left_anti")
            merged = keep.unionByName(batch, allowMissingColumns=True)
            with dynamic_partition_overwrite(merged.sparkSession):
                _write_day_partitioned(
                    merged, partition_col, path, max_records_per_file
                )
        finally:
            batch.unpersist()

    def load_scd2(
        self,
        df: DataFrame,
        unique_keys: list[str],
        batch_ts: str,
        compare_cols: list[str] | None = None,
        order_col: str | None = None,
    ) -> None:
        """Slowly-changing-dimension Type-2 merge: keep FULL history.

        The target carries the batch's business columns plus
        ``valid_from``/``valid_to`` timestamps and ``is_current`` —
        the standard Kimball SCD2 layout.  Per load:

        * a key whose ``compare_cols`` (default: every non-key
          column) CHANGED gets its current version closed
          (``valid_to = batch_ts``, ``is_current = false``) and a new
          open version inserted;
        * a NEW key gets its first open version;
        * an unchanged key is untouched — re-delivering an identical
          batch is a NO-OP (crash/replay-safe by value, not by
          bookkeeping);
        * closed history rows always pass through unmodified.

        ``batch_ts`` is an explicit timestamp string, never NOW():
        versions must be reproducible under replay, and loads must
        arrive in nondecreasing ``batch_ts`` order (enforced — an
        out-of-order batch would silently interleave history).

        Scale shape: one key-partitioned join of the CURRENT slice
        against the batch (batch broadcast when small) decides
        changed/new; history rows are a pass-through scan-and-rewrite
        — the same read-once/write-once contract as
        :meth:`load_incremental`.  At fact scale, partition the
        target by a date bucket of ``valid_from`` and this becomes
        partition-scoped exactly like
        :meth:`load_incremental_partitioned`.
        """
        ts = F.lit(batch_ts).cast("timestamp")
        open_to = F.lit(None).cast("timestamp")
        batch = cache_tracked(_dedupe_batch(df, unique_keys, order_col))
        try:
            stamped = (
                batch.withColumn("valid_from", ts)
                .withColumn("valid_to", open_to)
                .withColumn("is_current", F.lit(True))
            )
            if not self.wh.table_exists(self.schema, self.table):
                self.wh.write_atomic(stamped, self.schema, self.table)
                return
            # the target feeds FIVE subtrees of this load (max_from
            # probe + hist/closed/kept_cur/new_keys legs of the one
            # write action) — cache it or each re-scans the parquet
            # (CLAUDE.md shared-subgraph rule; review-caught: the
            # docstring's read-once contract was not what the plan did)
            old = cache_tracked(self.wh.read(self.schema, self.table))
            old.count()  # eager fill — concurrent subtrees of one action
            cur = old.filter(F.col("is_current"))
            hist = old.filter(~F.col("is_current"))
            max_from = cur.agg(F.max("valid_from")).first()[0]
            import datetime as _dt

            if max_from is not None and _dt.datetime.fromisoformat(
                batch_ts
            ) < max_from.replace(tzinfo=None):
                raise ValueError(
                    f"{self.schema}.{self.table}: SCD2 batch_ts "
                    f"{batch_ts!r} precedes current valid_from "
                    f"{max_from} — loads must be time-ordered"
                )
            cmp_cols = compare_cols or [
                c for c in batch.columns if c not in unique_keys
            ]
            small = batch.count() <= BROADCAST_BATCH_MAX_ROWS
            b = F.broadcast(batch) if small else batch
            # null-safe comparison: a NULL→value (or value→NULL) change
            # must open a version, so <=> not =
            diff = ~_all_equal(cmp_cols)
            changed_keys = cache_tracked(
                cur.alias("t")
                .join(b.alias("b"), unique_keys)
                .filter(diff)
                .select(*unique_keys)
            )
            changed_keys.count()  # eager: three consumers below
            ck = F.broadcast(changed_keys) if small else changed_keys
            closed = (
                cur.join(ck, unique_keys, "leftsemi")
                .withColumn("valid_to", ts)
                .withColumn("is_current", F.lit(False))
            )
            kept_cur = cur.join(ck, unique_keys, "left_anti")
            new_keys = batch.select(*unique_keys).join(
                cur.select(*unique_keys), unique_keys, "left_anti"
            )
            insert_keys = changed_keys.unionByName(new_keys)
            ik = F.broadcast(insert_keys) if small else insert_keys
            opened = stamped.join(ik, unique_keys, "leftsemi")
            merged = (
                hist.unionByName(closed)
                .unionByName(kept_cur)
                .unionByName(opened)
            )
            self.wh.write_atomic(merged, self.schema, self.table)
            changed_keys.unpersist()
            old.unpersist()
        finally:
            batch.unpersist()

    def current_of(self) -> DataFrame:
        """The dimension AS OF now — the ``is_current`` slice of an
        SCD2 target (the frame queries join against)."""
        return self.wh.read(self.schema, self.table).filter(
            F.col("is_current")
        )

    def as_of(self, ts: str) -> DataFrame:
        """Point-in-time slice of an SCD2 target: the version valid at
        ``ts`` (``valid_from <= ts < valid_to``, open-ended current
        rows included) — time travel by predicate, no snapshots."""
        t = F.lit(ts).cast("timestamp")
        return self.wh.read(self.schema, self.table).filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )

    def delete_by_condition(self, condition: str | Column) -> int:
        """DELETE WHERE (reference pg_loader.py:272-294) as a
        filter-rewrite; returns rows deleted."""
        old = self.wh.read(self.schema, self.table)
        pred = F.expr(condition) if isinstance(condition, str) else condition
        keep = old.filter(~pred)
        n_before = old.count()
        n_after = keep.count()
        self.wh.write_atomic(keep, self.schema, self.table)
        return n_before - n_after

    # -- probes ------------------------------------------------------------
    def get_max_value(self, column: str):
        """Watermark read (reference pg_loader.py:296-318); None when
        the table does not exist — triggers first-sync full refresh
        (reference __main__.py:105-112)."""
        if not self.wh.table_exists(self.schema, self.table):
            return None
        df = self.wh.read(self.schema, self.table)
        if column not in df.columns:
            # the incremental column names a TARGET column; if a spec
            # change renamed/dropped it, degrade to the first-sync
            # path (full refresh) instead of failing the job
            return None
        return df.agg(F.max(column).alias("mx")).first()["mx"]

    def get_record_count(self) -> int:
        """COUNT(*) probe (reference pg_loader.py:320-339); 0 when absent."""
        if not self.wh.table_exists(self.schema, self.table):
            return 0
        return self.wh.read(self.schema, self.table).count()


#: Hive's sentinel directory for NULL partition values
_HIVE_NULL_PART = "__HIVE_DEFAULT_PARTITION__"


@contextmanager
def dynamic_partition_overwrite(spark):
    """Scoped ``partitionOverwriteMode=dynamic`` (save/set/restore).

    One shared implementation for every partition-scoped rewrite site
    (loader merge, matview bucket/day maintenance, z-table compaction)
    so the conf juggling cannot drift between copies."""
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _part_key(value) -> str:
    """The comparable string form of a partition value (Spark writes
    the value's string form, Hive-escaped, into the dir name; NULL
    becomes the Hive sentinel)."""
    return _HIVE_NULL_PART if value is None else str(value)


def _partition_dirs(table_path, partition_col: str) -> dict[str, str]:
    """{unescaped partition value -> partition dir path} from a
    NAMES-ONLY scandir of the table root (no per-file stat, no Spark
    file index).  Dir names unescape with urllib's unquote — Hive
    escaping is exactly %XX on the reserved character set."""
    import os
    from urllib.parse import unquote

    prefix = f"{partition_col}="
    out: dict[str, str] = {}
    if not table_path.exists():
        return out
    for entry in os.scandir(table_path):
        if entry.is_dir() and entry.name.startswith(prefix):
            out[unquote(entry.name[len(prefix):])] = entry.path
    return out


def _write_day_partitioned(
    df: DataFrame,
    partition_col: str,
    path: str,
    max_records_per_file: int | None = None,
) -> None:
    """PartitionBy write CLUSTERED on the partition column first.

    Without the repartition every upstream task holds rows of ~every
    partition value and opens one file per (task, value): a 2 499-day
    fact seeded through 32 tasks wrote ~80 000 files (measured —
    tools/probe_loader_scale.py; 169 s at 600 k rows, dominated by
    file creation, and every later reader pays the open/footer cost
    again).  Hash-clustering by the partition value writes ONE file
    per touched partition per non-empty shuffle partition — 2 499
    files for the same seed, 21× faster (8 s).

    ``max_records_per_file`` is the hot-partition lever: one cluster
    key means ONE task writes a whole partition, and at 100 TB a hot
    day can exceed a single comfortable file.  The writer option
    rolls a task's output to a new file every N records — no extra
    shuffle, and a salted repartition would be undone by AQE
    coalescing anyway (measured: the salted variant still wrote one
    file per day at fixture scale).
    """
    writer = df.repartition(F.col(partition_col)).write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(partition_col).parquet(path)


def _all_equal(cols: list[str]) -> Column:
    """AND-fold of null-safe equality between the ``t`` (target) and
    ``b`` (batch) sides of an aliased join — SCD2's change detector."""
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(f"t.{c}").eqNullSafe(F.col(f"b.{c}"))
    return cond


def _dedupe_batch(
    df: DataFrame, keys: list[str], order_col: str | None
) -> DataFrame:
    """Resolve intra-batch key duplicates before the merge.

    With ``order_col``: keep the row with the greatest value (last
    write wins, ties broken arbitrarily-but-deterministically by the
    window sort).  Without: ``dropDuplicates`` keeps an arbitrary row —
    matching the reference's implicit assumption that sources are
    key-unique (SURVEY §2.7) while never erroring.
    """
    if order_col is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
