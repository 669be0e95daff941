"""Incrementally-maintained aggregate tables (materialized views).

A warehouse serving rollups over a 100-TB fact table cannot
re-aggregate the world on every ingest batch.  A
:class:`MaterializedAggView` persists the GROUP BY state and maintains
it per batch with work proportional to the CHANGE, not the base:

* **append-only batches are self-maintainable** for
  sum/count/min/max/avg: ``state' = combine(state, aggregate(batch))``
  — the base table is never re-read, and only the groups present in
  the batch are rewritten (classic incremental-view-maintenance
  algebra: the aggregate's commutative monoid absorbs the delta);
* **updates and deletes break self-maintainability** (min/max cannot
  be retracted from a running extreme, sums would need per-row
  retraction), so the view falls back to **affected-group recompute**:
  re-aggregate ONLY the groups present in the change set from the
  post-change base and splice them into the state.  Recompute work is
  one pass over the base with a semi-join filter on the touched
  groups — with the base partitioned/bucketed by a group-key prefix
  that pass partition-prunes to exactly the touched slices, and with
  parquet min/max stats the group-key filter skips row groups even
  unpartitioned.

State columns are internal: exact ``DECIMAL(38,10)`` sums
(order-independent — see functions/numeric.py), BIGINT counts, native
min/max, plus the group row count (so a group emptied by a
delete/update migration is dropped, not left as a zombie zero row).
The *read surface* derives the engine-neutral exposed columns from
state: 2-dp DOUBLE sums, 6-dp string-routed averages — decimal never
escapes.

FLAT state swaps ride :meth:`Warehouse.write_atomic`, so readers see
old-state-or-new-state, never a torn view, and snapshots/rollback work
on the view like any other table.  The PARTITIONED layouts
(``state_buckets`` / ``state_partition_key``) trade that for
partition-local rewrites — the same contract as
``Loader.load_incremental_partitioned``: a reader concurrent with
maintenance can see bucket A post-batch and bucket B pre-batch, and
there is no whole-view snapshot to roll back to.  Run partitioned
maintenance under ``Warehouse.lock`` when readers need a consistent
cross-partition view, or keep the flat layout.

Reference parity: the reference maintains no aggregates in-process —
its rollups live in opaque Dune query_ids (etl_job.csv:2-6) re-run
from scratch per sync.  This module is the warehouse-side equivalent
a Spark-first engine needs at scale.

The same algebra is exercised read-only (oracle-gated vs DuckDB) in
operators/matview_semantics.py; the stateful loop here is pinned by
tests/test_matview.py.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.cachereg import cache_tracked
from bitcoin_datawarehouse_spark.functions.numeric import DEC, str_round6

from .catalog import Warehouse
from .loader import (
    BROADCAST_BATCH_MAX_ROWS,
    _part_key,
    _partition_dirs,
    _write_day_partitioned,
    dynamic_partition_overwrite,
)

_NROWS = "__nrows"
_BUCKET = "__bucket"


@dataclass(frozen=True)
class Measure:
    """One aggregate column of the view.

    ``kind`` ∈ {'sum', 'count', 'min', 'max', 'avg'}; ``expr`` is a
    SQL expression over base-table rows (``None`` means ``COUNT(*)``
    for kind='count').  'avg' maintains a sum+count pair internally
    and exposes the engine-neutral 6-dp quotient.
    """

    name: str
    kind: str
    expr: str | None = None

    def __post_init__(self) -> None:
        if self.kind not in ("sum", "count", "min", "max", "avg"):
            raise ValueError(f"unknown measure kind {self.kind!r}")
        if self.expr is None and self.kind != "count":
            raise ValueError(f"measure {self.name!r} ({self.kind}) needs expr")


def _state_cols(m: Measure) -> list[str]:
    if m.kind == "sum":
        return [f"__{m.name}_sum"]
    if m.kind == "count":
        return [f"__{m.name}_cnt"]
    if m.kind == "avg":
        return [f"__{m.name}_sum", f"__{m.name}_cnt"]
    return [f"__{m.name}_{m.kind}"]


def _agg_exprs(measures: list[Measure]) -> list[Column]:
    """Aggregates producing the INTERNAL state columns for one slice."""
    out: list[Column] = [F.count(F.lit(1)).alias(_NROWS)]
    for m in measures:
        if m.kind in ("sum", "avg"):
            out.append(
                F.sum(F.expr(m.expr).cast(DEC)).alias(f"__{m.name}_sum")
            )
        if m.kind in ("count", "avg"):
            src = F.expr(m.expr) if m.expr is not None else F.lit(1)
            out.append(F.count(src).alias(f"__{m.name}_cnt"))
        if m.kind in ("min", "max"):
            fn = F.min if m.kind == "min" else F.max
            out.append(fn(F.expr(m.expr)).alias(f"__{m.name}_{m.kind}"))
    return out


def _combine_col(old: Column, new: Column, how: str) -> Column:
    """Merge one state column across two disjoint row slices.

    Null discipline mirrors the direct aggregate: SUM/MIN/MAX over an
    all-null slice is NULL, so a NULL side is *absent*, not zero —
    both-null stays NULL, otherwise nulls drop out (least/greatest
    skip nulls; sums coalesce the missing side to 0 only when the
    other side is present).
    """
    if how in ("sum", "cnt"):
        # Spark's decimal-add promotion turns (38,10)+(38,10) into
        # (38,9); cast back so the STATE schema is one fixed type —
        # a bucketed layout mixes fresh-aggregate and combined files
        # in one table, and parquet refuses a scale mismatch on read.
        # The cast is exact for any aggregate below 1e28.
        typ = DEC if how == "sum" else "long"
        zero = F.lit(0).cast(typ)
        return (
            F.when(old.isNull() & new.isNull(), F.lit(None))
            .otherwise(F.coalesce(old, zero) + F.coalesce(new, zero))
            .cast(typ)
        )
    fn = F.least if how == "min" else F.greatest
    return fn(old, new)


def combine_states(
    old: DataFrame, delta: DataFrame, keys: list[str], measures: list[Measure]
) -> DataFrame:
    """Full-outer merge of two internal-state frames over the group keys.

    Both inputs aggregate DISJOINT row slices, so every state column
    merges with its monoid: sums/counts add, min/max take the extreme.
    The join shuffles state-sized data on the group keys — never the
    base rows.
    """
    o = old.alias("o")
    d = delta.alias("d")
    joined = o.join(d, keys, "full_outer")
    cols: list[Column] = [F.col(k) for k in keys]
    cols.append(
        _combine_col(F.col(f"o.{_NROWS}"), F.col(f"d.{_NROWS}"), "cnt").alias(
            _NROWS
        )
    )
    for m in measures:
        for sc in _state_cols(m):
            how = (
                "sum"
                if sc.endswith("_sum")
                else "cnt"
                if sc.endswith("_cnt")
                else m.kind
            )
            cols.append(
                _combine_col(F.col(f"o.{sc}"), F.col(f"d.{sc}"), how).alias(sc)
            )
    return joined.select(*cols)


def exposed_cols(keys: list[str], measures: list[Measure]) -> list[Column]:
    """The engine-neutral read surface derived from internal state.

    Decimal sums leave as ``CAST(ROUND(dec, 2) AS DOUBLE)``; averages
    as the string-routed 6-dp quotient (functions/numeric.py — the
    only representations whose bits match DuckDB's).
    """
    cols: list[Column] = [F.col(k) for k in keys]
    for m in measures:
        if m.kind == "sum":
            cols.append(
                F.round(F.col(f"__{m.name}_sum"), 2)
                .cast("double")
                .alias(m.name)
            )
        elif m.kind == "count":
            cols.append(F.col(f"__{m.name}_cnt").alias(m.name))
        elif m.kind == "avg":
            cols.append(
                str_round6(
                    F.col(f"__{m.name}_sum").cast("string").cast("double")
                    / F.col(f"__{m.name}_cnt")
                ).alias(m.name)
            )
        else:
            cols.append(F.col(f"__{m.name}_{m.kind}").alias(m.name))
    return cols


class MaterializedAggView:
    """A persisted GROUP-BY aggregate over ``base_schema.base_table``,
    maintained batch-by-batch.

    The view table lives at ``schema.table`` in the same warehouse;
    flat-layout writes are atomic swaps (partitioned layouts rewrite
    touched directories in place — see the module docstring for the
    consistency contract).  Callers choose the maintenance entry
    point that matches what happened to the base:

    * :meth:`full_refresh` — rebuild from the (current) base;
    * :meth:`apply_append` — the batch was pure INSERTs;
    * :meth:`apply_changes` — rows changed or vanished: pass the
      post-change base and a frame of touched group keys;
    * :meth:`sync_upsert` / :meth:`sync_delete` — convenience wrappers
      that derive the touched groups from the loader's batch.
    """

    def __init__(
        self,
        wh: Warehouse,
        schema: str,
        table: str,
        keys: list[str],
        measures: list[Measure],
        state_buckets: int | None = None,
        state_partition_key: str | None = None,
    ) -> None:
        """Two partitioned-state layouts for big views (either one
        makes a batch rewrite only its TOUCHED partition directories
        via dynamic partition overwrite, instead of the whole state):

        * ``state_buckets=N`` — Hive-partition by a hash bucket of the
          group keys.  Balanced by construction; wins when a batch
          touches FEWER GROUPS than buckets (dimension-update shaped
          batches).  A batch spraying >> N distinct groups touches
          every bucket and gains nothing — hashing destroys locality.
        * ``state_partition_key=k`` (one of ``keys``) — partition by
          that key's values.  The continuous-aggregate layout: when
          batches ALIGN with the key (time-grain views fed by daily
          arrivals), a batch touches exactly its own partitions, so
          per-batch state I/O is O(touched key values) no matter how
          many groups exist overall.

        Leave both None for rollup-sized states (a handful of groups),
        where one small file beats a directory tree.
        """
        if not keys:
            raise ValueError("matview needs at least one group key")
        names = [m.name for m in measures]
        if len(set(names)) != len(names):
            raise ValueError("duplicate measure names")
        if state_buckets and state_partition_key:
            raise ValueError("pick ONE of state_buckets / state_partition_key")
        if state_partition_key and state_partition_key not in keys:
            raise ValueError("state_partition_key must be a group key")
        self.wh = wh
        self.schema = schema
        self.table = table
        self.keys = list(keys)
        self.measures = list(measures)
        self.state_buckets = state_buckets
        self._part = _BUCKET if state_buckets else state_partition_key

    # -- internals ---------------------------------------------------------
    def _aggregate(self, rows: DataFrame) -> DataFrame:
        return rows.groupBy(*self.keys).agg(*_agg_exprs(self.measures))

    def _bucket_expr(self) -> Column:
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in self.keys]),
            F.lit(self.state_buckets),
        ).cast("int")

    def _partify(self, df: DataFrame) -> DataFrame:
        """Ensure the partition column is present (hash mode derives
        it; key mode already carries it as a group key)."""
        if self.state_buckets:
            return df.withColumn(_BUCKET, self._bucket_expr())
        return df

    def _unpartify(self, df: DataFrame) -> DataFrame:
        if self.state_buckets:
            return df.drop(_BUCKET)
        return df

    def _write(self, state: DataFrame) -> None:
        # group-key cardinality is usually tiny next to the base; cap
        # output files so a 32-way shuffle doesn't write 32 shards of
        # a 15-row rollup.
        if self._part:
            self.wh.write_atomic(
                self._partify(state),
                self.schema,
                self.table,
                coalesce=self.state_buckets or 32,
                partition_by=[self._part],
            )
        else:
            self.wh.write_atomic(state, self.schema, self.table, coalesce=4)

    def _overwrite_buckets(self, content: DataFrame) -> None:
        """Dynamic partition overwrite: replace exactly the bucket
        directories present in ``content``, byte-untouched elsewhere."""
        path = str(self.wh.table_path(self.schema, self.table))
        with dynamic_partition_overwrite(content.sparkSession):
            _write_day_partitioned(content, self._part, path)

    def _touched_bucket_slice(
        self, sess, touched_keys: DataFrame
    ) -> tuple[DataFrame | None, list[int]]:
        """(old rows of the touched buckets, touched bucket ids).
        The bucket list prunes the state read to its directories —
        names-only scandir, same discipline as the partitioned merge."""
        tk = self._partify(touched_keys)
        buckets = [r[0] for r in tk.select(self._part).distinct().collect()]
        tp = self.wh.table_path(self.schema, self.table)
        by_value = _partition_dirs(tp, self._part)
        existing = [
            by_value[_part_key(b)]
            for b in buckets
            if _part_key(b) in by_value
        ]
        if existing:
            old = sess.read.option("basePath", str(tp)).parquet(*existing)
        else:
            old = None
        return old, buckets

    def _drop_emptied_buckets(
        self, content_buckets: set[int], touched_buckets: list[int]
    ) -> None:
        """Dynamic partition overwrite cannot write an EMPTY partition:
        a touched bucket whose every group vanished keeps its stale
        directory after the write — drop those dirs explicitly."""
        tp = self.wh.table_path(self.schema, self.table)
        by_value = _partition_dirs(tp, self._part)
        for b in touched_buckets:
            if b not in content_buckets and _part_key(b) in by_value:
                shutil.rmtree(by_value[_part_key(b)], ignore_errors=True)

    def exists(self) -> bool:
        if self._part:
            return self.wh.table_exists_partitioned(self.schema, self.table)
        return self.wh.table_exists(self.schema, self.table)

    def state(self) -> DataFrame:
        return self.wh.read(self.schema, self.table)

    # -- maintenance -------------------------------------------------------
    def full_refresh(self, base: DataFrame) -> None:
        """Rebuild the whole view — the bootstrap (and the escape hatch
        when a change set is unknowable, e.g. an out-of-band rewrite)."""
        self._write(self._aggregate(base))

    def apply_append(self, batch: DataFrame) -> None:
        """Absorb an INSERT-only batch.

        ``state' = combine(state, aggregate(batch))`` — one aggregate
        over the batch plus a state-sized key join.  The base table is
        not referenced at all (tests pin that the plan reads only the
        batch and the view), so at 100 TB the per-batch cost is the
        batch scan, full stop.  With ``state_buckets`` the join and
        the rewrite shrink further to the delta's TOUCHED buckets
        (probe-measured: the unbucketed highcard append's wall is the
        full-state rewrite, not the combine).
        """
        delta = self._aggregate(batch)
        if not self.exists():
            self._write(delta)
            return
        if not self._part:
            self._write(
                combine_states(self.state(), delta, self.keys, self.measures)
            )
            return
        # partitioned: delta feeds the partition probe AND the combine
        delta = cache_tracked(delta)
        try:
            old, _ = self._touched_bucket_slice(
                delta.sparkSession, delta.select(*self.keys)
            )
            if old is None:
                content = delta
            else:
                # groups in the touched partitions but NOT in the
                # delta pass through combine unchanged (null delta
                # side), so the overwrite rewrites whole partition
                # dirs consistently
                content = combine_states(
                    self._unpartify(old), delta, self.keys, self.measures
                )
            self._overwrite_buckets(self._partify(content))
        finally:
            delta.unpersist()

    def apply_changes(self, base_after: DataFrame, touched_keys: DataFrame) -> None:
        """Recompute exactly the groups in ``touched_keys`` from the
        post-change base and splice them into the state.

        Groups whose rows all vanished drop out naturally (they appear
        in ``touched_keys`` but not in the recomputed aggregate, and
        the untouched remainder is carried by anti-join).

        The touched set feeds TWO subtrees of the one write action
        (the recompute semi-join and the keep anti-join), so it is
        cache_tracked and filled eagerly — the fill's count also
        decides whether it is broadcastable (the loader's threshold)
        or must shuffle-join a pathological batch that touched more
        groups than a broadcast can carry.  With ``state_buckets`` the
        keep side shrinks from the whole state to the touched buckets
        and the rewrite to those directories — emptied groups drop
        there too (they are in the touched set but not in the
        recomputed aggregate, so the bucket's new content omits them).
        """
        touched = cache_tracked(touched_keys.select(*self.keys).distinct())
        try:
            small = touched.count() <= BROADCAST_BATCH_MAX_ROWS
            hinted = F.broadcast(touched) if small else touched
            recomputed = self._aggregate(
                base_after.join(hinted, self.keys, "leftsemi")
            )
            if not self.exists():
                # no prior state to splice into: writing only the
                # touched groups would silently drop every OTHER group
                # of base_after forever (review-caught) — bootstrap is
                # a full refresh
                self._write(self._aggregate(base_after))
                return
            if not self._part:
                kept = self.state().join(hinted, self.keys, "left_anti")
                self._write(kept.unionByName(recomputed))
                return
            old, tb = self._touched_bucket_slice(
                base_after.sparkSession, touched
            )
            recomputed = self._partify(recomputed)
            if old is None:
                content = recomputed
            else:
                content = old.join(
                    hinted, self.keys, "left_anti"
                ).unionByName(recomputed)
            # content feeds the partition census AND the write
            content = cache_tracked(content)
            try:
                have = {
                    r[0]
                    for r in content.select(self._part).distinct().collect()
                }
                if have:
                    self._overwrite_buckets(content)
                self._drop_emptied_buckets(have, tb)
            finally:
                content.unpersist()
        finally:
            touched.unpersist()

    def sync_upsert(
        self,
        base_before: DataFrame,
        base_after: DataFrame,
        batch: DataFrame,
        unique_keys: list[str],
    ) -> None:
        """Maintain across a last-write-wins merge (Loader.load_incremental).

        Touched groups = groups of the incoming rows ∪ groups of the
        rows they replaced (a replaced row may have MIGRATED groups —
        its old group loses the row, its new group gains it; both need
        recompute).
        """
        replaced = base_before.join(
            batch.select(*unique_keys).distinct(), unique_keys, "leftsemi"
        )
        touched = (
            batch.select(*self.keys)
            .unionByName(replaced.select(*self.keys))
            .distinct()
        )
        self.apply_changes(base_after, touched)

    def sync_delete(
        self, base_after: DataFrame, deleted_rows: DataFrame
    ) -> None:
        """Maintain across a DELETE: touched groups are the deleted
        rows' groups."""
        self.apply_changes(base_after, deleted_rows.select(*self.keys))

    # -- read surface ------------------------------------------------------
    def read(self) -> DataFrame:
        """The exposed rollup (engine-neutral column types — no decimals)."""
        return self.state().select(*exposed_cols(self.keys, self.measures))


def sync_views_through_merge(
    loader,
    views: list["MaterializedAggView"],
    batch: DataFrame,
    unique_keys: list[str],
    order_col: str | None = None,
) -> None:
    """Run a ``Loader.load_incremental`` merge AND keep the given views
    consistent with it — the production wiring.

    The touched-group derivation needs the PRE-merge base (a replaced
    row's OLD group must be recomputed too), but the merge atomically
    replaces the base directory, so each view's touched set is pinned
    with an eager ``localCheckpoint`` BEFORE the merge runs — the
    frames survive the swap because their lineage is cut (checkpoint
    blocks, not the about-to-vanish files; df.persist would lazily
    re-read the dead path).  Touched sets are group-key-sized, so the
    checkpoints are tiny.  First sync (no base yet) degrades to
    batch-groups-only, which is exact: nothing could have been
    replaced.
    """
    sess = batch.sparkSession
    had_base = loader.wh.table_exists(loader.schema, loader.table)
    if not had_base and loader.wh.table_exists_partitioned(
        loader.schema, loader.table
    ):
        # the base was seeded through the PARTITIONED loader path
        # (col=value dirs) — the flat existence probe above would
        # return False, the replaced-rows pass would be skipped, and
        # replaced rows' OLD groups would silently go stale in every
        # view (r11 ADVICE).  This wiring drives the flat
        # load_incremental, so a partitioned base is a caller error;
        # fail loudly instead of under-maintaining.
        raise ValueError(
            f"{loader.schema}.{loader.table} has a partitioned layout; "
            "sync_views_through_merge wires the flat load_incremental — "
            "maintain views over a partitioned base with "
            "apply_changes/sync_upsert around your partitioned merge"
        )
    replaced = None
    if had_base:
        # ONE pre-merge base pass shared by every view: the matched
        # rows are batch-sized, so the checkpoint is tiny and each
        # view's touched projection comes off it, not off the base
        replaced = (
            loader.wh.read_with(sess, loader.schema, loader.table)
            .join(
                batch.select(*unique_keys).distinct(),
                unique_keys,
                "leftsemi",
            )
            .localCheckpoint()
        )
    touched: list[DataFrame] = []
    for v in views:
        t = batch.select(*v.keys)
        if replaced is not None:
            t = t.unionByName(replaced.select(*v.keys))
        touched.append(t.distinct().localCheckpoint())
    loader.load_incremental(batch, unique_keys, order_col=order_col)
    base_after = loader.wh.read_with(sess, loader.schema, loader.table)
    for v, t in zip(views, touched):
        v.apply_changes(base_after, t)


class StreamingMatView:
    """Exactly-once streaming maintenance of an aggregate view over an
    append-only stream (the ``foreachBatch`` integration point).

    Absorbing a sum/count batch is NOT idempotent — a crash-replayed
    trigger would double-count (unlike the HLL register fold, whose
    MAX merge replays for free).  The replay guard and the state flip
    are therefore ONE atomic step: each absorbed batch writes a NEW
    state generation ``{table}__g{k}`` and then flips the 1-row
    pointer ``{table}__ptr`` carrying BOTH the generation and the
    batch_id (``write_atomic`` = tmp dir + rename).  A crash anywhere
    leaves the pointer naming a complete pre-crash state whose
    batch_id forces the replayed trigger to re-absorb — there is no
    window where the state counted a batch the pointer doesn't know
    about (the model_registry pointer-flip pattern, with the ledger
    folded INTO the pointer).

    Per-trigger cost: one aggregate over the micro-batch plus a
    state-sized key join — the generation write is the same bytes the
    non-streaming view rewrites per batch.  All frames in a trigger
    build from the micro-batch session (the CLAUDE.md foreachBatch
    rule); serving reads are path-based via the pointer, so they see
    complete old or complete new state across sessions, never a mix.

    Boundary: generations rewrite the WHOLE state per trigger, so this
    class is for rollup-sized streaming views (the common case — a
    dashboard aggregate).  A group-cardinality-huge streaming view
    should instead run the batch wiring per micro-batch over a
    partitioned :class:`MaterializedAggView` (``state_partition_key``)
    and carry its own replay ledger — partition-pruned rewrites and
    atomic generation pointers pull in opposite directions, and this
    class picks the exactly-once side.
    """

    def __init__(
        self,
        wh: Warehouse,
        schema: str,
        table: str,
        keys: list[str],
        measures: list[Measure],
        keep_back: int = 1,
    ) -> None:
        self.wh = wh
        self.schema = schema
        self.table = table
        self.keys = list(keys)
        self.measures = list(measures)
        self.keep_back = keep_back

    def _ptr(self) -> str:
        return f"{self.table}__ptr"

    def _gen(self, k: int) -> str:
        return f"{self.table}__g{k}"

    def _pointer(self, sess) -> tuple[int, int] | None:
        if not self.wh.table_exists(self.schema, self._ptr()):
            return None
        row = self.wh.read_with(sess, self.schema, self._ptr()).collect()[0]
        return int(row["gen"]), int(row["batch_id"])

    def absorb(self, batch_df: DataFrame, batch_id: int) -> bool:
        """foreachBatch body.  Returns False when ``batch_id`` was
        already absorbed (a replayed trigger) — the skip that makes
        sums exactly-once."""
        sess = batch_df.sparkSession
        ptr = self._pointer(sess)
        if ptr is not None and batch_id <= ptr[1]:
            return False
        delta = batch_df.groupBy(*self.keys).agg(*_agg_exprs(self.measures))
        if ptr is None:
            gen, state = 1, delta
        else:
            gen = ptr[0] + 1
            old = self.wh.read_with(sess, self.schema, self._gen(ptr[0]))
            state = combine_states(old, delta, self.keys, self.measures)
        self.wh.write_atomic(state, self.schema, self._gen(gen), coalesce=4)
        self.wh.write_atomic(
            sess.createDataFrame(
                [(gen, batch_id)], "gen long, batch_id long"
            ),
            self.schema,
            self._ptr(),
            coalesce=1,
        )
        # vacuum generations beyond the in-flight-reader grace window
        for t in self.wh.list_tables(self.schema):
            if t.startswith(f"{self.table}__g"):
                suffix = t.rsplit("__g", 1)[1]
                if not suffix.isdigit():
                    continue  # a sibling like '{table}__graph', not a gen
                if int(suffix) < gen - self.keep_back:
                    self.wh.drop_table(self.schema, t)
        return True

    def read(self, sess) -> DataFrame:
        """The exposed rollup of the CURRENT generation (pointer first,
        then exactly that generation — never a torn state)."""
        ptr = self._pointer(sess)
        if ptr is None:
            raise FileNotFoundError(
                f"{self.schema}.{self.table}: no absorbed batches yet"
            )
        state = self.wh.read_with(sess, self.schema, self._gen(ptr[0]))
        return state.select(*exposed_cols(self.keys, self.measures))
