"""Warehouse-persisted MinHash-LSH dedup index (production loop).

``dedup_incremental_batch`` (incremental.py) demonstrates the batch-
vs-corpus SHAPE but recomputes the index side's signatures every run.
Production near-dup (the reference's K6/K7 incremental-load loop,
``data_integration/utils/worker/pg_loader.py:165-217``, applied to
the dedup domain; same pattern as the public CCNet/RefinedWeb
pipelines) keeps the corpus' signatures MATERIALIZED and touches only
the incoming batch per ingest:

* two warehouse tables —
  ``bands(doc_id, band, band_key)``: the LSH candidate-generation
  surface, one row per (doc, band); and
  ``docsets(doc_id, shs, sz)``: the packed distinct-shingle sets for
  exact Jaccard verification.  Both are derived artifacts: an ingest
  plan reads THEM, never the raw documents table.
* ``ingest_batch`` takes the batch's kernel-computed docsets frame
  (``dedup.doc_shingle_sets`` output — the only place raw text is
  touched, and only for the NEW documents), equi-joins batch band
  keys against the persisted band table (batch side broadcast when
  small — same ``BROADCAST_BATCH_MAX_ROWS`` guard as the loader),
  verifies candidates with ``array_intersect`` over the packed sets,
  and emits one keep/drop decision per batch doc.  It then appends
  the batch's rows to both tables, so the next ingest sees them.

* ``remove`` un-indexes documents (takedown/retraction) through a
  deletion-vector sidecar — decide plans anti-join it on read, and
  ``apply_removals``/``compact`` (or a re-ingest of a removed id)
  applies it physically.  Past ledger decisions stand; removed docs
  simply stop deciding future arrivals.

Decision semantics are ARRIVAL-ORDERED: a document is a duplicate iff
it matches (Jaccard ≥ threshold) any document that arrived before it
— everything already in the index, or an earlier ``doc_id`` within
its own batch (batch-internal near-dups are real: a crawl snapshot
repeats boilerplate).  Dropped documents still enter the index (they
can be the best match of later arrivals, exactly as in a one-shot
pass).  Consequence (pytest-pinned): splitting an id-ordered corpus
into consecutive batches and ingesting them sequentially produces
BIT-IDENTICAL decisions to ingesting the whole corpus as one batch.

Scale: candidates are bounded by batch × band-bucket collisions —
the per-ingest cost is proportional to the BATCH, not the corpus;
the persisted band table is an equi-join build side that never
re-tokenizes anything.  At 100 TB the band table is ~4 short rows
per document — parquet-scanned with band_key pushdown-friendly
layout, while the heavy docsets table is only joined on the bounded
candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.cachereg import cache_tracked
from bitcoin_datawarehouse_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    SH_SEP,
    band_keys_from_sets,
)
from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse
from bitcoin_datawarehouse_spark.pipeline.loader import (
    BROADCAST_BATCH_MAX_ROWS,
)
from bitcoin_datawarehouse_spark.functions.localframe import local_rows_df

#: auto-compact the index tables once either accretes this many
#: parquet files (each micro-batch append adds its own files; scans
#: then pay per-file open/footer costs).  The glob probe is a cheap
#: driver-side metadata check per ingest.
AUTO_COMPACT_FILES = 64


class LshDedupIndex:
    """Persisted LSH index over a document corpus' shingle signatures."""

    def __init__(
        self,
        warehouse: Warehouse,
        schema: str = "dedup_index",
        name: str = "documents",
        threshold: float = JACCARD_THRESHOLD,
        auto_compact_files: int | None = AUTO_COMPACT_FILES,
    ) -> None:
        self.wh = warehouse
        self.schema = schema
        self.bands_table = f"{name}_bands"
        self.docsets_table = f"{name}_docsets"
        self.decisions_table = f"{name}_decisions"
        #: deletion-vector sidecar for :meth:`remove` (takedowns /
        #: retractions): decide plans anti-join it on read,
        #: :meth:`apply_removals` rewrites it away physically
        self.removed_table = f"{name}_removed"
        self.threshold = threshold
        self.auto_compact_files = auto_compact_files
        warehouse.create_schema(schema)

    # -- state -------------------------------------------------------------
    def exists(self) -> bool:
        return self.wh.table_exists(self.schema, self.docsets_table)

    def _removed(self) -> DataFrame | None:
        if self.wh.table_exists(self.schema, self.removed_table):
            return self.wh.read(self.schema, self.removed_table)
        return None

    def _minus_removed(self, df: DataFrame) -> DataFrame:
        """Merge-on-read: tombstoned docs drop via a broadcast
        anti-join against the removals sidecar (removals-sized)."""
        r = self._removed()
        return (
            df.join(F.broadcast(r), "doc_id", "left_anti")
            if r is not None
            else df
        )

    def _bands(self) -> DataFrame:
        return self._minus_removed(
            self.wh.read(self.schema, self.bands_table)
        )

    def _docsets(self) -> DataFrame:
        return self._minus_removed(
            self.wh.read(self.schema, self.docsets_table)
        )

    # -- removal -----------------------------------------------------------
    def remove(self, doc_ids) -> None:
        """Un-index documents (takedown / retraction) — the same
        deletion-vector pattern as ``IvfIndex.delete``: tombstones
        land in a tiny sidecar, every decide plan anti-joins it
        (broadcast), :meth:`apply_removals` applies it physically.
        Cost ∝ removals, never ∝ corpus.

        Semantics: a removed document no longer decides FUTURE
        arrivals (it can't be anyone's match); PAST decisions in the
        ledger are recorded history and stand.  Re-ingesting a
        removed doc_id re-indexes it fresh (see :meth:`ingest_batch`).

        ``doc_ids``: an iterable of ids or a DataFrame with a
        ``doc_id`` column.
        """
        spark = self.wh.spark
        if not isinstance(doc_ids, DataFrame):
            doc_ids = local_rows_df(spark, 
                [(int(v),) for v in doc_ids], "doc_id long"
            )
        # coalesce(1) on BOTH paths: the distinct() shuffle would
        # otherwise append shuffle-partition-many near-empty files per
        # call, and the sidecar is broadcast by EVERY decide plan
        dels = doc_ids.select("doc_id").distinct().coalesce(1)
        if self.wh.table_exists(self.schema, self.removed_table):
            self.wh.append(dels, self.schema, self.removed_table)
        else:
            self.wh.write_atomic(
                dels, self.schema, self.removed_table, coalesce=1
            )

    def apply_removals(self) -> None:
        """Rewrite bands/docsets WITHOUT the tombstoned docs and clear
        the sidecar (atomic per table — a crash between rewrites
        leaves the sidecar in place, so reads stay correct and a
        replay completes the apply idempotently)."""
        r = self._removed()
        if r is None:
            return
        for table in (self.bands_table, self.docsets_table):
            if self.wh.table_exists(self.schema, table):
                live = self.wh.read(self.schema, table).join(
                    F.broadcast(r), "doc_id", "left_anti"
                )
                self.wh.write_atomic(live, self.schema, table)
        self.wh.drop_table(self.schema, self.removed_table)

    def _append(self, batch_docsets: DataFrame) -> None:
        """Fold the batch into the two index tables, IDEMPOTENTLY.

        The two appends cannot be one atomic transaction on a file
        warehouse, so a crash between them leaves a batch half-indexed
        (bands written, docsets not — or a partially committed append
        of either).  Each append therefore anti-joins the batch
        against the doc_ids already present in ITS target table: a
        replay completes exactly the missing rows instead of
        duplicating the ones that landed before the crash.  The
        anti-join build side is the batch (bounded); the probe scan of
        the existing table is the same bands/docsets scan the decide
        plan already pays.
        """
        bands = band_keys_from_sets(batch_docsets)
        if self.wh.table_exists(self.schema, self.bands_table):
            bands = bands.join(
                self._bands().select("doc_id").distinct(),
                "doc_id",
                "left_anti",
            )
        self.wh.append(bands, self.schema, self.bands_table)
        sets = batch_docsets.select("doc_id", "shs", "sz")
        if self.exists():
            sets = sets.join(
                self._docsets().select("doc_id"), "doc_id", "left_anti"
            )
        self.wh.append(sets, self.schema, self.docsets_table)

    def compact(self) -> tuple[tuple[int, int], tuple[int, int]]:
        """Rewrite both index tables into ~target-sized files (see
        ``Warehouse.compact``), applying any pending removals
        physically first (the rewrite is the natural place to drop
        tombstoned rows — same lifecycle as ``IvfIndex.compact``).
        Returns ((bands_before, bands_after),
        (docsets_before, docsets_after))."""
        self.apply_removals()
        return (
            self.wh.compact(self.schema, self.bands_table),
            self.wh.compact(self.schema, self.docsets_table),
        )

    def _maybe_compact(self) -> None:
        if not self.auto_compact_files:
            return
        for table in (self.bands_table, self.docsets_table):
            path = self.wh.table_path(self.schema, table)
            if len(list(path.glob("*.parquet"))) >= self.auto_compact_files:
                self.wh.compact(self.schema, table)

    # -- ingest ------------------------------------------------------------
    def decide_batch(self, batch_docsets: DataFrame) -> DataFrame:
        """The LAZY decision frame for a batch against the current
        index state: (doc_id, is_dup, match_id, match_jaccard), one
        row per batch doc.  Reads only the persisted ``bands`` /
        ``docsets`` tables plus the given batch frame — never the raw
        documents table.  Use :meth:`ingest_batch` for the full loop
        (materialize decisions, then fold the batch into the index);
        materialize this frame BEFORE any append or it will see the
        batch's own rows in the index.

        The batch frame is read by several plan subtrees (band
        explode ×2, both verification sides, the final left join) —
        pass it CACHED (as :meth:`ingest_batch` does) or the upstream
        kernel re-runs per subtree.
        """
        batch = batch_docsets.select("doc_id", "shs", "sz", "band_keys")
        small = batch.count() <= BROADCAST_BATCH_MAX_ROWS

        def _b(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if small else df

        bb = band_keys_from_sets(batch).alias("b")
        pairs = None
        if self.exists():
            ib = self._bands().alias("a")
            # a.doc_id != b.doc_id: a replay of a half-indexed batch
            # (bands appended, docsets not — see _append) sees its OWN
            # band rows in the index; without the guard every such doc
            # would self-match (jaccard 1.0, match_id = itself)
            vs_index = (
                ib.join(
                    _b(bb),
                    (F.col("b.band") == F.col("a.band"))
                    & (F.col("b.band_key") == F.col("a.band_key"))
                    & (F.col("a.doc_id") != F.col("b.doc_id")),
                )
                .select(
                    F.col("b.doc_id").alias("batch_id"),
                    F.col("a.doc_id").alias("other_id"),
                )
                .distinct()
            )
            pairs = vs_index
        # batch-internal: earlier doc_id decides later doc_id (the
        # arrival order within one batch)
        bb2 = band_keys_from_sets(batch).alias("c")
        internal = (
            bb.join(
                bb2,
                (F.col("b.band") == F.col("c.band"))
                & (F.col("b.band_key") == F.col("c.band_key"))
                & (F.col("c.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("b.doc_id").alias("batch_id"),
                F.col("c.doc_id").alias("other_id"),
            )
            .distinct()
        )
        pairs = internal if pairs is None else pairs.unionByName(internal)

        # exact verification on the candidate set only: batch side from
        # the cached batch, other side from the index docsets table or
        # the batch cache (never the raw corpus)
        db = batch.select(
            F.col("doc_id").alias("batch_id"),
            F.col("shs").alias("shs_b"),
            F.col("sz").alias("sz_b"),
        )
        other_sets = batch.select("doc_id", "shs", "sz")
        if self.exists():
            other_sets = self._docsets().unionByName(other_sets)
        da = other_sets.select(
            F.col("doc_id").alias("other_id"),
            F.col("shs").alias("shs_a"),
            F.col("sz").alias("sz_a"),
        )
        n_common = F.size(
            F.array_intersect(
                F.split("shs_b", SH_SEP), F.split("shs_a", SH_SEP)
            )
        )
        scored = (
            pairs.join(_b(db), "batch_id")
            .join(da, "other_id")
            .select(
                "batch_id",
                "other_id",
                (
                    n_common.cast("double")
                    / (F.col("sz_b") + F.col("sz_a") - n_common)
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= self.threshold)
        )
        w = Window.partitionBy("batch_id").orderBy(
            F.col("jaccard").desc(), "other_id"
        )
        best = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("batch_id", "other_id", "jaccard")
        )
        return (
            batch.select("doc_id")
            .join(_b(best), batch.doc_id == best.batch_id, "left")
            .select(
                "doc_id",
                F.col("batch_id").isNotNull().alias("is_dup"),
                F.col("other_id").alias("match_id"),
                F.col("jaccard").alias("match_jaccard"),
            )
        )

    def ingest_batch(self, batch_docsets: DataFrame) -> DataFrame:
        """Decide every batch document against the index (and earlier
        batch docs by doc_id — arrival order), then fold the batch
        into the index.

        The decisions are MATERIALIZED to the warehouse (table
        ``{name}_decisions``, atomically replaced per ingest — the
        auditable ledger of the run, distributed write, no driver
        collect) BEFORE the batch is appended to the index tables:
        the decision plan reads those tables lazily, and appending
        first would make every batch doc match itself.

        A batch that RE-INGESTS a removed doc_id applies the
        removals physically first: ``_append``'s idempotent replay
        anti-joins against the doc_ids physically present in each
        table, so a tombstoned-but-present doc would otherwise block
        its own re-ingest (and un-tombstoning would resurface the
        STALE rows next to the new ones).  The intersection probe
        broadcasts the removals-sized sidecar against the batch —
        the common non-intersecting ingest stays ∝ batch.
        """
        batch = cache_tracked(
            batch_docsets.select("doc_id", "shs", "sz", "band_keys")
        )
        batch.count()  # eager fill — several subtrees read this cache
        r = self._removed()
        if r is not None and (
            batch.select("doc_id")
            .join(F.broadcast(r), "doc_id", "left_semi")
            .limit(1)
            .count()
        ):
            self.apply_removals()
        decisions = self.decide_batch(batch)
        self.wh.write_atomic(decisions, self.schema, self.decisions_table)
        self._append(batch)
        batch.unpersist()
        self._maybe_compact()
        return self.wh.read(self.schema, self.decisions_table)
