"""Change-data-capture: snapshot diff + change-feed apply.

The reference pipeline moves tables wholesale or by watermark
(`pg_loader.py:126-270`); a snapshot DIFF is the missing primitive for
propagating a reloaded table downstream without rewriting consumers —
given yesterday's and today's snapshot of a keyed table, emit the
minimal change feed (insert / update / delete rows with old and new
values), and `apply_changes` replays that feed onto the old snapshot
to reproduce the new one exactly (pytest pins the round-trip).

Scale design: the diff is ONE full-outer shuffle co-partitioned on the
key — both sides hash-partition on the same key, so at 100 TB the
planner needs exactly one exchange per side and AQE coalesces the
post-join partitions.  Snapshots bucketed by the key (Warehouse
`write_bucketed`) make the join exchange-free.  The unchanged-row
elimination (`op IS NULL` filter) runs inside the join's projection —
nothing wide survives past the join for the overwhelmingly-common
unchanged keys.  Column comparison is null-safe (`IS DISTINCT FROM` /
``eqNullSafe``) so NULL→value and value→NULL transitions are real
updates, not silent equality.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    cols: list[str],
) -> DataFrame:
    """Minimal change feed turning ``old`` into ``new``.

    Returns one row per changed key: ``keys… , op, old_<c>… , new_<c>…``
    with ``op ∈ {'insert','update','delete'}``; keys present in both
    snapshots with no column differing (null-safely) are omitted.
    Keys must be unique per snapshot (a snapshot IS a keyed state).
    """
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in cols]
    ).withColumn("_old", F.lit(1))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in cols]
    ).withColumn("_new", F.lit(1))
    changed: Column = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in cols
        ],
    )
    op = (
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        o.join(n, keys, "full_outer")
        .withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(
            *keys,
            "op",
            *[f"old_{c}" for c in cols],
            *[f"new_{c}" for c in cols],
        )
    )


def apply_changes(
    old: DataFrame,
    diff: DataFrame,
    keys: list[str],
    cols: list[str],
) -> DataFrame:
    """Replay a :func:`snapshot_diff` feed onto ``old``: drop deleted
    and updated keys (one broadcast-eligible anti-join — the feed is
    small relative to the snapshot by construction), then union the
    feed's insert/update NEW values.  ``apply_changes(old,
    snapshot_diff(old, new)) ≡ new`` exactly (pytest-pinned)."""
    touched = diff.where(F.col("op").isin("delete", "update")).select(*keys)
    incoming = (
        diff.where(F.col("op").isin("insert", "update"))
        .select(*keys, *[F.col(f"new_{c}").alias(c) for c in cols])
    )
    kept = old.select(*keys, *cols).join(touched, keys, "left_anti")
    return kept.unionByName(incoming)


# ---------------------------------------------------------------------------
# registered query: diff two deterministic derivations of `orders`
# ---------------------------------------------------------------------------

#: the fixture carries one snapshot per table, so the gate query diffs
#: two deterministic DERIVATIONS of `orders` (identical arithmetic in
#: both engines): the "old" snapshot drops keys ≡3 (mod 10) — those
#: re-appear as inserts; the "new" one drops keys ≡7 — deletes — and
#: perturbs price (≡0 mod 5, ×1.05: IEEE multiply, bit-identical
#: cross-engine) and status (≡0 mod 11 → 'R') — updates.
_OLD_SQL = """
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 10 <> 3
"""
_NEW_SQL = """
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0
              THEN o_totalprice * CAST(1.05 AS DOUBLE)
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 11 = 0 THEN 'R'
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 10 <> 7
"""


@query(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH old_snap AS ({_OLD_SQL}),
    new_snap AS ({_NEW_SQL}),
    j AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                  WHEN n.o_orderkey IS NULL THEN 'delete'
                  WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  THEN 'update' END AS op,
             o.o_totalprice  AS old_o_totalprice,
             o.o_orderstatus AS old_o_orderstatus,
             n.o_totalprice  AS new_o_totalprice,
             n.o_orderstatus AS new_o_orderstatus
      FROM old_snap o FULL OUTER JOIN new_snap n
        ON o.o_orderkey = n.o_orderkey
    )
    SELECT * FROM j WHERE op IS NOT NULL
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff of two deterministic `orders` snapshot derivations —
    one co-partitioned full-outer join, null-safe column compare,
    unchanged keys eliminated in the join projection."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = orders.where(F.col("o_orderkey") % 10 != 3)
    new = orders.where(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.col("o_totalprice") * F.lit(1.05),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("R"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
