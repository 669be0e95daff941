"""Skew-mitigation utilities: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions; these helpers are
the explicit, plan-level treatment for the cases AQE can't fix:

* a single hot GROUP BY key whose partial aggregate still funnels into
  one reducer → two-stage salted aggregation;
* a shuffle join where one key dominates (the classic web-scale
  "null key" / "default id" hazard) → replicate the small side per
  salt so the hot key's rows spread over N reducers.

Both transformations are pure DataFrame rewrites — deterministic
results, identical semantics, one extra narrow stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, cols: list[str], n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) from the row's content hash
    (xxhash64 — cheap, uniform).  Content-derived rather than random so
    reruns and retried tasks salt identically (exactly-once safety)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def salted_agg_sum(
    df: DataFrame,
    key: str,
    value: Column,
    alias: str,
    n_salts: int = 16,
    salt_by: list[str] | None = None,
) -> DataFrame:
    """SUM(value) GROUP BY key in two stages: (key, salt) partial sums
    → key final sum.

    The hot key's rows split across ``n_salts`` reducers in stage 1;
    stage 2 merges only n_salts partials per key.  Use a decimal value
    column when cross-run bit-equality matters (double re-aggregation
    order changes between the stages).

    ``salt_by`` must vary WITHIN a key (default: all columns) — a salt
    derived from the group key alone is constant per key and splits
    nothing.
    """
    salted = with_salt(df, salt_by or list(df.columns), n_salts)
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__p"))
    return partial.groupBy(key).agg(F.sum("__p").alias(alias))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed keys: salt the big side by
    row content, explode the small side once per salt value, join on
    (key, salt).  The hot key's big-side rows spread over ``n_salts``
    reducers instead of one; small-side duplication is n_salts×|small|
    (choose n_salts ≤ what the small side affords — it is the same
    trade as a broadcast, paid in shuffle instead of memory).

    Only ``inner`` and ``left`` joins are supported: outer modes that
    preserve unmatched SMALL-side rows would emit each of them once
    per salt replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: "
            "outer modes would duplicate unmatched small-side rows "
            "once per salt replica"
        )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    small_rep = small.withColumn("__salt", F.explode(salts))
    big_salted = with_salt(big, [c for c in big.columns], n_salts)
    out = big_salted.join(small_rep, [key, "__salt"], how)
    return out.drop("__salt")
