"""Cogrouped-pandas operators: per-key alignment of two tables.

``cogroup(...).applyInPandas`` is the extension point for operators
that need BOTH sides of a key in one vectorized kernel — per-entity
as-of alignment, per-key reconciliation/diffing, trajectory stitching.
Spark co-partitions the two inputs by the key (one shuffle each) and
hands each key's pair of pandas frames to the kernel.

The operator here aligns each user's events to their most recent
prior 'signup'-type event (a per-user as-of join) via
``pandas.merge_asof`` — the same semantics as operators/asof.py but
executed per key in pandas, which is the right shape when the as-of
logic is too bespoke for the window rewrite (per-key tolerances,
nearest-rather-than-backward, custom tie-breaks).

Verified two ways: a DuckDB ASOF JOIN oracle in the gate, and the
window-rewrite equivalence in tests.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("last_signup_ts", T.TimestampType()),
    ]
)


def _align(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """merge_asof: each left event gets the latest right ts ≤ its ts.

    Either side can arrive EMPTY (and column-less) when a key exists
    only in the other input — cogroup invokes the kernel for the union
    of keys — so the empty guards must run before any column access.
    """
    cols = ["user_id", "event_id", "ts", "last_signup_ts"]
    if left.empty:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    left = left.sort_values("ts")
    if right.empty:
        out = left.copy()
        out["last_signup_ts"] = pd.NaT
    else:
        right = right.sort_values("signup_ts")[["signup_ts"]].rename(
            columns={"signup_ts": "last_signup_ts"}
        )
        out = pd.merge_asof(
            left, right, left_on="ts", right_on="last_signup_ts",
            direction="backward",
        )
    return out[cols]


@query(
    "cogroup_asof_alignment",
    oracle="""
    WITH signups AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS signup_ts
      FROM events WHERE event_type = 'signup'
    )
    SELECT e.user_id, e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
           s.signup_ts AS last_signup_ts
    FROM events e
    ASOF LEFT JOIN signups s
      ON e.user_id = s.user_id AND CAST(e.ts AS TIMESTAMP) >= s.signup_ts
    """,
)
def cogroup_asof_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event annotated with its user's most recent prior signup
    timestamp, computed per-user in a cogrouped pandas kernel."""
    events = load_table(spark, sf_dir, "events")
    left = events.select("user_id", "event_id", "ts")
    # NOTE the alias: both cogroup inputs derive from the same scan,
    # and a self-cogroup silently PRUNES right-side columns whose
    # attribute ids are shadowed by the left (`ts` arrives missing in
    # the kernel).  Renaming creates a fresh attribute and keeps the
    # column; the same hazard as ambiguous self-joins, but silent.
    right = events.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    return (
        left.groupBy("user_id")
        .cogroup(right.groupBy("user_id"))
        .applyInPandas(lambda l, r: _align(l, r), schema=OUT_SCHEMA)
    )
