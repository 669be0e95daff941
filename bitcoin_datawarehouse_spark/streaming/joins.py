"""Stream-stream joins (Structured Streaming's two-sided state).

Attribution is the canonical case: join each purchase to the same
user's clicks in the preceding hour, both sides unbounded streams.
Spark keeps both sides' recent state in the state store; the join's
TIME-RANGE predicate plus the watermarks bound how much each side
retains (clicks older than purchase-watermark minus the attribution
window are evicted) — without the range condition the state grows
forever, so it is load-bearing, not an optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "1 hour"


def attribution_join(
    events: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = "2 hours",
) -> DataFrame:
    """purchases ⋈ prior same-user clicks within ``window``.

    Returns (purchase_id, user_id, purchase_ts, click_id, click_ts,
    purchase_value).  Works identically on a batch DataFrame (the
    predicate is plain SQL) — tests exploit that for equivalence.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return purchases.join(
        clicks,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}")
        ),
        "inner",
    ).select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_value",
    )
