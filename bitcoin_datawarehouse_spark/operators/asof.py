"""As-of (most-recent-match) join — an operator Spark lacks natively.

The reference's schema implies one: transaction value in USD needs
``transactions.block_time`` matched to the *latest available*
``price_usd.date`` at or before it (SURVEY.md §2.11 'as-of / date
join').  A naive range join (``l.ts >= r.ts``) explodes to O(L×R);
this implementation is the scalable last-observation-carried-forward
rewrite:

1. take the DISTINCT left keys (bounded: distinct days/timestamps,
   not fact rows),
2. union them with the right series, tagged so right rows sort first
   within a key,
3. one window pass fills ``last(value) ignore nulls`` forward,
4. equi-join the resulting key→value map back to the left (broadcast
   when small).

Cost at scale: one distinct-aggregate over the left keys + a window
over (distinct keys + right rows) + one broadcast equi-join — no
row explosion, no range join.  When the key series itself is huge,
the window is range-partitioned on the by-columns (passed as
``partition_by``).

Oracle: DuckDB's native ``ASOF JOIN`` verifies the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import SQL_DAVG, davg
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    value_cols: list[str],
    partition_by: list[str] | None = None,
    broadcast_map: bool = True,
) -> DataFrame:
    """Left as-of join: for each left row, attach the right row with the
    greatest ``right_on`` ≤ ``left_on`` (within ``partition_by`` groups).

    Left rows with no prior right row keep NULL value columns (ASOF
    LEFT JOIN semantics).
    """
    pb = partition_by or []

    left_keys = left.select(*pb, F.col(left_on).alias("_asof_key")).distinct()
    left_keys = left_keys.withColumn("_asof_tag", F.lit(1))
    right_tagged = right.select(
        *pb,
        F.col(right_on).alias("_asof_key"),
        F.lit(0).alias("_asof_tag"),
        *[F.col(c) for c in value_cols],
    )
    # right rows sort before left probes at the same key (tag 0 < 1) so
    # an exact key match is visible to the probe
    unioned = left_keys.select(
        *pb, "_asof_key", "_asof_tag", *[F.lit(None).alias(c) for c in value_cols]
    ).unionByName(right_tagged)

    # value_cols extend the ordering purely as a deterministic
    # tiebreak: if the right series has duplicate rows per key (tick
    # data not pre-aggregated), last() would otherwise pick whichever
    # duplicate arrived last — run-dependent.  With the tiebreak the
    # greatest value tuple wins, reproducibly; pre-aggregate the right
    # side when different tie semantics are wanted.
    order_cols = ["_asof_key", "_asof_tag", *value_cols]
    # the unpartitioned branch (pb empty) is taken only for a single
    # global series — the daily-price mapping here is ≤36.5k
    # rows/century, so the WindowExec single-partition warning is
    # benign; keyed as-of joins always pass partition_by
    w = (
        W.partitionBy(*pb).orderBy(*order_cols)
        if pb
        else W.orderBy(*order_cols)
    ).rowsBetween(W.unboundedPreceding, 0)
    filled = unioned.select(
        *pb,
        "_asof_key",
        "_asof_tag",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    ).filter(F.col("_asof_tag") == 1)

    # rename the mapping's join columns: they carry the same expression
    # ids as `left`'s (the union descends from it), and joining two
    # lineage-sharing frames on same-id columns is ambiguous — the
    # classic self-join trap (raises AnalysisException)
    mapping = filled.select(
        *[F.col(c).alias(f"__map_{c}") for c in pb],
        F.col("_asof_key").alias("__map_key"),
        *value_cols,
    )
    if broadcast_map:
        mapping = F.broadcast(mapping)
    join_cond = [left[left_on] == mapping["__map_key"]]
    for c in pb:
        join_cond.append(left[c] == mapping[f"__map_{c}"])
    out = left.join(mapping, join_cond, "left")
    return out.select(
        *[left[c] for c in left.columns], *[mapping[c] for c in value_cols]
    )


@query(
    "asof_join_daily_price",
    oracle=f"""
    WITH price AS (
      SELECT
        CAST(ts AS DATE) AS price_day,
        {SQL_DAVG("value", "price")}
      FROM events
      WHERE event_type = 'purchase' AND day(CAST(ts AS DATE)) % 3 = 1
      GROUP BY 1
    )
    SELECT
      e.event_id,
      CAST(e.ts AS DATE) AS event_day,
      p.price AS asof_price
    FROM events e
    ASOF LEFT JOIN price p ON CAST(e.ts AS DATE) >= p.price_day
    """,
)
def asof_join_daily_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join events → sparse daily price series (LOCF).

    The price series only exists on every third day (a deliberately
    sparse right side), so matches genuinely carry forward — the
    reference-schema analog is pricing each transaction with the most
    recent known ``price_usd.date`` (SURVEY.md §2.11).
    """
    e = load_table(spark, sf_dir, "events")
    price = (
        e.filter(
            (F.col("event_type") == "purchase")
            & (F.dayofmonth(F.to_date("ts")) % 3 == 1)
        )
        .groupBy(F.to_date("ts").alias("price_day"))
        .agg(davg(F.col("value"), "price"))
    )
    left = e.select("event_id", F.to_date("ts").alias("event_day"))
    return asof_join(
        left,
        price,
        left_on="event_day",
        right_on="price_day",
        value_cols=["price"],
    ).select("event_id", "event_day", F.col("price").alias("asof_price"))
