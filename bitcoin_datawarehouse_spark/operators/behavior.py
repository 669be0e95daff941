"""Behavioral analytics over the event stream: funnels and cohorts.

The reference's star schema answers "what happened" aggregates; the
two operators here are the standard product-analytics follow-ups a
warehouse is asked next — ordered-funnel conversion and weekly cohort
retention — expressed as plain multi-stage aggregations (SURVEY.md
§2.11 analytical surface).

Scale design: every stage is a per-user conditional aggregate
(map-side combine) or an equi-join against a per-user stage table —
the stage tables are bounded by user count, far below event count, so
they broadcast; nothing windows over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: ordered funnel stages (event_type values in the events fixture)
FUNNEL = ["view", "signup", "purchase"]


@query(
    "funnel_view_signup_purchase",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_signup
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'signup' AND e.ts > s1.t_view
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_signup
      GROUP BY e.user_id
    )
    SELECT u.user_id,
           CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                     WHEN s2.user_id IS NOT NULL THEN 2
                     WHEN s1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS reached_stage,
           s1.t_view, s2.t_signup, s3.t_purchase
    FROM u
    LEFT JOIN s1 USING (user_id)
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    """,
)
def funnel_view_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel view → signup → purchase per user.

    Each stage's timestamp is the FIRST qualifying event *after* the
    previous stage (an earlier signup does not count toward a funnel
    entered by a later view).  Stage tables are per-user aggregates —
    bounded by user count — and broadcast back onto the event scan;
    the raw event table is never windowed or self-joined.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        ev.join(F.broadcast(s1), "user_id")
        .filter(
            (F.col("event_type") == FUNNEL[1])
            & (F.col("ts") > F.col("t_view"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    s3 = (
        ev.join(F.broadcast(s2), "user_id")
        .filter(
            (F.col("event_type") == FUNNEL[2])
            & (F.col("ts") > F.col("t_signup"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    reached = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_signup").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
    )
    return (
        u.join(F.broadcast(s1), "user_id", "left")
        .join(F.broadcast(s2), "user_id", "left")
        .join(F.broadcast(s3), "user_id", "left")
        .select(
            "user_id",
            reached.alias("reached_stage"),
            "t_view",
            "t_signup",
            "t_purchase",
        )
    )


@query(
    "cohort_weekly_retention",
    oracle=f"""
    WITH wk AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events GROUP BY 1, 2
    ),
    first AS (SELECT user_id, MIN(w) AS cohort_week FROM wk GROUP BY user_id),
    cohorts AS (
      SELECT f.cohort_week,
             CAST((w.w - f.cohort_week) // 7 AS INT) AS week_offset,
             COUNT(*) AS n_active
      FROM wk w JOIN first f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT c.cohort_week, c.week_offset,
           CAST(c.n_active AS BIGINT) AS n_active,
           CAST(s.n_active AS BIGINT) AS cohort_size,
           {SQL_STR_ROUND6('CAST(c.n_active AS DOUBLE) / s.n_active')} AS retention
    FROM cohorts c
    JOIN (SELECT cohort_week, n_active FROM cohorts WHERE week_offset = 0) s
      USING (cohort_week)
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first activity; each cell counts cohort members active in week
    offset k, with the ratio against the cohort's own week-0 size.

    (user, week) pairs dedupe in one hash aggregate over the scan;
    everything downstream operates on per-user / per-cohort tables
    bounded by user count and calendar weeks.  `n_active` counts rows
    of the deduped pairs, so no COUNT(DISTINCT) expand is needed.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = (
        ev.select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("w"),
        )
        .distinct()
    )
    first = wk.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    cohorts = (
        wk.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff(F.col("w"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    sizes = cohorts.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return cohorts.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        str_round6(
            F.col("n_active").cast("double") / F.col("cohort_size")
        ).alias("retention"),
    )
