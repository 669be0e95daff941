"""Weighted PageRank — iterative graph analytics beyond components.

`graph.py` gave the engine its first iterative-fixpoint operator
(connected components, min-label propagation).  PageRank is the other
canonical iterative kernel: a damped random walk over a weighted
digraph, here the event-type transition graph (per-user consecutive
event pairs — the product-analytics "where does attention flow" view).

Numeric contract (the kmeans/correlation discipline applied to an
ITERATED fixpoint): each superstep's incoming-mass sum is the one
order-dependent reduction, so it accumulates in exact DECIMAL(38,10)
and converts through the string route; every other operation is a
per-row double expression written in the identical order on both
engines.  With PR_ITERS pinned, the whole 10-superstep computation is
therefore bit-identical to the oracle's ten unrolled CTEs — an
iterative algorithm under the full hash gate, not a rows-only waiver.

Dangling variant: nodes without out-edges simply leak their mass (no
redistribution term) — the common simplification; both sides compute
it identically, and the fixture graph has no dangling nodes anyway.

Scale: per superstep ONE edges⋈ranks join + one groupBy — the rank
state is node-sized, the edge table is the only corpus-derived input
and is built ONCE (per-user lag window, time-ordered).  At 100 TB the
transition extraction dominates (a single windowed pass over events);
the iteration itself runs on the aggregated graph, which is
vocabulary-sized, exactly like the LM-quality bigram table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_DEC,
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

PR_ITERS = 10
PR_DAMP = "CAST(0.85 AS DOUBLE)"
PR_BASE = "CAST(0.15 AS DOUBLE)"


def _oracle() -> str:
    ctes = [
        """nodes AS (SELECT DISTINCT event_type AS node FROM events),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    pairs AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS dst
      FROM events
    ),
    edges_raw AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
      FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    edges AS (
      SELECT src, dst, w,
             CAST(SUM(w) OVER (PARTITION BY src) AS BIGINT) AS outw
      FROM edges_raw
    ),
    pr0 AS (
      SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM nodes, nn
    )"""
    ]
    contrib = SQL_DEC(
        "(p.pr * CAST(e.w AS DOUBLE)) / CAST(e.outw AS DOUBLE)"
    )
    for k in range(1, PR_ITERS + 1):
        ctes.append(
            f"""pr{k} AS (
      SELECT n.node,
             ({PR_BASE} / nn.n) + {PR_DAMP} * COALESCE(s.contrib,
               CAST(0.0 AS DOUBLE)) AS pr
      FROM nodes n CROSS JOIN nn LEFT JOIN (
        SELECT e.dst AS node,
               CAST(CAST(SUM({contrib}) AS STRING) AS DOUBLE) AS contrib
        FROM edges e JOIN pr{k - 1} p ON p.node = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, {SQL_STR_ROUND6("pr")} AS pagerank
    FROM pr{PR_ITERS}"""
    )


@query("graph_pagerank_event_transitions", oracle=_oracle())
def graph_pagerank_event_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """10-superstep weighted PageRank (d = 0.85) over the event-type
    transition graph — hash-gated against ten unrolled CTEs."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w_user).alias("dst"),
    ).where(F.col("dst").isNotNull())
    edges = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .withColumn(
            "outw",
            F.sum("w").over(W.partitionBy("src")).cast("bigint"),
        )
        .localCheckpoint()  # edge table is node²-bounded; pin it once
    )
    # node-sized and read by every superstep's join — pin it once, or
    # each of the ~12 downstream actions re-runs the corpus distinct
    # (review-caught: the module's built-ONCE claim was true only for
    # edges before this checkpoint)
    nodes = (
        ev.select(F.col("event_type").alias("node"))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # node-count scalar — graph metadata, not data
    ranks = nodes.select(
        "node", (F.lit(1.0) / F.lit(float(n))).alias("pr")
    ).localCheckpoint()
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (
                    (F.col("pr") * F.col("w").cast("double"))
                    / F.col("outw").cast("double")
                ).alias("c"),
            )
            .groupBy("node")
            .agg(
                F.sum(F.col("c").cast("decimal(38,10)"))
                .cast("string")
                .cast("double")
                .alias("contrib")
            )
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    (F.lit(0.15) / F.lit(float(n)))
                    + F.lit(0.85)
                    * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint()  # cut iterative lineage, node-sized
        )
    return ranks.select("node", str_round6(F.col("pr")).alias("pagerank"))
