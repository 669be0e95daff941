"""Entity resolution: blocked fuzzy matching + entity clustering.

The master-data / record-linkage family: the same real-world entity
arrives under slightly different surface forms (typos, OCR noise,
re-keyed ids), and the pipeline must (a) find candidate pairs without
an all-pairs comparison, (b) score them with a string metric, and
(c) collapse matched pairs into entity clusters with one canonical
record.  Classic blocking-based ER (Fellegi-Sunter shape, minus the
probabilistic weights):

* **blocking** — candidates are generated only WITHIN a block (here
  ``c_nationkey``); cost is Σ block², never N².  The fixture's 25
  nations cap join parallelism at 25 tasks — production blocking
  composes finer keys (phonetic code, name prefix, zip); the plan
  shape is unchanged, only the block expression widens.
* **scoring** — Levenshtein edit distance, a built-in in BOTH engines
  (identical classic DP definition, integer-exact — no float or
  tie-order hazard), computed only on blocked candidates.
* **clustering** — matched pairs are edges; entities are connected
  components (the reusable min-label-propagation operator from
  graph.py, recursive-CTE oracle).  The cluster pass uses a TIGHTER
  threshold (≤ 1) than the pair report (≤ 2): transitive closure
  over a loose threshold chains entire blocks into one entity (at
  ≤ 2 the fixture collapses to exactly one entity per nation —
  measured, and the standard ER transitivity lesson).

Reference parity: none (the reference has no matching surface);
north-star §2.12 extension — the same blocked-candidate discipline as
the dedup family, over relational entities instead of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.operators.graph import (
    connected_components,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: pair-report threshold: ≤ 2 edits is the "review queue" surface
ER_PAIR_MAX_DIST = 2
#: clustering threshold: ≤ 1 edit — tight enough that transitive
#: closure yields entities, not blocks (see module docstring)
ER_CLUSTER_MAX_DIST = 1

#: entity clusters can be chain-shaped at distance 1 (each link one
#: digit apart); the fixture's largest cluster is 17 members, so the
#: default 20-superstep cap is too close — propagation needs the
#: graph diameter
ER_MAX_SUPERSTEPS = 40


def _fuzzy_pairs(
    spark: SparkSession, sf_dir: str, max_dist: int
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .withColumn(
            "dist", F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
        )
        .where(F.col("dist") <= max_dist)
        .select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("a.c_nationkey").alias("nationkey"),
            F.col("dist").cast("long").alias("dist"),
        )
    )


def _sql_pairs(max_dist: int) -> str:
    return f"""
    SELECT c1.c_custkey AS custkey_a, c2.c_custkey AS custkey_b,
           c1.c_nationkey AS nationkey,
           CAST(levenshtein(c1.c_name, c2.c_name) AS BIGINT) AS dist
    FROM customer c1
    JOIN customer c2
      ON c1.c_nationkey = c2.c_nationkey
     AND c1.c_custkey < c2.c_custkey
    WHERE levenshtein(c1.c_name, c2.c_name) <= {max_dist}
    """


@query("er_fuzzy_name_pairs", oracle=_sql_pairs(ER_PAIR_MAX_DIST))
def er_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked candidate pairs with edit distance ≤ 2.

    The human-review surface of an ER pipeline: every within-block
    pair close enough to plausibly be the same entity, with its
    score.  Join condition is pure block equality + key ordering;
    the metric is computed post-join on candidates only.
    """
    return _fuzzy_pairs(spark, sf_dir, ER_PAIR_MAX_DIST)


@query(
    "er_entity_clusters",
    oracle=f"""
    WITH RECURSIVE p AS ({_sql_pairs(ER_CLUSTER_MAX_DIST)}),
    edges AS (
      SELECT custkey_a AS src, custkey_b AS dst FROM p
      UNION ALL
      SELECT custkey_b, custkey_a FROM p
    ),
    reach AS (
      SELECT c_custkey AS node, c_custkey AS lbl FROM customer
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS c_custkey,
           MIN(lbl) AS entity_id,
           CAST(node = MIN(lbl) AS BOOLEAN) AS is_canonical
    FROM reach
    GROUP BY node
    """,
)
def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every customer labeled with its entity (min custkey of the
    component over distance-≤1 matches) and a canonical flag.

    Same fixpoint contract as ``dedup_canonical_docs``: the iterative
    labels either converge or raise — never silently truncate.
    """
    c = load_table(spark, sf_dir, "customer")
    pairs = _fuzzy_pairs(spark, sf_dir, ER_CLUSTER_MAX_DIST)
    labels = connected_components(
        c.select(F.col("c_custkey").alias("vertex")),
        pairs.select(
            F.col("custkey_a").alias("src"), F.col("custkey_b").alias("dst")
        ),
        max_supersteps=ER_MAX_SUPERSTEPS,
    )
    return labels.select(
        F.col("vertex").alias("c_custkey"),
        F.col("component").alias("entity_id"),
        (F.col("vertex") == F.col("component")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# PassJoin-shaped candidate generation (the scale path for fuzzy pairs)
# ---------------------------------------------------------------------------

#: 3 contiguous segments of the 18-char name (k+1 segments for k=2);
#: (1-based start, length) — generic thirds, nothing digit-specific
_PJ_SEGMENTS = [(1, 6), (7, 6), (13, 6)]


def er_fuzzy_pairs_passjoin_frame(c: DataFrame, max_dist: int) -> DataFrame:
    """Same output as the naive blocked join, via PassJoin pigeonhole
    candidates (Li/Deng/Feng, ICDE'11 "PassJoin"): partition one side
    into ``k+1`` contiguous segments — at edit distance ≤ k at least
    one segment of A occurs in B at a position shifted by at most k
    (pigeonhole over the ≤ k edit operations).  The probe side
    therefore emits each segment window at shifts −k..k; candidates
    are an EQUI-join on (block, segment-id, segment-text) — never a
    within-block cross join — and the exact metric verifies only
    candidates.

    Candidate cost: Σ_key |A_key|·|B_key| with segment-text keys —
    block² divided by segment selectivity.  On sequentially-numbered
    fixture names the leading segment is low-entropy (all
    "Custom"), so the win concentrates in the digit segments;
    real-world name entropy spreads it across all passes.  Measured
    (SCALING.md): 100× candidate collapse on entropy names; on the
    adversarial fixture it degrades to block² candidates but still
    wins 1.4× wall (narrow rows, one Levenshtein per distinct pair,
    (block, seg) keys spread the join past the 25-block skew).

    Recall is structural for ANY name lengths: ≤ k edits each touch
    at most one of the k+1 DISJOINT segments (covering not required),
    so one segment survives verbatim at a shift ≤ k.  Names shorter
    than a segment window truncate both sides identically (empty
    matches empty — over-generates within the block, never misses).
    """
    k = max_dist
    seg_keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("seg_id"),
                F.substring("c_name", start, ln).alias("seg"),
            )
            for i, (start, ln) in enumerate(_PJ_SEGMENTS)
        ]
    )
    probe_keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("seg_id"),
                F.substring("c_name", start + d, ln).alias("seg"),
            )
            for i, (start, ln) in enumerate(_PJ_SEGMENTS)
            for d in range(-k, k + 1)
            if start + d >= 1
        ]
    )
    a = c.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        "c_nationkey",
        F.explode(seg_keys).alias("sk"),
    ).select("key_a", "name_a", "c_nationkey", "sk.seg_id", "sk.seg")
    b = c.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        "c_nationkey",
        F.explode(probe_keys).alias("sk"),
    ).select("key_b", "name_b", "c_nationkey", "sk.seg_id", "sk.seg")
    return (
        a.join(b, ["c_nationkey", "seg_id", "seg"])
        .where(F.col("key_a") != F.col("key_b"))
        .select(
            F.least("key_a", "key_b").alias("custkey_a"),
            F.greatest("key_a", "key_b").alias("custkey_b"),
            F.col("c_nationkey").alias("nationkey"),
            F.when(F.col("key_a") < F.col("key_b"), F.col("name_a"))
            .otherwise(F.col("name_b"))
            .alias("na"),
            F.when(F.col("key_a") < F.col("key_b"), F.col("name_b"))
            .otherwise(F.col("name_a"))
            .alias("nb"),
        )
        .dropDuplicates(["custkey_a", "custkey_b"])
        .withColumn("dist", F.levenshtein("na", "nb"))
        .where(F.col("dist") <= k)
        .select(
            "custkey_a",
            "custkey_b",
            "nationkey",
            F.col("dist").cast("long").alias("dist"),
        )
    )


@query("er_fuzzy_name_pairs_passjoin", oracle=_sql_pairs(ER_PAIR_MAX_DIST))
def er_fuzzy_name_pairs_passjoin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PassJoin candidates + exact verify — IDENTICAL output (and
    oracle) to ``er_fuzzy_name_pairs``, different candidate plan: the
    hash gate proves the pigeonhole algorithm equals the naive
    within-block quadratic cross-engine AND cross-algorithm.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    return er_fuzzy_pairs_passjoin_frame(c, ER_PAIR_MAX_DIST)
