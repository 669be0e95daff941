"""Connected components — canonical-document assignment for dedup.

Near-dup detection (MinHash/Jaccard/SimHash/embedding pairs) yields
an edge list; an LLM data pipeline then needs each *cluster* collapsed
to one canonical document.  That is connected components — an
iterative algorithm, the survey's canonical example of a computation
plain SQL can't express in one query.

Implementation (round-8 rewrite, r7 VERDICT item 3): alternating
LARGE-STAR / SMALL-STAR contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — the CC-MR/GraphFrames
algorithm).  Each operation rewrites the EDGE SET:

* large-star(u): connect every neighbor LARGER than u to
  m = min(Γ(u) ∪ {u});
* small-star(u): orient edges to the larger endpoint, then connect
  every smaller neighbor (and u itself) to m = min(Γ(u)).

The fixed point of the alternation is a forest of stars rooted at
each component's minimum id — i.e. the answer — and is reached in
O(log n) rounds on real graphs (O(log² n) worst-case bound), vs the
O(diameter) supersteps of plain min-label propagation: a chain-shaped
component of 10⁴ docs (boilerplate paragraph chains in web crawls)
converges in ~10 rounds here where label propagation needs 10⁴
(pytest-pinned with a planted path).  Each round is two
groupBy-min + self-join passes over the CURRENT edge set — whose size
never exceeds the input edge count and contracts geometrically — and
the driver reads only a did-anything-change count per round;
supersteps are driver-coordinated, data never is.

The oracle is a recursive CTE computing min-over-reachable labels —
DuckDB's fixpoint recursion expresses the same result, so even this
iterative operator gets a real cross-engine check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _SQL_SHING,
    dedup_ngram_jaccard,
)
from bitcoin_datawarehouse_spark.functions.cachereg import (
    cache_tracked,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: star ROUNDS (one large + one small pass each) — measured growth is
#: ~3 rounds per decade of path length (13/16/19 at 10⁴/10⁵/10⁶,
#: SCALING.md round 8), so 40 covers ~10¹²-node chain components; the
#: converge-or-raise surface still refuses silently-split components.
MAX_SUPERSTEPS = 40


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star pass over a canonical (hi > lo) edge set: every
    neighbor LARGER than u connects to min(Γ(u) ∪ {u}).  Output stays
    canonical and self-loop-free by construction (emitted pairs are
    (v, m) with v > u ≥ m)."""
    both = e.select(
        F.col("hi").alias("u"), F.col("lo").alias("v")
    ).unionByName(e.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
    mins = (
        both.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        both.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star pass: orient each edge to its larger endpoint,
    then connect every smaller neighbor (and the endpoint itself) to
    the minimum neighbor.  Canonical in, canonical out."""
    mins = e.groupBy(F.col("hi").alias("u")).agg(F.min("lo").alias("m"))
    leaves = (
        e.join(mins, e["hi"] == mins["u"])
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    centers = mins.select(F.col("u").alias("hi"), F.col("m").alias("lo"))
    return leaves.unionByName(centers).distinct()


def _star_contraction(
    edges: DataFrame, max_rounds: int
) -> tuple[DataFrame, int]:
    """Alternate large-star / small-star over the canonicalized edge
    set until the fixed point (a forest of 2-level stars rooted at
    component minima).  Returns ``(star_edges, rounds_used)``.

    Each round's edge frame is eagerly localCheckpoint-ed — iterative
    lineage truncation (the PageRank superstep discipline; checkpoint
    blocks are RDD-owned, so the ContextCleaner reclaims them).
    Convergence check is exact set equality (count + anti-join count),
    never a checksum: a hash collision here would silently split a
    component.
    """
    e = (
        edges.select(
            F.greatest("src", "dst").alias("hi"),
            F.least("src", "dst").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )
    n_e = e.count()
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # the large-star output feeds TWO subtrees of small-star (the
        # per-node mins aggregate and the leaves join probe), and mins
        # feeds two more — checkpoint it so the large-star shuffle pass
        # runs once per round, not 2-3× (the CLAUDE.md shared-subgraph
        # rule, review-caught in this hot per-round loop)
        mid = _large_star(e).localCheckpoint()
        nxt = _small_star(mid).localCheckpoint()
        n_nxt = nxt.count()
        if n_nxt == n_e and nxt.join(e, ["hi", "lo"], "left_anti").isEmpty():
            return nxt, rounds
        e, n_e = nxt, n_nxt
    raise RuntimeError(
        f"connected_components did not converge within {max_rounds} "
        f"star rounds — the alternating-star bound is O(log² n), so "
        f"this indicates either an extreme graph or a bug; raise "
        f"max_supersteps"
    )


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_supersteps: int = MAX_SUPERSTEPS
) -> DataFrame:
    """(vertex) + (src, dst) undirected edges → (vertex, component)
    where component = min vertex id in the connected component.

    Round-8 implementation: alternating large-star/small-star edge
    contraction (module docstring) — O(log n) rounds instead of
    O(diameter) supersteps, so chain-shaped components no longer
    exhaust the iteration cap.  ``max_supersteps`` now bounds star
    ROUNDS (one large + one small pass each); the converge-or-raise
    surface is unchanged — truncated iteration would silently split
    one true component into several "canonical" docs, so refuse
    rather than return unconverged labels.

    At the fixed point every non-root vertex appears exactly once as
    the larger endpoint of a star edge pointing at its component's
    minimum; vertices absent from the star edges (isolated, or roots)
    are their own component.
    """
    star, _ = _star_contraction(edges, max_supersteps)
    return vertices.join(
        star.select(F.col("hi").alias("vertex"), F.col("lo").alias("root")),
        "vertex",
        "left",
    ).select(
        "vertex", F.coalesce("root", "vertex").alias("component")
    )


@query(
    "dedup_canonical_docs",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHING},
    common AS (
      SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shing s1
      JOIN shing s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common)
            >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS lbl FROM documents
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id,
           MIN(lbl) AS component,
           CAST(node = MIN(lbl) AS BOOLEAN) AS is_canonical
    FROM reach
    GROUP BY node
    """,
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document labeled with its near-dup cluster (min doc_id of
    the component) and a canonical flag — the keep/drop decision of a
    dedup pipeline.  Edges: 3-shingle Jaccard ≥ threshold; singletons
    are their own canonical."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vertex")
    )
    pairs = cache_tracked(
        dedup_ngram_jaccard(spark, sf_dir).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
    )
    pairs.count()  # eager fill: read by `paired` and every superstep
    # propagate only over vertices that appear in an edge — singleton
    # docs (the overwhelming majority of a deduped corpus) can never
    # change label, so they skip the iteration entirely and join back
    # at the end.  At 100 TB this shrinks the superstep working set
    # from |corpus| to |paired docs|.
    paired = (
        pairs.select(F.col("src").alias("vertex"))
        .unionByName(pairs.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    comp = connected_components(paired, pairs)
    return (
        docs.join(comp, "vertex", "left")
        .select(
            F.col("vertex").alias("doc_id"),
            F.coalesce("component", "vertex").alias("component"),
            (F.col("vertex") == F.coalesce("component", "vertex")).alias(
                "is_canonical"
            ),
        )
    )
