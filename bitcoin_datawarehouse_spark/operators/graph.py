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

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _SQL_SHING,
    dedup_ngram_jaccard,
)
from bitcoin_datawarehouse_spark.functions.localframe import local_rows_df
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: star ROUNDS (one large + one small pass each) — measured growth is
#: ~3 rounds per decade of path length (13/16/19 at 10⁴/10⁵/10⁶,
#: SCALING.md round 8), so 40 covers ~10¹²-node chain components; the
#: converge-or-raise surface still refuses silently-split components.
MAX_SUPERSTEPS = 40

#: edge sets at or below this size solve as ONE driver-side
#: union-find instead of the iterative star contraction (r12
#: optimization: the distributed loop pays ~3 scheduling barriers per
#: round × O(log n) rounds — pure per-job floor for graphs this
#: small; the same auto-regime discipline as bpe.py's
#: BPE_LOCAL_VOCAB_MAX).  Sized to stay driver-trivial: 200k edges ≈
#: 3 MB over the Arrow collect path, union-find is linear, and the
#: resulting star-edge frame (≤ 2·|E| rows) broadcasts.  Production
#: dup-pair sets past this take the unchanged distributed path.
CC_LOCAL_EDGE_MAX = 200_000


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star pass over a canonical (hi > lo) edge set: every
    neighbor LARGER than u connects to min(Γ(u) ∪ {u}).  Output stays
    canonical and self-loop-free by construction (emitted pairs are
    (v, m) with v > u ≥ m).

    r12 shape: per-node minima via a window over the SAME
    hash-clustering the old groupBy used — each row gets its group's
    min in one exchange, where the groupBy+re-join form shuffled the
    edge set twice (once into the aggregate, once into the join) per
    pass.  Same math, one exchange fewer."""
    both = e.select(
        F.col("hi").alias("u"), F.col("lo").alias("v")
    ).unionByName(e.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
    m = F.least(F.min("v").over(W.partitionBy("u")), F.col("u"))
    return (
        both.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star pass: orient each edge to its larger endpoint,
    then connect every smaller neighbor (and the endpoint itself) to
    the minimum neighbor.  Canonical in, canonical out.

    Same window rewrite as :func:`_large_star`: the per-``hi`` min
    rides a window instead of a groupBy+join, so the pass reads its
    input ONCE — which also removes the mid-round localCheckpoint the
    join form needed (the large-star output now feeds exactly one
    subtree).  ``centers`` emits one (hi, m) per ROW; the closing
    ``distinct`` (already required by the contraction) collapses them
    to one per group, identical to the old mins-frame output."""
    withm = e.withColumn("m", F.min("lo").over(W.partitionBy("hi")))
    leaves = withm.filter(F.col("lo") != F.col("m")).select(
        F.col("lo").alias("hi"), F.col("m").alias("lo")
    )
    centers = withm.select("hi", F.col("m").alias("lo"))
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
    e = _canon_edges(edges)
    n_e = e.count()
    return _star_rounds(e, n_e, max_rounds)


def _canon_edges(edges: DataFrame) -> DataFrame:
    """Canonicalize (src, dst) to a deduped self-loop-free (hi > lo)
    edge set, eagerly localCheckpoint-ed (the loop below and the
    local-solve collect both re-read it)."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("hi"),
            F.least("src", "dst").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )


def _star_rounds(
    e: DataFrame, n_e: int, max_rounds: int
) -> tuple[DataFrame, int]:
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # both star passes now read their input exactly once (window
        # minima — see _large_star/_small_star), so one round is ONE
        # materialization: the old per-round mid-checkpoint of the
        # large-star output is gone with the join that needed it
        nxt = _small_star(_large_star(e)).localCheckpoint()
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


def _local_star_edges(e: DataFrame) -> DataFrame:
    """Driver-side union-find over a BOUNDED canonical edge set
    (≤ :data:`CC_LOCAL_EDGE_MAX` rows, enforced by the caller):
    returns the same (hi = non-root vertex, lo = component minimum)
    star-edge frame the distributed contraction converges to.  Two
    narrow long columns ride the Arrow ``toPandas`` path; the result
    is a star-forest-sized control frame (one row per non-root
    vertex), built through the sanctioned single-partition
    local-frame helper."""
    pdf = e.toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for hi, lo in zip(pdf["hi"], pdf["lo"]):
        ra, rb = find(int(hi)), find(int(lo))
        if ra != rb:
            # attach the larger root under the smaller: roots stay
            # component minima, matching the star fixed point
            parent[max(ra, rb)] = min(ra, rb)
    # every key of ``parent`` is a non-root by construction (a vertex
    # gains an entry only when attached UNDER a strictly smaller root,
    # and parents only ever decrease), so find(v) != v is guaranteed —
    # no guard, and one find per vertex (r12 ADVICE)
    rows = [(v, find(v)) for v in list(parent)]
    return local_rows_df(e.sparkSession, rows, "hi long, lo long")


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_supersteps: int = MAX_SUPERSTEPS,
    local_edge_max: int = CC_LOCAL_EDGE_MAX,
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

    r12 auto-regime: edge sets at or below ``local_edge_max`` solve
    as one driver-side union-find (:func:`_local_star_edges`) — the
    iterative loop's per-round scheduling barriers are pure overhead
    for driver-trivial graphs (the ``bpe_train_auto`` local/
    distributed switch discipline).  The gating count is the same
    canonical-edge count the loop needed anyway; both paths produce
    the identical star-edge set (pytest-pinned), so the surface and
    the converge-or-raise contract are unchanged.
    """
    star = star_edges(edges, max_supersteps, local_edge_max)
    return vertices.join(
        star.select(F.col("hi").alias("vertex"), F.col("lo").alias("root")),
        "vertex",
        "left",
    ).select(
        "vertex", F.coalesce("root", "vertex").alias("component")
    )


def star_edges(
    edges: DataFrame,
    max_supersteps: int = MAX_SUPERSTEPS,
    local_edge_max: int = CC_LOCAL_EDGE_MAX,
) -> DataFrame:
    """(hi = non-root vertex, lo = its component's minimum id) star
    forest of the undirected (src, dst) edge set — the shared core of
    :func:`connected_components`, exposed so callers that only need a
    LABEL JOIN (every vertex absent from the star is its own
    component) can skip building an explicit vertex frame: the star
    edges alone determine every label under a left-join + coalesce,
    because paired ROOTS coalesce to themselves exactly like isolated
    vertices do."""
    e = _canon_edges(edges)
    n_e = e.count()
    if n_e <= local_edge_max:
        return _local_star_edges(e)
    return _star_rounds(e, n_e, max_supersteps)[0]


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
    pairs = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    # r12: join the documents against the STAR EDGES directly — a
    # paired root coalesces to itself exactly like a singleton, so
    # the old explicit `paired` vertex frame (a union + distinct
    # shuffle reading the pair cache twice, which in turn forced a
    # tracked cache + its eager-fill action on the pair frame) added
    # nothing: star_edges reads the pairs exactly once
    # (_canon_edges), so no cache is needed at all.  Singletons — the
    # overwhelming majority of a deduped corpus at 100 TB — still
    # never enter the contraction: the star works on pair-touched
    # vertices only.
    star = star_edges(pairs)
    return (
        docs.join(
            star.select(
                F.col("hi").alias("vertex"), F.col("lo").alias("root")
            ),
            "vertex",
            "left",
        )
        .select(
            F.col("vertex").alias("doc_id"),
            F.coalesce("root", "vertex").alias("component"),
            (F.col("vertex") == F.coalesce("root", "vertex")).alias(
                "is_canonical"
            ),
        )
    )
