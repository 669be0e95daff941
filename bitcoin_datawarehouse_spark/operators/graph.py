"""Connected components — canonical-document assignment for dedup.

Near-dup detection (MinHash/Jaccard/SimHash/embedding pairs) yields
an edge list; an LLM data pipeline then needs each *cluster* collapsed
to one canonical document.  That is connected components — an
iterative algorithm, the survey's canonical example of a computation
plain SQL can't express in one query.

Implementation: min-label propagation (the Pregel/GraphX "small-star"
baseline).  Every vertex starts labeled with its own id; each
superstep every vertex takes the min label over itself and its
neighbors; converged when no label changes.  Each superstep is one
shuffle (edges ⋈ labels, groupBy min); the driver only reads a single
"did anything change" count per superstep — supersteps are
driver-coordinated, data never is.  Iterations = graph diameter,
which for dedup clusters is tiny (near-dup clusters are dense).

The oracle is a recursive CTE computing min-over-reachable labels —
DuckDB's fixpoint recursion expresses the same algorithm, so even
this iterative operator gets a real cross-engine check.
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

MAX_SUPERSTEPS = 20


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_supersteps: int = MAX_SUPERSTEPS
) -> DataFrame:
    """(vertex) + (src, dst) undirected edges → (vertex, component)
    where component = min vertex id in the connected component.

    Labels are checkpointed via localCheckpoint each superstep to cut
    the exponentially-growing lineage an iterative plan otherwise
    accumulates (the standard iterative-DataFrame discipline).
    """
    both = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = vertices.select(
        F.col("vertex"), F.col("vertex").alias("component")
    ).localCheckpoint()
    changed = -1
    for _ in range(max_supersteps):
        neighbor_min = (
            both.join(labels, both["src"] == labels["vertex"])
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min("component").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("n_comp", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # truncated iteration would silently split one true component
        # into several "canonical" docs — wrong keep/drop decisions
        # with no signal.  A component's propagation distance is its
        # diameter; chain-shaped clusters can exceed any fixed cap, so
        # refuse rather than return unconverged labels.
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_supersteps} supersteps (labels still changing); "
            f"raise max_supersteps — needed iterations ≈ graph diameter"
        )
    return labels


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
