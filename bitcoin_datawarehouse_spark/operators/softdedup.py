"""Soft deduplication: duplication-aware sampling instead of hard
drops (north-star extension).

Hard near-dedup (``dedup_canonical_docs``) keeps one canonical doc
per cluster and discards the rest — but recent work (SoftDeDup,
arXiv:2407.06654) shows reWEIGHTING duplicated content outperforms
removal: every document stays addressable, and the training sampler
downweights a cluster of m near-duplicates by 1/m so the cluster
contributes ~one document's worth of probability mass.

This implementation composes the registered cluster machinery with
the repo's deterministic-sampling idiom:

* cluster = the near-dup connected component of
  ``dedup_canonical_docs`` (3-shingle Jaccard edges → alternating-star
  contraction; the oracle embeds that gate's recursive-CTE text
  verbatim, the composite-oracle rule);
* weight = 1/cluster_size, realized as a DETERMINISTIC Bernoulli
  keep: u(doc) < 1/m with u the salted-md5 uniform
  (md5('soft' ‖ doc_id) — salted so it is independent of the split /
  mixture hashes, the CLAUDE.md truncation hazard), evaluated as the
  INTEGER test ``u32 · m < 2³²`` — no doubles anywhere, bit-exact
  cross-engine, and E[kept per cluster] = Σ 1/m = 1 exactly;
* singletons (u32 · 1 < 2³² always) are kept unconditionally —
  soft-dedup only ever downweights genuine duplication.

Scale shape: the pair/cluster stages are the canonical-docs plan
(bucketed equi-joins + O(log n) star rounds over PAIRED docs only);
on top of that this adds one component-sized hash aggregate and one
co-partitioned join-back — both keyed by ``component``, so they share
a single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.cachereg import cache_tracked
from bitcoin_datawarehouse_spark.operators import graph  # noqa: F401  (registers dedup_canonical_docs)
from bitcoin_datawarehouse_spark import registry as _registry
from bitcoin_datawarehouse_spark.registry import query

SOFT_SALT = "soft"

_SQL_SOFT_NIB = (
    f"(instr('0123456789abcdef', substr(md5('{SOFT_SALT}' ||"
    " CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"
)
_SQL_SOFT_U32 = " + ".join(
    "CAST(" + _SQL_SOFT_NIB.format(i=i + 1) + f" * {16 ** (7 - i)} AS BIGINT)"
    for i in range(8)
)


def soft_u32_col() -> F.Column:
    """The salted 32-bit uniform as a BIGINT column (Spark twin of
    ``_SQL_SOFT_U32``)."""
    hx = F.md5(
        F.concat(
            F.lit(SOFT_SALT), F.col("doc_id").cast("string")
        ).cast("binary")
    )
    nib = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(hx, i, 1)
    ) - 1
    return sum(
        (
            nib(i + 1).cast("long") * F.lit(16 ** (7 - i)).cast("long")
            for i in range(8)
        ),
        start=F.lit(0).cast("long"),
    )


@query("dedup_soft_weights")
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document with its near-dup cluster, the cluster size, and
    the duplication-aware Bernoulli keep decision (module docstring).
    ``kept`` realizes sampling weight 1/cluster_size deterministically;
    a training-prep pipeline filters on it (or consumes cluster_size
    directly as a loss/sampling weight)."""
    from bitcoin_datawarehouse_spark.operators.graph import (
        dedup_canonical_docs,
    )

    # component labels feed two subtrees of the one action (the size
    # aggregate + the join-back) — cache and let the aggregate fill it
    comp = cache_tracked(
        dedup_canonical_docs(spark, sf_dir).select("doc_id", "component")
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            "doc_id",
            "component",
            "cluster_size",
            (soft_u32_col() * F.col("cluster_size") < F.lit(4294967296))
            .alias("kept"),
        )
    )


def _soft_oracle() -> str:
    canon = _registry.ORACLES["dedup_canonical_docs"]
    # the embedded gate is a WITH RECURSIVE query: hoist the RECURSIVE
    # keyword to the outer WITH (SQL requires it there) and embed the
    # rest of the chain verbatim
    body = canon.strip()
    assert body.startswith("WITH RECURSIVE")
    inner = body[len("WITH RECURSIVE"):].strip()
    # split the final SELECT off the CTE chain so it can become a CTE
    sel_at = inner.rindex("SELECT node AS doc_id")
    ctes, final_sel = inner[:sel_at].rstrip().rstrip(","), inner[sel_at:]
    return f"""
    WITH RECURSIVE {ctes},
    canon AS ({final_sel}),
    soft_sizes AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM canon GROUP BY component
    )
    SELECT c.doc_id, c.component, s.cluster_size,
           ({_SQL_SOFT_U32.replace("doc_id", "c.doc_id")})
             * s.cluster_size < 4294967296 AS kept
    FROM canon c JOIN soft_sizes s USING (component)"""


_registry.ORACLES["dedup_soft_weights"] = _soft_oracle()
