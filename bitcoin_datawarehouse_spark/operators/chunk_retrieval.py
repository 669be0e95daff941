"""Chunk-level ANN retrieval — the RAG serving loop composed from
three gated parts (r8 VERDICT item 4): sliding-window chunking
(``text_chunk_windows``), a deterministic chunk featurizer (the
SQL-expressible stub-featurizer discipline of
``multimodal_feature_extract``), and the persisted bucketed IVF index
(``operators/ivf_index.py``), finished with the per-doc best-chunk
reduction every retrieval stack runs between chunk hits and document
results.

Pipeline (one registered gate, ``similarity_chunk_retrieval``):

1. **Chunk** — the registered ``text_chunk_windows`` frame verbatim
   (the composite-oracle precedent: its CTE is embedded unchanged, so
   this composite can never drift from what the chunking gate proves).
2. **Embed** — per chunk a ``CHUNK_EMB_DIM``-bin token-hash TF vector:
   dim(token) = first md5 byte of the token mod D, value = token
   count in the chunk.  One Arrow kernel over the chunk frame
   (hashlib md5 ≡ SQL md5, integer counts → the vector is EXACT, so
   the only float surface is the cosine fold both engines share).
   Deliberately SQL-expressible — a production encoder swaps in at
   this step and the gate falls back rows-only, exactly the
   multimodal featurizer contract.
3. **Index** — chunk vectors get composite ids
   ``vec_id = doc_id · 2²⁰ + chunk_ix`` and build the persisted
   bucketed ``IvfIndex`` (scratch-warehouse discipline of
   ``similarity_ivf_index_topk``).  Centroids are the
   ``IVF_N_CENTROIDS`` smallest vec_ids selected BY RANK
   (TakeOrdered), never a ``< K`` value window — chunk ids are sparse
   by construction and scaled fixtures stride doc_ids (the CLAUDE.md
   codebook rule).
4. **Serve** — the query workload is the FIRST chunk (chunk_ix = 0)
   of the ``N_CHUNK_QUERY_DOCS`` smallest doc_ids (rank-selected);
   ``IvfIndex.search(..., exclude_group_div=2²⁰)`` drops the query's
   own document IN the candidate join (slots are never wasted on
   self-hits), probes ``IVF_NPROBE`` lists, and reranks top
   ``TOP_K`` chunks with the shared dim-ordered kernel.
5. **Reduce** — chunk hits collapse to documents: per (query, doc)
   keep the best chunk (cosine desc, chunk_ix asc), then rank docs
   per query (cosine desc, doc_id asc).  ``start_tok`` is
   reconstructed arithmetically (chunk_ix · CHUNK_STRIDE — exact by
   the chunking contract), so every result row maps back to its
   source span without a join (pinned in pytest against the actual
   chunk frame).

Scale: chunking is map-only, the featurizer is one Arrow pass, the
index build is the one corpus-sized exchange (paid once, bucketed by
centroid so every later search bucket-prunes), and serving cost is
probed-lists-sized per query — the same 100 TB shape as the vector
gates, now over a corpus that is chunks (≈ tokens/stride per doc)
rather than documents.

Oracle: the full chain in SQL — the chunk CTE verbatim, the
featurizer as UNNEST + md5-byte GROUP BY + an ordered zero-filled
``list()``, then the IVF CTE skeleton of ``_ivf_topk_oracle`` over
the chunk vectors with the doc-exclusion predicate, and the two-level
reduction windows.  Every count is an integer and every cosine rides
the pinned cross-engine fold, so the gate hash-checks end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark import registry as _registry
from bitcoin_datawarehouse_spark.operators.embeddings_extra import (
    IVF_N_CENTROIDS,
    IVF_NPROBE,
)
from bitcoin_datawarehouse_spark.operators.similarity import TOP_K
from bitcoin_datawarehouse_spark.operators.text_stats import (
    CHUNK_STRIDE,
    text_chunk_windows,
)
from bitcoin_datawarehouse_spark.registry import query

#: token-hash TF dimensions of the stub chunk featurizer
CHUNK_EMB_DIM = 16
#: chunk ids compose as doc_id * CHUNK_VEC_MOD + chunk_ix
CHUNK_VEC_MOD = 1 << 20
#: how many (smallest, by rank) doc_ids contribute their first chunk
#: as the query workload
N_CHUNK_QUERY_DOCS = 5


def chunk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, e): token-hash TF vectors for every chunk, one Arrow
    kernel over the registered chunk frame.  dim(token) = first md5
    byte mod ``CHUNK_EMB_DIM`` (hashlib ≡ SQL md5), value = count —
    integer-exact, so the vector itself has no float surface."""
    import hashlib

    chunks = text_chunk_windows(spark, sf_dir).select(
        (
            F.col("doc_id") * F.lit(CHUNK_VEC_MOD) + F.col("chunk_ix")
        ).alias("vec_id"),
        "chunk_text",
    )

    def gen(batches):
        import pandas as pd

        dim_memo: dict[str, int] = {}

        def dim(tok: str) -> int:
            d = dim_memo.get(tok)
            if d is None:
                d = hashlib.md5(tok.encode()).digest()[0] % CHUNK_EMB_DIM
                dim_memo[tok] = d
            return d

        for pdf in batches:
            ids, vecs = [], []
            for vid, text in zip(pdf["vec_id"], pdf["chunk_text"]):
                v = [0.0] * CHUNK_EMB_DIM
                for tok in text.split(" "):
                    v[dim(tok)] += 1.0
                ids.append(vid)
                vecs.append(v)
            yield pd.DataFrame({"vec_id": ids, "e": vecs})

    return chunks.mapInPandas(gen, "vec_id bigint, e array<double>")


def _chunk_retrieval_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bitcoin_datawarehouse_spark.operators.ivf_index import IvfIndex
    from bitcoin_datawarehouse_spark.pipeline.catalog import (
        Warehouse,
        scratch_root,
    )

    from bitcoin_datawarehouse_spark.functions.cachereg import (
        cache_tracked,
    )

    # the featurizer kernel feeds FOUR actions of the build+serve
    # sequence (centroid TakeOrdered, codebook write, lists write,
    # query selection) — cache_tracked + eager fill per the CLAUDE.md
    # shared-subgraph rule (released centrally by bench/check_oracle;
    # production builds once and serves from the persisted index)
    emb = cache_tracked(chunk_embeddings(spark, sf_dir))
    emb.count()

    # centroids BY RANK of vec_id (TakeOrdered — never a `< K` value
    # window over sparse composite ids; CLAUDE.md codebook rule)
    cent = (
        emb.orderBy("vec_id")
        .limit(IVF_N_CENTROIDS)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("e").alias("ce"),
        )
    )

    # residue/concurrency rules owned by catalog.scratch_root
    scratch = scratch_root("bds_chunkivf", sf_dir)
    idx = IvfIndex(
        Warehouse(spark, scratch),
        schema="ann_index",
        name="chunks",
        nprobe=IVF_NPROBE,
    )
    idx.build(emb, centroids=cent)

    # query workload: the chunk_ix = 0 vector of the N smallest
    # doc_ids — rank-selected (TakeOrdered), query_id = vec_id
    qdocs = (
        emb.filter(F.col("vec_id") % CHUNK_VEC_MOD == 0)
        .orderBy("vec_id")
        .limit(N_CHUNK_QUERY_DOCS)
    )
    queries = qdocs.select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )

    hits = idx.search(
        queries,
        top_k=TOP_K,
        exclude_self=False,
        exclude_group_div=CHUNK_VEC_MOD,
    )

    # reduce: best chunk per (query, doc), then rank docs per query
    per_doc = hits.select(
        F.expr(f"query_id DIV {CHUNK_VEC_MOD}").alias("query_doc"),
        F.expr(f"cand_id DIV {CHUNK_VEC_MOD}").alias("doc_id"),
        (F.col("cand_id") % CHUNK_VEC_MOD).alias("chunk_ix"),
        "cosine",
    )
    w_best = W.partitionBy("query_doc", "doc_id").orderBy(
        F.col("cosine").desc(), F.col("chunk_ix")
    )
    w_rank = W.partitionBy("query_doc").orderBy(
        F.col("cosine").desc(), F.col("doc_id")
    )
    return (
        per_doc.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .withColumn("rnk", F.row_number().over(w_rank))
        .select(
            F.col("query_doc").cast("bigint").alias("query_doc"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("chunk_ix").cast("bigint").alias("chunk_ix"),
            (F.col("chunk_ix") * CHUNK_STRIDE)
            .cast("bigint")
            .alias("start_tok"),
            "cosine",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def _chunk_retrieval_oracle() -> str:
    """The full chain in SQL: chunk CTE verbatim → token-hash TF
    vectors → IVF (rank-selected centroids, assignment, probes,
    doc-excluded candidates, cosine rerank) → two-level reduction."""
    chunks_sql = _registry.ORACLES["text_chunk_windows"]
    D = CHUNK_EMB_DIM
    M = CHUNK_VEC_MOD
    byte0 = (
        "((instr('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substr(md5(t), 2, 1)) - 1))"
    )
    cos = (
        "list_reduce(list_transform(list_zip({a}.e, {b}.e),"
        " p -> p[1] * p[2]), (acc, x) -> acc + x) / ({a}.nrm * {b}.nrm)"
    )
    return f"""
    WITH chv AS (
      SELECT doc_id * {M} + chunk_ix AS vec_id, chunk_text
      FROM ({chunks_sql})
    ),
    ctoks AS (
      SELECT vec_id, unnest(string_split(chunk_text, ' ')) AS t
      FROM chv
    ),
    ccnt AS (
      SELECT vec_id, {byte0} % {D} AS dim, COUNT(*) AS cnt
      FROM ctoks GROUP BY 1, 2
    ),
    dims AS (SELECT unnest(generate_series(0, {D - 1})) AS dim),
    cvec AS (
      SELECT v.vec_id,
             list(CAST(COALESCE(c.cnt, 0) AS DOUBLE) ORDER BY d.dim)
               AS e
      FROM (SELECT DISTINCT vec_id FROM chv) v
      CROSS JOIN dims d
      LEFT JOIN ccnt c ON c.vec_id = v.vec_id AND c.dim = d.dim
      GROUP BY v.vec_id
    ),
    n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x),
                              (acc, x) -> acc + x)) AS nrm
      FROM cvec
    ),
    cent AS (SELECT * FROM n ORDER BY vec_id LIMIT {IVF_N_CENTROIDS}),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT x.vec_id, c.vec_id AS centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY {cos.format(a="x", b="c")} DESC, c.vec_id
               ) AS rn
        FROM n x CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    qset AS (
      SELECT * FROM n
      WHERE vec_id % {M} = 0
      ORDER BY vec_id LIMIT {N_CHUNK_QUERY_DOCS}
    ),
    probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {cos.format(a="q", b="c")} DESC, c.vec_id
               ) AS rn
        FROM qset q CROSS JOIN cent c
      ) WHERE rn <= {IVF_NPROBE}
    ),
    cands AS (
      SELECT DISTINCT p.query_id, a.vec_id AS cand_id
      FROM probes p
      JOIN assign a ON a.centroid_id = p.centroid_id
      WHERE a.vec_id // {M} <> p.query_id // {M}
    ),
    chunk_hits AS (
      SELECT query_id, cand_id, cosine FROM (
        SELECT cd.query_id, cd.cand_id,
               {cos.format(a="q", b="c")} AS cosine,
               ROW_NUMBER() OVER (
                 PARTITION BY cd.query_id
                 ORDER BY {cos.format(a="q", b="c")} DESC, cd.cand_id
               ) AS rnk
        FROM cands cd
        JOIN n q ON q.vec_id = cd.query_id
        JOIN n c ON c.vec_id = cd.cand_id
      ) WHERE rnk <= {TOP_K}
    ),
    per_doc AS (
      SELECT query_id // {M} AS query_doc,
             cand_id // {M} AS doc_id,
             cand_id % {M} AS chunk_ix,
             cosine,
             ROW_NUMBER() OVER (
               PARTITION BY query_id // {M}, cand_id // {M}
               ORDER BY cosine DESC, cand_id % {M}
             ) AS rn
      FROM chunk_hits
    )
    SELECT CAST(query_doc AS BIGINT) AS query_doc,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(chunk_ix AS BIGINT) AS chunk_ix,
           CAST(chunk_ix * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
           cosine,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY query_doc ORDER BY cosine DESC, doc_id
           ) AS INT) AS rnk
    FROM per_doc WHERE rn = 1
    """


@query("similarity_chunk_retrieval")
def similarity_chunk_retrieval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chunk-level retrieval end to end: chunk → embed → persisted
    IVF index → per-query top-chunk search (own document excluded) →
    per-doc best-chunk reduction.  Full design + oracle notes in the
    module docstring; (query_doc, doc_id, chunk_ix, start_tok,
    cosine, rnk) per result document."""
    return _chunk_retrieval_impl(spark, sf_dir)


_registry.ORACLES["similarity_chunk_retrieval"] = (
    _chunk_retrieval_oracle()
)
