"""Similarity search over embeddings (SURVEY.md §2.12).

Brute-force cosine top-k (the exactness baseline) and a sign-random-
projection LSH path (the 100 TB scale path) over the ``embeddings``
fixture (``vec_id``, ``embedding: array<float>[64]``, ``label``).

No Python in the row path: dot products are JVM-side
``zip_with``/``aggregate`` folds.  Cross-engine determinism: a
left-to-right double fold over an *array* is a fixed sequence of IEEE
ops, so Spark's ``aggregate`` and DuckDB's ``list_reduce`` produce
bit-identical dots/norms (unlike a row-wise SUM, whose order is
engine-dependent).  LSH projection signs come from md5 (identical in
both engines) rather than an engine-native RNG; the row-wise
projection sums use exact DECIMAL accumulation.

Scale design: brute force is O(Q×N×d) — fine for reranking a
candidate set, wrong as the primary search at 100 TB.  The LSH path
hashes every vector into LSH_TABLES independent LSH_BITS_PER_TABLE-bit sign-projection tables;
search cost becomes per-bucket joins (expected bucket size N/2^bits per table), and exact cosine reranks only the union of colliding
candidates.  IVF (k-means coarse quantizer + per-centroid inverted
lists) is the next step up and shares the same join shape — bucket
key join then rerank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

N_QUERIES = 10  # vec_id < 10 act as the query set in fixture queries
TOP_K = 5
# 8 tables × 5 bits: measured recall@5 ≈ 0.54 on the fixture with a
# candidate set ~25% of the corpus; at production scale the
# bucket-count/table-count trade-off is retuned per corpus size
LSH_TABLES = 8
LSH_BITS_PER_TABLE = 5

_DEC = "decimal(38,30)"


def _fold_sum(arr: Column) -> Column:
    """Left-to-right double fold — deterministic op sequence, mirrored
    by DuckDB's list_reduce."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot_col(a: Column, b: Column) -> Column:
    """Deterministic dot product of two double arrays."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm_col(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


@query(
    "similarity_bruteforce_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x),
                              (acc, x) -> acc + x)) AS nrm
      FROM v
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_reduce(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]),
                         (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
      FROM n q
      JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, cand_id
             ) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: query set (vec_id < 10) × all candidates.

    Plan: broadcast the tiny query side, evaluate the 64-element fold
    per pair inside codegen, then a per-query window top-k.  This is
    the rerank kernel the LSH/IVF paths reuse on their candidate sets.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    emb = emb.withColumn("nrm", norm_col(F.col("e")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("cand_id")
    )
    scored = pairs.select(
        "query_id",
        "cand_id",
        (
            dot_col(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rnk")
    )


# Shared oracle CTE: per-vector sign-LSH signatures (elems → ±1
# projections → per-table bucket ints) — used verbatim by the buckets
# query and composed into the end-to-end ANN oracle below.
_SQL_SIGS = f"""elems AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS i,
             unnest(CAST(embedding AS DOUBLE[])) AS x
      FROM embeddings
    ),
    proj AS (
      SELECT e.vec_id, b.j,
             CAST(SUM(CAST(
               CASE WHEN ((instr('0123456789abcdef',
                                 substr(md5(CAST(b.j AS VARCHAR) || ':'
                                        || CAST(e.i AS VARCHAR)), 1, 1))
                           - 1) & 1) = 1
                    THEN e.x ELSE -e.x END
               AS DECIMAL(38,30))) AS DOUBLE) AS s
      FROM elems e
      CROSS JOIN (SELECT unnest(generate_series(0,
                    {LSH_TABLES * LSH_BITS_PER_TABLE - 1})) AS j) b
      GROUP BY 1, 2
    ),
    sigs AS (
      SELECT vec_id,
             j // {LSH_BITS_PER_TABLE} AS tbl,
             CAST(SUM(CASE WHEN s > 0
                           THEN 1 << (j % {LSH_BITS_PER_TABLE})
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM proj
      GROUP BY vec_id, j // {LSH_BITS_PER_TABLE}
    )"""


@query(
    "similarity_lsh_buckets",
    oracle=f"""
    WITH {_SQL_SIGS}
    SELECT vec_id, CAST(tbl AS INT) AS tbl, bucket FROM sigs
    """,
)
def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH bucket assignment: LSH_TABLES tables x LSH_BITS_PER_TABLE bits (8x5 as configured).

    Projection 'vectors' are ±1 Rademacher components derived from
    md5(bit:dim) — reproducible in any engine and as good as Gaussian
    for sign-LSH (public SRP-LSH literature).  Plan shape: explode to
    (vec, dim) × n_bits, two hash aggregates — all shuffle keys are
    uniform, no skew.
    """
    # spread before the 64× explode and the ×40-bit cross join — on the
    # one-split fixture the 5M-row expansion would otherwise build (and
    # partially aggregate) on a single task
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .select("vec_id", (F.col("pos") + 1).alias("i"), F.col("col").alias("x"))
    )
    nbits = LSH_TABLES * LSH_BITS_PER_TABLE
    bits = spark.range(nbits).select(F.col("id").cast("int").alias("j"))
    signed = F.expr(
        "CASE WHEN ((instr('0123456789abcdef', "
        "substr(md5(cast(concat(cast(j AS string), ':', cast(i AS string)) AS binary)), 1, 1)) "
        "- 1) & 1) = 1 THEN x ELSE -x END"
    )
    proj = (
        emb.crossJoin(F.broadcast(bits))
        .groupBy("vec_id", "j")
        .agg(F.sum(signed.cast(_DEC)).cast("double").alias("s"))
    )
    return (
        proj.withColumn("tbl", F.floor(F.col("j") / LSH_BITS_PER_TABLE).cast("int"))
        .groupBy("vec_id", "tbl")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0,
                    F.expr(f"shiftleft(1, j % {LSH_BITS_PER_TABLE})"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("bucket")
        )
        .select("vec_id", "tbl", "bucket")
    )


@query(
    "similarity_ann_lsh",
    oracle=f"""
    WITH {_SQL_SIGS},
    qb AS (
      SELECT vec_id AS query_id, tbl, bucket FROM sigs
      WHERE vec_id < {N_QUERIES}
    ),
    cands AS (
      SELECT DISTINCT qb.query_id, s.vec_id AS cand_id
      FROM qb JOIN sigs s ON s.tbl = qb.tbl AND s.bucket = qb.bucket
      WHERE s.vec_id <> qb.query_id
    ),
    n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_reduce(
               list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
               (acc, x) -> acc + x)) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT c.query_id, c.cand_id,
             list_reduce(list_transform(list_zip(q.e, d.e),
                                        p -> p[1] * p[2]),
                         (acc, x) -> acc + x) / (q.nrm * d.nrm) AS cosine
      FROM cands c
      JOIN n q ON q.vec_id = c.query_id
      JOIN n d ON d.vec_id = c.cand_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, cand_id
             ) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN: LSH-bucket candidate generation + exact rerank.

    Candidates = vectors sharing any of the LSH_TABLES per-table
    buckets with the query; exact cosine reranks candidates only.
    tests/test_similarity.py measures recall against
    similarity_bruteforce_topk.  The composition is deterministic end
    to end (md5 projections, dim-ordered folds, cand_id tie-break), so
    the full pipeline is hash-checked against a DuckDB oracle composed
    of the same three stages.
    """
    buckets = similarity_lsh_buckets(spark, sf_dir)
    qb = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    cands = (
        F.broadcast(qb)
        .join(buckets.withColumnRenamed("vec_id", "cand_id"), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    return _rerank_candidates(spark, sf_dir, cands)


def _rerank_candidates(
    spark: SparkSession, sf_dir: str, cands: DataFrame
) -> DataFrame:
    """Exact cosine rerank of (query_id, cand_id) pairs → top-k rows
    with deterministic tie-breaks (shared by the ANN variants)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).withColumn("nrm", norm_col(F.col("e")))
    q = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select(
            "query_id",
            "cand_id",
            (
                dot_col(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rnk")
    )


@query(
    "similarity_ann_multiprobe",
    oracle=f"""
    WITH {_SQL_SIGS},
    qb AS (
      SELECT vec_id AS query_id, tbl, bucket FROM sigs
      WHERE vec_id < {N_QUERIES}
    ),
    probes AS (
      SELECT qb.query_id, qb.tbl,
             CASE WHEN p.k < 0 THEN qb.bucket
                  ELSE xor(qb.bucket, CAST(1 << p.k AS BIGINT)) END AS bucket
      FROM qb CROSS JOIN (SELECT unnest(generate_series(-1,
                    {LSH_BITS_PER_TABLE - 1})) AS k) p
    ),
    cands AS (
      SELECT DISTINCT pr.query_id, s.vec_id AS cand_id
      FROM probes pr JOIN sigs s ON s.tbl = pr.tbl AND s.bucket = pr.bucket
      WHERE s.vec_id <> pr.query_id
    ),
    n AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_reduce(
               list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
               (acc, x) -> acc + x)) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT c.query_id, c.cand_id,
             list_reduce(list_transform(list_zip(q.e, d.e),
                                        p -> p[1] * p[2]),
                         (acc, x) -> acc + x) / (q.nrm * d.nrm) AS cosine
      FROM cands c
      JOIN n q ON q.vec_id = c.query_id
      JOIN n d ON d.vec_id = c.cand_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, cand_id
             ) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def similarity_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe ANN (public multi-probe LSH literature, Lv et al.
    VLDB'07 shape): each query probes its own bucket PLUS every bucket
    at Hamming distance 1 per table (flip each of the
    LSH_BITS_PER_TABLE bits), then the exact rerank runs on the
    enlarged candidate set.

    Recall rises without adding tables — the probe fan-out multiplies
    only the tiny broadcast query side (queries × tables × (1+bits)
    rows), never the corpus side, so the join cost grows with
    candidates actually retrieved, not with index size.  Candidate set
    is a strict superset of ``similarity_ann_lsh``'s, so recall is
    monotonically ≥ (pytest-asserted alongside the measured values).
    """
    buckets = similarity_lsh_buckets(spark, sf_dir)
    qb = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    probe_buckets = F.array(
        F.col("bucket"),
        *[
            F.expr(f"bucket ^ CAST({1 << k} AS BIGINT)")
            for k in range(LSH_BITS_PER_TABLE)
        ],
    )
    probes = qb.select(
        "query_id", "tbl", F.explode(probe_buckets).alias("bucket")
    )
    cands = (
        F.broadcast(probes)
        .join(buckets.withColumnRenamed("vec_id", "cand_id"), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    return _rerank_candidates(spark, sf_dir, cands)
