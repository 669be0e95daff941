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


def dim_ordered_dot_sq(cmat, qmat):
    """(dot n×m, c_sq n, q_sq m) accumulated DIMENSION BY DIMENSION —
    the identical left-to-right IEEE sequence the JVM ``zip_with``
    fold and DuckDB's ``list_reduce`` produce, so cosines built from
    these terms are bit-equal to the SQL oracles'.

    Every numpy cosine kernel in the repo (brute-force partial top-k,
    IVF coarse assignment, per-query rerank) MUST accumulate through
    this helper: the cross-engine parity contract lives in this loop
    order, and a "faster" formulation (``cmat @ qmat.T`` / einsum)
    changes summation order and silently breaks the value hash for
    just that query.  The three accumulators are independent, so
    fusing them into one pass is value-identical to separate loops.
    """
    import numpy as np

    n = len(cmat)
    m = len(qmat)
    dot = np.zeros((n, m))
    c_sq = np.zeros(n)
    q_sq = np.zeros(m)
    for j in range(cmat.shape[1]):
        c_sq += cmat[:, j] * cmat[:, j]
        q_sq += qmat[:, j] * qmat[:, j]
        dot += np.outer(cmat[:, j], qmat[:, j])
    return dot, c_sq, q_sq


def dot_col(a: Column, b: Column) -> Column:
    """Deterministic dot product of two double arrays."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm_col(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x * x)))


#: named so the round-7 recall harness (embeddings_extra.
#: similarity_ivf_recall) can embed the exact same semantics as a CTE
BF_TOPK_ORACLE = f"""
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
    """


@query("similarity_bruteforce_topk", oracle=BF_TOPK_ORACLE)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: query set (vec_id < 10) × all candidates.

    The distributed brute-force shape: the bounded query workload
    rides in an Arrow kernel's closure; each corpus partition scores
    its vectors against every query in one dim-ordered numpy pass
    (the identical left-to-right IEEE sequence as the JVM/DuckDB
    array fold, so cosines are bit-equal to the oracle's) and emits
    only its PARTIAL top-k per query — the union of per-partition
    winners provably contains the global winners, so the final window
    ranks a partitions×queries×k frame, never N×queries rows.
    Replaced a broadcast crossJoin evaluating N×Q interpreted 64-term
    folds plus a corpus-sized window sort (measured 8.07 → 1.14 s at
    sf10, 1.45 → 0.75 s at sf1).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # query workload BY RANK of vec_id (TakeOrdered), never a value
    # window (the CLAUDE.md codebook rule — strided scaled fixtures;
    # identical rows on dense fixtures, so the gate is bit-unchanged)
    qrows = sorted(
        emb.select("vec_id", "e")
        .orderBy("vec_id")
        .limit(N_QUERIES)
        .collect(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([int(r["vec_id"]) for r in qrows], dtype=np.int64)
    qmat = np.array([list(r["e"]) for r in qrows], dtype=np.float64)
    _, _, q_sq = dim_ordered_dot_sq(qmat[:0], qmat)
    qn = np.sqrt(q_sq)

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cand_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            cand = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf["e"]), dtype=np.float64)
            dot, cn, _ = dim_ordered_dot_sq(cmat, qmat)
            cos = dot / np.outer(np.sqrt(cn), qn)
            out_q, out_c, out_s = [], [], []
            for qi in range(len(qids)):
                keep = cand != qids[qi]
                ci, si = cand[keep], cos[keep, qi]
                order = np.lexsort((ci, -si))[:TOP_K]
                out_q.extend([qids[qi]] * len(order))
                out_c.extend(ci[order])
                out_s.extend(si[order])
            yield pd.DataFrame(
                {"query_id": out_q, "cand_id": out_c, "cosine": out_s}
            )

    par = spark.sparkContext.defaultParallelism
    partial = emb.repartition(par).mapInPandas(gen, schema)
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "cosine", "rnk")
    )


# Shared oracle CTE: per-vector sign-LSH signatures (elems → ±1
# projections → per-table bucket ints) — used verbatim by the buckets
# query and composed into the end-to-end ANN oracle below.  The
# builder is parameterized because bucket count is THE scale lever of
# sign-LSH (expected bucket size is N/2^bits): registered queries pin
# fixture-tuned widths so their oracles stay static strings, and each
# width is its own registered instance (e.g. the 8×12 wide variant of
# embedding dedup in embeddings_extra.py).
def sigs_sql(
    tables: int = None,  # noqa: RUF013 — late defaults
    bits: int = None,
    bits_expr: str = None,
) -> str:
    """``bits_expr`` (a self-contained SQL scalar expression, e.g. an
    uncorrelated subquery over the corpus count) substitutes for the
    integer width — the runtime-auto-width oracle computes the SAME
    corpus-count rule as ``auto_lsh_bits`` in SQL, so the oracle
    follows the Spark side at ANY scale factor instead of pinning one
    fixture width."""
    tables = LSH_TABLES if tables is None else tables
    bits = LSH_BITS_PER_TABLE if bits is None else bits
    # the width appears only as scalar terms, so an SQL expression
    # substitutes cleanly; DuckDB evaluates an uncorrelated scalar
    # subquery once
    if bits_expr is not None:
        hi_j = f"{tables} * ({bits_expr}) - 1"
        b = f"({bits_expr})"
    else:
        hi_j = str(tables * bits - 1)
        b = str(bits)
    # The projection sum is a DIM-ORDERED float64 left fold (list_zip
    # + list_reduce), not an order-independent decimal SUM over
    # exploded rows: the Spark side computes signatures per vector
    # inside an Arrow kernel whose accumulation order is the dimension
    # order, and an ordered IEEE fold is the cross-engine contract the
    # whole cosine family already uses (dot_col / _SQL_COS).  A
    # seedless list_reduce starts at the first element; the kernel
    # starts at 0.0 — identical, since 0.0 + x == x exactly.
    return f"""vsig AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    proj AS (
      SELECT vec_id, b.j,
             list_reduce(
               list_transform(
                 list_zip(e, range(1, len(e) + 1)),
                 p -> CASE WHEN ((instr('0123456789abcdef',
                                  substr(md5(CAST(b.j AS VARCHAR) || ':'
                                         || CAST(p[2] AS VARCHAR)), 1, 1))
                              - 1) & 1) = 1
                      THEN p[1] ELSE -p[1] END),
               (acc, x) -> acc + x) AS s
      FROM vsig
      CROSS JOIN (SELECT unnest(generate_series(0,
                    {hi_j})) AS j) b
    ),
    sigs AS (
      SELECT vec_id,
             j // {b} AS tbl,
             CAST(SUM(CASE WHEN s > 0
                           THEN 1 << (j % {b})
                           ELSE 0 END) AS BIGINT) AS bucket
      FROM proj
      GROUP BY vec_id, j // {b}
    )"""


_SQL_SIGS = sigs_sql()


@query(
    "similarity_lsh_buckets",
    oracle=f"""
    WITH {_SQL_SIGS}
    SELECT vec_id, CAST(tbl AS INT) AS tbl, bucket FROM sigs
    """,
)
def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH bucket assignment: LSH_TABLES tables x LSH_BITS_PER_TABLE bits (8x5 as configured)."""
    return lsh_bucket_assignments(spark, sf_dir)


def lsh_bucket_assignments(
    spark: SparkSession,
    sf_dir: str,
    tables: int = None,
    bits: int = None,
    carry_vec: bool = False,
) -> DataFrame:
    """(vec_id, tbl, bucket) sign-LSH assignments at a chosen width.

    Projection 'vectors' are ±1 Rademacher components derived from
    md5(bit:dim) — reproducible in any engine and as good as Gaussian
    for sign-LSH (public SRP-LSH literature).  Plan shape: explode to
    (vec, dim) × n_bits, two hash aggregates — all shuffle keys are
    uniform, no skew.

    ``bits`` is the scale knob: expected bucket size is N/2^bits per
    table, and in-bucket candidate pairs grow with bucket_size² — at a
    fixed width a 10× corpus costs ~100× in candidates (measured at
    sf1: 47M pairs from 20k vectors at 8×5), while near-identical
    vectors agree on almost every sign bit and keep colliding at any
    practical width, so widening buckets sheds junk candidates without
    losing true near-dups.  Size bits ≈ log2(N / target_bucket_size).

    One Arrow pass computes every table's bucket per vector: the ±1
    projection matrix is rebuilt from md5(bit:dim) inside the kernel
    (engine-reproducible), and the accumulation loops over DIMENSIONS
    in order — per (vector, bit) that is the same left-to-right IEEE
    sequence as the oracle's list_reduce fold, so the sign (and hence
    the bucket int) is bit-identical.  This replaced an
    explode×bits crossJoin + two hash aggregates whose intermediate
    was N·d·nbits rows (245M at sf1 for 8×12 — the dominant cost of
    the wide variant); the kernel's output is just N·tables rows and
    its FLOPs are vectorized over the batch.

    ``carry_vec=True`` additionally ships the (double-cast) vector on
    every assignment row — the embedding-dedup grid kernel's input,
    which removes the buckets⋈embeddings join (and its two exchanges)
    from that path entirely: the kernel already holds the vectors, so
    re-reading and re-shuffling the corpus to re-attach them is pure
    overhead (guide §2.4).  Assignment-only consumers keep the narrow
    3-column output.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    tables = LSH_TABLES if tables is None else tables
    bits = LSH_BITS_PER_TABLE if bits is None else bits
    nbits = tables * bits

    def _sign(j: int, i: int) -> float:
        h = hashlib.md5(f"{j}:{i}".encode()).hexdigest()
        return 1.0 if (int(h[0], 16) & 1) == 1 else -1.0

    def gen(batches):
        S = None  # (nbits × d) ±1 matrix, built on first batch
        weights = (np.left_shift(1, np.arange(bits))).astype(np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf["e"]), dtype=np.float64)
            n, d = mat.shape
            if S is None or S.shape[1] != d:
                S = np.array(
                    [[_sign(j, i) for i in range(1, d + 1)]
                     for j in range(nbits)],
                    dtype=np.float64,
                )
            acc = np.zeros((n, nbits))
            for i in range(d):  # dim-ordered fold, matches list_reduce
                acc += np.outer(mat[:, i], S[:, i])
            pos = (acc > 0).astype(np.int64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            frames = []
            for t in range(tables):
                blk = pos[:, t * bits:(t + 1) * bits]
                cols = {
                    "vec_id": ids,
                    "tbl": np.full(n, t, dtype=np.int32),
                    "bucket": blk @ weights,
                }
                if carry_vec:
                    cols["e"] = pdf["e"].reset_index(drop=True)
                frames.append(pd.DataFrame(cols))
            yield pd.concat(frames, ignore_index=True)

    # spread the one-split fixture parquet across cores before the
    # CPU-heavy kernel (CLAUDE.md rule)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    schema = "vec_id long, tbl int, bucket long"
    if carry_vec:
        schema += ", e array<double>"
    return emb.mapInPandas(gen, schema)


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
