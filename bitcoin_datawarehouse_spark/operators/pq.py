"""Product quantization (PQ) for the ANN family (Jégou et al., IEEE
TPAMI 2011 — "Product quantization for nearest neighbor search").

At 100 TB the corpus' raw vectors don't fit hot storage next to the
index: PQ splits each d-dim vector into M subvectors, quantizes each
against a per-subspace codebook, and stores only the M code ids —
here 64 dims → 8 subspaces × 16 codes = ONE packed BIGINT per vector
(64 doubles → 4 bytes, a 128× compression).  Search then runs ADC
(asymmetric distance computation): the query stays exact, each
candidate's distance is approximated as the sum of per-subspace
query→assigned-centroid distances, looked up from an M×K table built
once per query — 8 lookups + 7 adds instead of a 64-term fold.  This
is the IVF-PQ layout's compression half; the coarse-quantizer half
(inverted lists, bucket pruning) is ``ivf_index.py`` — composing
them is pointing IvfIndex's list payload at ``pq_code`` instead of
``e``.

Like the IVF family, the registered queries use the deterministic
smallest-vec_ids sub-codebooks so the gate stays hash-checkable; a
trained per-subspace ``kmeans_fit`` codebook drops in unchanged
(the assignment/tie contract is the argmin below either way).

Engine-parity contract: every per-subspace squared distance is a
dimension-ordered accumulation of (x_j - c_j)² — the identical
left-to-right IEEE sequence as DuckDB's ``list_reduce`` fold — and
the 8-term ADC total is the left-associated sum d0+d1+…+d7 on both
sides, so ranks (ties to the smallest cand_id) agree bit-for-bit.
Integer code packing is exact arithmetic (code_m << 4m).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

PQ_M = 8  #: subspaces
PQ_SUB_DIM = 8  #: dims per subspace (M × SUB_DIM = the 64-dim contract)
PQ_K = 16  #: codes per subspace (fits a 4-bit nibble of the packed id)


def _collect_subcodebooks(emb: DataFrame):
    """(M, K, SUB_DIM) numpy sub-codebooks from the deterministic
    smallest-vec_ids seed rows — the model artifact every PQ kernel
    ships in its closure (8×16×8 doubles; a trained codebook is the
    same shape)."""
    import numpy as np

    rows = sorted(
        emb.filter(F.col("vec_id") < PQ_K).collect(),
        key=lambda r: r["vec_id"],
    )
    assert len(rows) == PQ_K, "corpus smaller than the codebook seed"
    full = np.array([list(r["e"]) for r in rows], dtype=np.float64)
    return np.stack(
        [
            full[:, m * PQ_SUB_DIM : (m + 1) * PQ_SUB_DIM]
            for m in range(PQ_M)
        ]
    )


def _sub_d2(xmat, cmat):
    """(len(x), len(c)) squared L2 grid accumulated DIMENSION BY
    DIMENSION — the cross-engine IEEE contract (dim_ordered_dot_sq's
    argument, for the subtract-square fold)."""
    import numpy as np

    d2 = np.zeros((xmat.shape[0], cmat.shape[0]))
    for j in range(xmat.shape[1]):
        diff = xmat[:, j][:, None] - cmat[:, j][None, :]
        d2 += diff * diff
    return d2


def pq_encode(emb: DataFrame, cb) -> DataFrame:
    """(vec_id, pq_code): per-subspace argmin against ``cb`` (ties to
    the smallest code — numpy argmin's first-occurrence over
    code-ascending columns), nibble-packed into one BIGINT.  One
    shuffle-free Arrow pass; the codebook rides the closure."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("pq_code", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            emat = np.array(list(pdf["e"]), dtype=np.float64)
            packed = np.zeros(len(emat), dtype=np.int64)
            for m in range(PQ_M):
                sub = emat[:, m * PQ_SUB_DIM : (m + 1) * PQ_SUB_DIM]
                codes = np.argmin(_sub_d2(sub, cb[m]), axis=1)
                packed |= codes.astype(np.int64) << (4 * m)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "pq_code": packed,
                }
            )

    spark = emb.sparkSession
    par = spark.sparkContext.defaultParallelism
    return emb.select("vec_id", "e").repartition(par).mapInPandas(
        gen, schema
    )


# ---- shared oracle CTEs ------------------------------------------------

_SQL_D2 = (
    "list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, x) -> acc + x)"
)

#: per-vector per-subspace slices, the seed sub-codebooks, and the
#: per-(vector, subspace) assigned code — shared by encode and ADC
_SQL_PQ_COMMON = f"""
  v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
  sub AS (
    SELECT vec_id, m,
           e[(m * {PQ_SUB_DIM} + 1):(m * {PQ_SUB_DIM} + {PQ_SUB_DIM})] AS se
    FROM v, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m)
  ),
  cb AS (
    SELECT vec_id AS code, m, se AS ce FROM sub WHERE vec_id < {PQ_K}
  ),
  codes AS (
    SELECT vec_id, m, code FROM (
      SELECT s.vec_id, s.m, c.code,
             ROW_NUMBER() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY {_SQL_D2.format(a="s.se", b="c.ce")}, c.code
             ) AS rn
      FROM sub s JOIN cb c ON c.m = s.m
    ) WHERE rn = 1
  )
"""


@query(
    "similarity_pq_encode",
    oracle=f"""
    WITH {_SQL_PQ_COMMON}
    SELECT vec_id,
           CAST(SUM(code << (4 * m)) AS BIGINT) AS pq_code
    FROM codes GROUP BY vec_id
    """,
)
def similarity_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode the whole embeddings table: every vector's 8
    subspace codes against the deterministic 16-entry sub-codebooks,
    nibble-packed into one BIGINT (the 128×-compressed column a
    100 TB vector store would persist next to — or instead of — the
    raw arrays)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return pq_encode(emb, _collect_subcodebooks(emb))


_ADC_TOTAL = " + ".join(f"d{m}" for m in range(PQ_M))
_ADC_PIVOT = ",\n             ".join(
    f"MAX(CASE WHEN l.m = {m} THEN l.d2 END) AS d{m}"
    for m in range(PQ_M)
)


@query(
    "similarity_pq_adc_topk",
    oracle=f"""
    WITH {_SQL_PQ_COMMON},
    lut AS (
      SELECT q.vec_id AS query_id, c.m, c.code,
             {_SQL_D2.format(a="q.se", b="c.ce")} AS d2
      FROM sub q JOIN cb c ON c.m = q.m
      WHERE q.vec_id < {N_QUERIES}
    ),
    adc0 AS (
      SELECT l.query_id, k.vec_id AS cand_id,
             {_ADC_PIVOT}
      FROM codes k
      JOIN lut l ON l.m = k.m AND l.code = k.code
      WHERE k.vec_id <> l.query_id
      GROUP BY l.query_id, k.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, {_ADC_TOTAL} AS adist,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY {_ADC_TOTAL}, cand_id
             ) AS rnk
      FROM adc0
    )
    SELECT query_id, cand_id,
           {SQL_STR_ROUND6("adist")} AS adc_dist,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k over PQ codes: the query set (vec_id < 10) scored
    against the ENCODED corpus — per candidate, 8 table lookups + 7
    adds instead of a 64-term fold over a vector that would otherwise
    have to be resident.

    Distributed shape mirrors ``similarity_bruteforce_topk``: the
    per-query M×K lookup tables (8×16 doubles each) are built once in
    the kernel closure, each corpus partition scores its codes and
    emits only its partial top-k, and the final window ranks a
    partitions×queries×k frame.  The codes themselves come from the
    same in-plan encode kernel (production would read the persisted
    ``pq_code`` column and skip that stage).

    The ADC total accumulates subspaces IN ORDER (left-associated
    d0+d1+…+d7, matching the SQL), so ranks and the 6-dp exposed
    distance agree with the oracle bit-for-bit.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cb = _collect_subcodebooks(emb)
    qrows = sorted(
        emb.filter(F.col("vec_id") < N_QUERIES).collect(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([int(r["vec_id"]) for r in qrows], dtype=np.int64)
    qmat = np.array([list(r["e"]) for r in qrows], dtype=np.float64)
    # per-query LUT: lut[m][q, code] = d2(query subvector m, centroid)
    lut = [
        _sub_d2(qmat[:, m * PQ_SUB_DIM : (m + 1) * PQ_SUB_DIM], cb[m])
        for m in range(PQ_M)
    ]

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("cand_id", T.LongType()),
            T.StructField("adist", T.DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            cand = pdf["vec_id"].to_numpy(dtype=np.int64)
            packed = pdf["pq_code"].to_numpy(dtype=np.int64)
            nibbles = [
                (packed >> (4 * m)) & 0xF for m in range(PQ_M)
            ]
            out_q, out_c, out_d = [], [], []
            for qi in range(len(qids)):
                # subspace-ordered accumulation — the SQL's d0+d1+…+d7
                total = lut[0][qi, nibbles[0]].copy()
                for m in range(1, PQ_M):
                    total = total + lut[m][qi, nibbles[m]]
                keep = cand != qids[qi]
                ci, di = cand[keep], total[keep]
                order = np.lexsort((ci, di))[:TOP_K]
                out_q.extend([qids[qi]] * len(order))
                out_c.extend(ci[order])
                out_d.extend(di[order])
            yield pd.DataFrame(
                {"query_id": out_q, "cand_id": out_c, "adist": out_d}
            )

    codes = pq_encode(emb, cb)
    partial = codes.mapInPandas(gen, schema)
    w = W.partitionBy("query_id").orderBy("adist", "cand_id")
    return (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "cand_id",
            str_round6(F.col("adist")).alias("adc_dist"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
