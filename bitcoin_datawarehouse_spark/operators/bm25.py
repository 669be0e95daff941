"""BM25 ranked retrieval over the documents corpus (SURVEY §2.12
text-analysis family — the scoring half of a search/retrieval
pipeline, next to tf-idf's weighting surface).

Okapi BM25 with the Lucene idf variant:

    score(d, q) = Σ_t  ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
                  · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·|d|/avgdl))

k1 = 1.2, b = 0.75.  Engine-parity contract follows text_lm_quality's
precedent for transcendental terms: every per-(doc, term) weight is
ROUND(·, 6) BEFORE the exact decimal sum (the one ``ln`` call is the
same libm-last-ulp risk class as lm_quality's ``log2`` — absorbed by
the 6-dp round away from knife-edge ties), corpus statistics go
through the deterministic chains (avgdl = string-routed decimal sum /
count; N, df, tf, |d| exact integers), and the exposed score is the
string-routed decimal→double.  Top-k orders by the total order
(score, doc_id), so LIMIT is deterministic in both engines.

Scale shape: ONE Arrow kernel pass finishes all per-document counting
task-locally (per-term tf + document length — the doc_bigram_counts
pattern: a document is one input row, so no corpus-wide token
shuffle); everything downstream runs on the (docs × |query|)-sized
frame — two scalar/3-row aggregates broadcast back in, one per-doc
sum, one TakeOrdered.  No reference counterpart (the reference
outsources analytics; north-star family).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.cachereg import cache_tracked
from bitcoin_datawarehouse_spark.functions.numeric import DEC, SQL_DEC
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: the fixed gate query (mid-frequency fixture vocabulary); the
#: operator is parametric in production
BM25_TERMS = ["spark", "join", "window"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20


def doc_term_counts(
    spark: SparkSession, sf_dir: str, terms: list[str]
) -> DataFrame:
    """(doc_id, dl, term, tf): per-document length and per-query-term
    frequency, finished INSIDE the Arrow kernel (tokens byte-identical
    to the oracle's ``[^a-z0-9]+`` lower-case split); emits one row
    per (doc, term) including tf = 0 so document lengths survive for
    the avgdl statistic."""
    import pandas as pd
    from pyspark.sql import types as T

    pat = re.compile("[^a-z0-9]+")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("dl", T.LongType()),
            T.StructField("term", T.StringType()),
            T.StructField("tf", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, dls, tms, tfs = [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                tk = [t for t in pat.split(txt.lower()) if t]
                for term in terms:
                    ids.append(did)
                    dls.append(len(tk))
                    tms.append(term)
                    tfs.append(sum(1 for t in tk if t == term))
            yield pd.DataFrame(
                {"doc_id": ids, "dl": dls, "term": tms, "tf": tfs}
            )

    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    return docs.repartition(par).select("doc_id", "text").mapInPandas(
        gen, schema
    )


def _terms_values_sql(terms: list[str]) -> str:
    return ", ".join(f"('{t}')" for t in terms)


_BM25_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tok),
    qterms(term) AS (VALUES {_terms_values_sql(BM25_TERMS)}),
    tf AS (
      SELECT t.doc_id, q.term,
             CAST(len(list_filter(t.tk, w -> w = q.term)) AS BIGINT) AS tf
      FROM tok t CROSS JOIN qterms q
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM({SQL_DEC("dl")}) AS STRING) AS DOUBLE)
               / COUNT(*) AS avgdl
      FROM dl
    ),
    df AS (
      SELECT term,
             CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df
      FROM tf GROUP BY term
    ),
    w AS (
      -- native ROUND(double, 6) is safe HERE ONLY because every
      -- non-zero weight carries the irrational ln(idf) factor and
      -- cannot land on an exact 1e-6 tie; swapping in an
      -- integer-ratio term (tf/dl etc.) under this ROUND would
      -- reintroduce the str_round6 tie hazard CLAUDE.md documents
      SELECT tf.doc_id,
             ROUND(
               ln(CAST(1 AS DOUBLE)
                  + (CAST(s.n - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
               * (CAST(tf.tf AS DOUBLE) * CAST({BM25_K1 + 1} AS DOUBLE))
                 / (CAST(tf.tf AS DOUBLE)
                    + CAST({BM25_K1} AS DOUBLE)
                      * (CAST({1 - BM25_B} AS DOUBLE)
                         + CAST({BM25_B} AS DOUBLE)
                           * CAST(dl.dl AS DOUBLE) / s.avgdl)),
               6) AS wt
      FROM tf
      JOIN dl ON dl.doc_id = tf.doc_id
      JOIN df ON df.term = tf.term
      CROSS JOIN stats s
      WHERE tf.tf > 0
    ),
    scores AS (
      SELECT doc_id,
             CAST(CAST(SUM({SQL_DEC("wt")}) AS STRING) AS DOUBLE) AS bm25
      FROM w GROUP BY doc_id
    )
    SELECT s.doc_id, dl.dl AS doc_len, s.bm25
    FROM scores s JOIN dl ON dl.doc_id = s.doc_id
    ORDER BY s.bm25 DESC, s.doc_id
    LIMIT {BM25_TOP_K}
"""


@query("text_bm25_topk", oracle=_BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 for the fixed 3-term gate query —
    corpus statistics (N, df, avgdl) trained in-plan, per-term weights
    6-dp-rounded before the exact decimal per-doc sum (module
    docstring has the full parity contract).

    Plan: the counting kernel's output is cache_tracked (three
    subtrees of the one action read it: the N/avgdl scalar aggregate,
    the 3-row df aggregate, and the score rows — the CLAUDE.md
    shared-subgraph rule); both aggregates broadcast back in; the
    top-k is a TakeOrdered over the per-doc sum.
    """
    tfs = cache_tracked(doc_term_counts(spark, sf_dir, BM25_TERMS))
    tfs.count()  # eager fill: three subtrees read it in one action

    dl = tfs.filter(F.col("term") == BM25_TERMS[0]).select("doc_id", "dl")
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum(F.col("dl").cast(DEC)).cast("string").cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    df = tfs.groupBy("term").agg(
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    wt = F.round(
        idf
        * (F.col("tf").cast("double") * F.lit(BM25_K1 + 1))
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (
                F.lit(1 - BM25_B)
                + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
            )
        ),
        6,
    )
    scores = (
        tfs.filter(F.col("tf") > 0)
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", wt.alias("wt"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("wt").cast(DEC))
            .cast("string")
            .cast("double")
            .alias("bm25")
        )
    )
    return (
        scores.join(dl, "doc_id")
        .select("doc_id", F.col("dl").alias("doc_len"), "bm25")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )
