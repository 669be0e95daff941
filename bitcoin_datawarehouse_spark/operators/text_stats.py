"""Corpus-statistics text operators (SURVEY.md §2.12 extensions).

Repetition/diversity signals (the Gopher-style quality rules that
catch degenerate generations: type-token ratio, top-bigram
dominance) and corpus TF-IDF (document-frequency table + top terms
per document) — the analysis passes a training-data pipeline runs
between dedup and sampling.

Scale shape: everything is explode → hash aggregate → (optional)
window top-k, keyed by (doc, term) — uniform keys, map-side partial
aggregation, no driver state.  The IDF table is corpus-global but
tiny (vocabulary-sized) and broadcasts into the per-doc scoring join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.operators.dedup import tokens_col
from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.functions.cachereg import (
    cache_tracked,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

_SQL_TOKENS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)

TFIDF_TOP_K = 3


@query(
    "text_repetition_stats",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    base AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
      FROM tk
    ),
    big AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bg
      FROM tk WHERE len(toks) >= 2
    ),
    bgc AS (
      SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2
    ),
    agg AS (
      SELECT doc_id, MAX(c) AS top_bigram_count, SUM(c) AS n_bigrams
      FROM bgc GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens, b.n_distinct,
           {SQL_STR_ROUND6('CAST(b.n_distinct AS DOUBLE) / b.n_tokens')}
             AS type_token_ratio,
           {SQL_STR_ROUND6(
               'CAST(a.top_bigram_count AS DOUBLE) / a.n_bigrams'
           )}
             AS top_bigram_frac
    FROM base b JOIN agg a ON a.doc_id = b.doc_id
    WHERE b.n_tokens > 0
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals: type-token ratio (vocabulary
    diversity) and the share of the single most frequent bigram —
    the cheap detectors for looping/templated text.
    """
    # One Arrow kernel pass finishes ALL per-doc aggregation (token
    # count, distinct count, per-doc bigram Counter) — the former
    # bigram explode paid two corpus-wide hash-agg shuffles plus a
    # join, and its HOF bigram builder re-walked the token array
    # interpreted (same family as the CollapseProject finding).  The
    # 6-dp ratio surfaces stay on the proven str_round6 column route.
    import re
    from collections import Counter

    import pandas as pd
    from pyspark.sql import types as T

    pat = re.compile("[^a-z0-9]+")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_distinct", T.LongType()),
            T.StructField("top_bigram_count", T.LongType()),
            T.StructField("n_bigrams", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                tk = [t for t in pat.split(txt.lower()) if t]
                if len(tk) < 2:  # oracle's inner join drops bigram-less docs
                    continue
                bc = Counter(
                    f"{a} {b}" for a, b in zip(tk, tk[1:])
                )
                out["doc_id"].append(did)
                out["n_tokens"].append(len(tk))
                out["n_distinct"].append(len(set(tk)))
                out["top_bigram_count"].append(max(bc.values()))
                out["n_bigrams"].append(sum(bc.values()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    kern = (
        docs.repartition(par)
        .select("doc_id", "text")
        .mapInPandas(gen, schema)
    )
    return kern.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        str_round6(
            F.col("n_distinct").cast("double") / F.col("n_tokens")
        ).alias("type_token_ratio"),
        str_round6(
            F.col("top_bigram_count").cast("double") / F.col("n_bigrams")
        ).alias("top_bigram_frac"),
    )


@query(
    "text_tfidf_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
               AS tfidf
      FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rnk AS INT) AS rnk FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term
             ) AS rnk
      FROM scored
    ) WHERE rnk <= {TFIDF_TOP_K}
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    tf and df are two hash aggregates over the exploded (doc, term)
    set; the vocabulary-sized IDF table broadcasts into the scoring
    join; per-doc top-k is a window.  Scores round to 6 places (ln is
    libm-dependent in the last ulp).
    """
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    tok = (
        docs.repartition(par)
        .select("doc_id", tokens_col(F.col("text")).alias("toks"))
        .select("doc_id", F.explode("toks").alias("term"))
    )
    tok = cache_tracked(tok)
    tok.count()  # eager fill: tf and df below both read this cache
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf", "rnk")
    )


TOKEN_HIST_TOP_K = 50


@query(
    "text_token_histogram",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tk GROUP BY 1, 2
    )
    SELECT token,
           CAST(SUM(tf) AS BIGINT) AS term_count,
           COUNT(*) AS doc_count
    FROM tf GROUP BY token
    ORDER BY term_count DESC, token ASC
    LIMIT {TOKEN_HIST_TOP_K}
    """,
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-K tokens by total occurrences, with
    document frequency — the first pass of BPE/vocab construction and
    the standard corpus-composition report.

    Scale shape: two cascaded hash aggregates.  Phase 1 keys on
    (doc_id, token), so map-side partial aggregation collapses
    within-document repeats before any shuffle; phase 2 reduces the
    per-doc term table to one vocabulary-sized frame (term_count =
    sum of tf, doc_count = group size — no COUNT(DISTINCT) expand).
    The final top-K is a TakeOrderedAndProject (per-partition heap +
    driver merge of K rows), never a global sort.  Tie-break on token
    makes the LIMIT boundary deterministic cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    tok = (
        docs.repartition(par)
        .select("doc_id", F.explode(tokens_col(F.col("text"))).alias("token"))
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    return (
        tf.groupBy("token")
        .agg(
            F.sum("tf").cast("bigint").alias("term_count"),
            F.count("*").alias("doc_count"),
        )
        .orderBy(F.col("term_count").desc(), F.col("token").asc())
        .limit(TOKEN_HIST_TOP_K)
    )


# ---------------------------------------------------------------------------
# round 8: sliding-window document chunking (RAG / pretraining windows)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive windows


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ),
    ch AS (
      SELECT doc_id,
             CAST(s AS BIGINT) AS start_tok,
             CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_ix,
             CAST(LEAST({CHUNK_TOKENS}, len(toks) - s) AS BIGINT) AS n_tok,
             array_to_string(
               list_slice(toks, s + 1,
                          s + LEAST({CHUNK_TOKENS}, len(toks) - s)),
               ' ') AS chunk_text
      FROM tk, UNNEST(range(0, len(toks), {CHUNK_STRIDE})) AS u(s)
      WHERE len(toks) > 0
    )
    SELECT doc_id, chunk_ix, start_tok, n_tok, chunk_text FROM ch
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the windowing pass every
    RAG index and long-document pretraining pipeline runs between
    curation and embedding/packing: each document becomes overlapping
    {CHUNK_TOKENS}-token windows at stride {CHUNK_STRIDE} (8-token
    overlap keeps boundary context retrievable), with (chunk_ix,
    start_tok, n_tok) offsets so a downstream span maps back to its
    source.  Every start offset < n_tokens is emitted, including a
    short trailing window — the simple deterministic contract; a
    dedup-against-overlap policy composes downstream if wanted.

    Plan: ONE stateless codegen projection — tokenize, a
    ``sequence(0, n-1, stride)`` explode, per-chunk slice + join —
    no shuffle, no Python, no aggregate anywhere; at 100 TB this is
    a map-only pass whose output partitioning inherits the scan.
    Integer-exact surface (chunk_ix = start DIV stride; token
    boundaries identical by the shared ``[a-z0-9]+`` contract), so
    the gate hash-checks chunk text byte-for-byte cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    return chunk_windows_frame(docs.repartition(par))


def chunk_windows_frame(docs: DataFrame) -> DataFrame:
    """Frame-level chunking over any (doc_id, text) frame — the
    registered gate is this over the fixture; the streaming curation
    ingest chunks each trigger's curated survivors through the SAME
    projection (one plan owner, zero drift)."""
    toks = tokens_col(F.col("text"))
    n = F.size(F.col("toks"))
    s = F.col("s")
    n_tok = F.least(F.lit(CHUNK_TOKENS), n - s)
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(n > 0)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
            ).alias("s"),
        )
        .select(
            "doc_id",
            F.expr(f"CAST(s DIV {CHUNK_STRIDE} AS BIGINT)").alias(
                "chunk_ix"
            ),
            s.cast("bigint").alias("start_tok"),
            n_tok.cast("bigint").alias("n_tok"),
            F.concat_ws(
                " ", F.slice(F.col("toks"), s + 1, n_tok)
            ).alias("chunk_text"),
        )
        .select(
            "doc_id", "chunk_ix", "start_tok", "n_tok", "chunk_text"
        )
    )
