"""Text-analysis operators (SURVEY.md §2.12; north-star extensions).

Language-ID (stopword heuristic), quality scoring, token counting,
and document fingerprinting over the ``documents`` fixture.  All
JVM-side built-ins (split/filter/length/md5/regexp) — no Python in the
row path — with DuckDB oracles.

The reference's only scalar transform is ``UPPER([entity])``
(reference ``column_transform.yaml:8``); these operators are the
training-data-pipeline generalization of that per-column transform
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.operators.dedup import tokens_col
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

# Tiny per-language stopword lists (public common-word lists).  The
# heuristic is intentionally simple — deterministic and identical in
# both engines; production would swap in a real n-gram profile model
# behind the same (doc_id → lang) contract.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "is", "in", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "zu"],
    "es": ["el", "la", "de", "y", "los", "que", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "est", "que"],
}
LANG_PRIORITY = ["en", "de", "es", "fr"]  # deterministic tiebreak order

_SQL_TOKENS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)


def _sql_stop_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(tk, t -> t IN ({words}))) AS n_{lang}"


# identical CASE text evaluated by both engines over the n_<lang> cols
_LANG_CASE = (
    "CASE "
    "WHEN n_en = 0 AND n_de = 0 AND n_es = 0 AND n_fr = 0 THEN 'unknown' "
    "WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr THEN 'en' "
    "WHEN n_de >= n_es AND n_de >= n_fr THEN 'de' "
    "WHEN n_es >= n_fr THEN 'es' "
    "ELSE 'fr' END"
)


@query(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_sql_stop_count("en")},
             {_sql_stop_count("de")},
             {_sql_stop_count("es")},
             {_sql_stop_count("fr")}
      FROM (SELECT doc_id, lang, {_SQL_TOKENS} AS tk FROM documents)
    )
    SELECT doc_id, lang AS labeled_lang, {_LANG_CASE} AS predicted_lang,
           n_en, n_de, n_es, n_fr
    FROM scored
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID with deterministic priority tiebreak.

    One narrow projection pass (codegen'd array ops per row, no
    shuffle, no UDF).
    """
    import re

    import pandas as pd
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents")
    # One Arrow pass: tokenize once, one membership lookup per token
    # against a token→languages map (the former four interpreted HOF
    # filters each re-walked the array; same CollapseProject finding
    # as quality_frame).  The vote CASE stays the shared column
    # expression both engines evaluate over the exact counts.
    vote: dict[str, list[str]] = {}
    for lang in LANG_PRIORITY:
        for w in STOPWORDS[lang]:
            vote.setdefault(w, []).append(lang)
    pat = re.compile("[^a-z0-9]+")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("labeled_lang", T.StringType()),
            *[T.StructField(f"n_{lang}", T.LongType())
              for lang in LANG_PRIORITY],
        ]
    )
    langs = tuple(LANG_PRIORITY)

    def gen(batches):
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for did, lab, txt in zip(
                pdf["doc_id"], pdf["lang"], pdf["text"]
            ):
                counts = dict.fromkeys(langs, 0)
                for t in pat.split(txt.lower()):
                    if t:
                        for lang in vote.get(t, ()):
                            counts[lang] += 1
                out["doc_id"].append(did)
                out["labeled_lang"].append(lab)
                for lang in langs:
                    out[f"n_{lang}"].append(counts[lang])
            yield pd.DataFrame(out)

    par = spark.sparkContext.defaultParallelism
    scored = (
        docs.repartition(par)
        .select("doc_id", "lang", "text")
        .mapInPandas(gen, schema)
    )
    return scored.withColumn("predicted_lang", F.expr(_LANG_CASE)).select(
        "doc_id", "labeled_lang", "predicted_lang", "n_en", "n_de", "n_es", "n_fr"
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_obs,
             CAST(len(tk) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(tk, t -> t IN ('the','a','of','to','and','is','in','it'))) AS BIGINT)
               AS n_stop,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS BIGINT)
               AS n_punct
      FROM (SELECT doc_id, text, {_SQL_TOKENS} AS tk FROM documents)
    )
    SELECT doc_id, n_chars_obs, n_tokens,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_punct AS DOUBLE) / n_chars_obs AS punct_ratio,
           CAST(n_chars_obs AS DOUBLE) / n_tokens AS mean_token_span,
           (CAST(n_stop AS DOUBLE) / n_tokens) * 0.5
             + CASE WHEN n_tokens >= 20 THEN 0.3 ELSE 0.0 END
             + CASE WHEN CAST(n_punct AS DOUBLE) / n_chars_obs < 0.1
                    THEN 0.2 ELSE 0.0 END
             AS quality_score
    FROM base
    WHERE n_tokens > 0
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: stopword ratio + length gate +
    punctuation-density gate (the standard cheap pre-filter in
    training-data pipelines — cf. public C4/Gopher-style rules).

    All ratios are single double divisions over exact integer counts:
    bit-identical across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    # repartition first — the fixture is one input split and this is
    # regex-heavy per-doc CPU work
    return quality_frame(
        docs.repartition(spark.sparkContext.defaultParallelism)
    )


def quality_frame(docs: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Per-document quality metrics as ONE Arrow kernel pass over
    ``docs`` (narrow, no shuffle, no second scan): composable into
    larger pipelines — trainprep_corpus_pipeline inlines this instead
    of joining a separately-scanned scored frame.  ``keep`` =
    passthrough columns (copied through the kernel untouched).

    Formerly a JVM-expression projection; replaced after plan
    inspection showed CollapseProject re-inlining the token split
    into BOTH its consumers (two regex splits per row) on top of the
    interpreted stopword HOF — measured 2.32 s → kernel at sf1.  The
    kernel tokenizes once per document and finishes every count in
    the same pass (CLAUDE.md per-doc-aggregation rule).  Regex
    semantics mirror the JVM/DuckDB forms on the fixture alphabet:
    the tokenizer is the dedup kernel's ``[^a-z0-9]+`` split, and the
    punctuation class spells the JVM's ASCII ``\\s`` explicitly.

    All ratios are single double divisions over exact integer counts
    and the score accumulates in the same left-to-right order as the
    SQL — bit-identical across engines.
    """
    import re

    import pandas as pd
    from pyspark.sql import types as T

    keep = [c for c in (keep or []) if c != "doc_id"]
    pat = re.compile("[^a-z0-9]+")
    punct = re.compile(r"[^a-zA-Z0-9 \t\n\r\f\x0b]")
    stop = frozenset(STOPWORDS["en"])

    in_fields = {f.name: f for f in docs.schema.fields}
    fields = [T.StructField(c, in_fields[c].dataType) for c in keep]
    fields += [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_chars_obs", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("stopword_ratio", T.DoubleType()),
        T.StructField("punct_ratio", T.DoubleType()),
        T.StructField("mean_token_span", T.DoubleType()),
        T.StructField("quality_score", T.DoubleType()),
    ]
    schema = T.StructType(fields)
    keep_t = tuple(keep)

    def gen(batches):
        for pdf in batches:
            rows = {c: [] for c in keep_t}
            ids, ncs, nts = [], [], []
            srs, prs, spans, scores = [], [], [], []
            for i, (did, txt) in enumerate(zip(pdf["doc_id"], pdf["text"])):
                tk = [t for t in pat.split(txt.lower()) if t]
                n_tokens = len(tk)
                if n_tokens == 0:
                    continue
                n_chars = len(txt)
                n_stop = sum(1 for t in tk if t in stop)
                n_punct = len(punct.findall(txt))
                sr = n_stop / n_tokens
                pr = n_punct / n_chars
                score = (
                    sr * 0.5
                    + (0.3 if n_tokens >= 20 else 0.0)
                    + (0.2 if pr < 0.1 else 0.0)
                )
                for c in keep_t:
                    rows[c].append(pdf[c].iloc[i])
                ids.append(did)
                ncs.append(n_chars)
                nts.append(n_tokens)
                srs.append(sr)
                prs.append(pr)
                spans.append(n_chars / n_tokens)
                scores.append(score)
            out = {c: rows[c] for c in keep_t}
            out.update(
                {
                    "doc_id": ids,
                    "n_chars_obs": ncs,
                    "n_tokens": nts,
                    "stopword_ratio": srs,
                    "punct_ratio": prs,
                    "mean_token_span": spans,
                    "quality_score": scores,
                }
            )
            yield pd.DataFrame(out, columns=[f.name for f in fields])

    in_cols = list(dict.fromkeys(["doc_id", "text", *keep]))
    return docs.select(*in_cols).mapInPandas(gen, schema)


@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))
                AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))
                AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (word pieces + individual punctuation marks) — the cheap token
    budget estimator for an LLM data pipeline.
    """
    docs = load_table(spark, sf_dir, "documents")
    # regexp_count keeps both counts in whole-stage codegen with no
    # intermediate array and no interpreted lambda: the number of
    # non-empty \s+-split pieces IS the number of maximal \S+ runs
    ws = F.regexp_count(F.col("text"), F.lit(r"\S+"))
    bpe = F.regexp_count(
        F.lower(F.col("text")), F.lit(r"[a-z0-9]+|[^a-z0-9\s]")
    )
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fingerprint,
           substr(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))),
                  1, 4) AS shard_key
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form content fingerprint: lowercase, collapse all
    non-alphanumerics to single spaces, trim, md5.

    ``shard_key`` (first 16 bits of the hash) is the partitioning key
    a 100 TB dedup would bucket by — uniformly distributed by
    construction, so no skew.
    """
    docs = load_table(spark, sf_dir, "documents")
    canon = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    )
    fp = F.md5(canon.cast("binary"))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 4).alias("shard_key"),
    )
