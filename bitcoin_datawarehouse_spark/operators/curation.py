"""Corpus-curation operators: the filtering/ordering stages between
"raw crawl" and "training corpus" in an LLM data pipeline
(SURVEY.md §2.12 family; north-star extensions).

* **benchmark decontamination** — flag corpus documents sharing too
  many word 3-grams with a held-out evaluation set.  The eval set is
  tiny and fixed (a benchmark suite), so its shingle set broadcasts;
  the corpus side is an inverted-index left join on the shingle —
  never an all-pairs comparison.  Same shingle intermediate as the
  dedup family (``doc_shingles``).
* **Gopher-style quality rules** — per-document heuristic rule bits
  (word count bounds, mean word length, stopword evidence, symbol
  ratio; cf. the published Gopher/MassiveText filtering rules) and
  the conjunction as a keep flag.  One Arrow kernel pass for the
  counts (shuffle-free, streaming-compatible), rule bits as codegen
  projections over it.
* **deterministic global shuffle** — training-order randomization
  without RNG state: an md5 sort key assigns every doc a shard and a
  rank within the shard.  Per-shard windows (hash-balanced, bounded
  at corpus_size/N_SHARDS) — no global ROW_NUMBER, which would
  single-partition at 100 TB.
* **PII scan/redaction** — email/IPv4/phone counts and an md5 digest
  of the redacted text, as one regexp projection pass.  The fixture
  corpus is synthetic word-soup with no PII (the gate verifies the
  expression tree's cross-engine parity at zero hits); the planted
  PII kernel behavior is pytest-verified on literal rows
  (tests/test_queries.py::test_pii_redaction_on_planted_rows).

All md5-keyed (cross-engine bit-identical; at 100 TB you'd swap in
xxhash64 without changing any plan shape — same note as dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.operators.dedup import (
    _SQL_SHING,
    doc_shingles,
    tokens_col,
)
from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.operators.text import _SQL_TOKENS
from bitcoin_datawarehouse_spark.functions.cachereg import (
    cache_tracked,
)
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

# -- decontamination --------------------------------------------------------

#: membership rule for the stand-in "benchmark" split: every 97th doc.
#: In production this is the real eval-suite corpus; the contract is
#: only "a small fixed set of documents".
EVAL_MOD = 97

#: eval-suite shingle sets, keyed (applicationId, sf_dir) — the eval
#: set is a FIXED artifact (MBs forever), so its shingle set is
#: computed once per session and reused across decontam calls, the
#: same pattern as tables.cache_tables for hot inputs
_EVAL_SHINGLES: dict[tuple[str, str], frozenset] = {}


def _eval_shingle_set(spark, sf_dir: str, is_eval) -> frozenset:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _EVAL_SHINGLES.get(key)
    if hit is None:
        # no .distinct(): the rows are already per-doc distinct and the
        # Python set dedups across docs — one shuffle fewer
        hit = frozenset(
            r["sh"]
            for r in doc_shingles(spark, sf_dir, docs_filter=is_eval)
            .select("sh")
            .collect()
        )
        _EVAL_SHINGLES[key] = hit
    return hit
#: fraction of a doc's distinct 3-gram shingles that may also appear
#: in the eval set before the doc is flagged as contaminated
DECONTAM_THRESHOLD = 0.05


@query(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH {_SQL_SHING},
    ev AS (SELECT DISTINCT sh FROM shing WHERE doc_id % {EVAL_MOD} = 0),
    ov AS (
      SELECT s.doc_id,
             COUNT(*) AS n_shingles,
             COUNT(e.sh) AS n_contaminated
      FROM shing s LEFT JOIN ev e ON s.sh = e.sh
      WHERE s.doc_id % {EVAL_MOD} <> 0
      GROUP BY s.doc_id
    )
    SELECT doc_id, n_shingles, n_contaminated,
           {SQL_STR_ROUND6('CAST(n_contaminated AS DOUBLE) / n_shingles')}
             AS overlap_frac,
           CAST({SQL_STR_ROUND6('CAST(n_contaminated AS DOUBLE) / n_shingles')}
                >= {DECONTAM_THRESHOLD} AS BOOLEAN) AS contaminated
    FROM ov
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per corpus doc, the fraction of its
    distinct 3-gram shingles that also occur anywhere in the eval set.

    Plan shape (the 100 TB one): an eval suite is MBs FOREVER — its
    distinct shingle set is a model-sized artifact, so it collects to
    the driver (one job over only the eval-filtered scan — the filter
    reaches the scan before the Arrow kernel) and ships in the corpus
    kernel's closure, exactly like a broadcast.  The corpus side is
    then ONE Arrow pass emitting per-doc (n_shingles, n_contaminated)
    via set intersection — no shingle explode, no join, no aggregate
    shuffle; output counts are identical to the former
    inverted-index LEFT join + hash-agg (byte-identical tokenization,
    exact distinct-set semantics on both paths).  The corpus is never
    self-joined and the driver never holds corpus-sized state.
    """
    import re as _re

    import pandas as pd
    from pyspark.sql import types as T

    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_shingles = _eval_shingle_set(spark, sf_dir, is_eval)

    pat = _re.compile("[^a-z0-9]+")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_shingles", T.LongType()),
            T.StructField("n_contaminated", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, ns, nc = [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                tk = [t for t in pat.split(txt.lower()) if t]
                seen = set()
                for i in range(len(tk) - 2):
                    seen.add(f"{tk[i]} {tk[i + 1]} {tk[i + 2]}")
                if not seen:
                    continue
                ids.append(did)
                ns.append(len(seen))
                nc.append(len(seen & eval_shingles))
            yield pd.DataFrame(
                {"doc_id": ids, "n_shingles": ns, "n_contaminated": nc}
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(~is_eval)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", "text")
    )
    overlap = str_round6(
        F.col("n_contaminated").cast("double") / F.col("n_shingles")
    )
    return docs.mapInPandas(gen, schema).select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        overlap.alias("overlap_frac"),
        (overlap >= DECONTAM_THRESHOLD).alias("contaminated"),
    )


# -- Gopher-style quality rules ---------------------------------------------

GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 90
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_STOP_HITS = 2  # ≥2 occurrences of common-word evidence
GOPHER_MAX_SYMBOL_RATIO = 0.1
_STOPS = ("the", "a", "of", "to", "and", "is", "in", "it")

_SQL_STOPLIST = ", ".join(f"'{w}'" for w in _STOPS)

#: the per-doc metric CTE shared by the batch rules query and the
#: streaming quality filter's oracle
_SQL_GOPHER_M = f"""t AS (
      SELECT doc_id, {_SQL_TOKENS} AS tk,
             CAST(length(text) AS BIGINT) AS n_chars_raw,
             CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                  AS BIGINT) AS n_symbols
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_words,
             {SQL_STR_ROUND6(
                 'CAST(list_reduce(list_transform(tk, w -> length(w)), '
                 '(acc, x) -> acc + x) AS DOUBLE) / len(tk)'
             )}
               AS mean_word_len,
             CAST(len(list_filter(tk, w -> w IN ({_SQL_STOPLIST})))
                  AS BIGINT) AS n_stop_hits,
             {SQL_STR_ROUND6('CAST(n_symbols AS DOUBLE) / n_chars_raw')}
               AS symbol_ratio
      FROM t WHERE len(tk) > 0
    )"""

_SQL_GOPHER_KEEP = f"""n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
      AND mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
          AND {GOPHER_MAX_MEAN_WORD_LEN}
      AND n_stop_hits >= {GOPHER_MIN_STOP_HITS}
      AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}"""


def gopher_metrics_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, mean_word_len, n_stop_hits, symbol_ratio) —
    the stateless metric projection under the rule bits.  Works on a
    batch OR streaming frame (no shuffle, no state; ``mapInPandas``
    is a stateless narrow op under Structured Streaming too).

    One Arrow kernel pass computes the exact integer counts and the
    dimension-ordered mean accumulation (``acc += len(token)`` in
    token order — the identical IEEE sequence as the former
    ``F.aggregate`` fold and the oracle's ``list_reduce``); the
    6-dp surfaces then go through the PROVEN ``str_round6`` column
    route on the kernel output, so the cross-engine rounding
    machinery stays in one place.  Replaced the JVM-expression form
    after plan inspection showed the token split evaluated twice per
    row plus three interpreted HOFs (same CollapseProject finding as
    text.quality_frame, measured 3.2×/15× there at sf1/sf10).
    """
    import re

    import pandas as pd
    from pyspark.sql import types as T

    pat = re.compile("[^a-z0-9]+")
    sym = re.compile(r"[^a-z0-9 ]")
    stop = frozenset(_STOPS)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("mean_raw", T.DoubleType()),
            T.StructField("n_stop_hits", T.LongType()),
            T.StructField("n_symbols", T.LongType()),
            T.StructField("n_chars_raw", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, nws, means, stops_, syms, ncs = [], [], [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                tk = [t for t in pat.split(txt.lower()) if t]
                if not tk:
                    continue
                acc = 0.0
                n_stop = 0
                for t in tk:  # token-ordered IEEE fold
                    acc += float(len(t))
                    if t in stop:
                        n_stop += 1
                ids.append(did)
                nws.append(len(tk))
                means.append(acc / len(tk))
                stops_.append(n_stop)
                syms.append(len(sym.findall(txt)))
                ncs.append(len(txt))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_words": nws,
                    "mean_raw": means,
                    "n_stop_hits": stops_,
                    "n_symbols": syms,
                    "n_chars_raw": ncs,
                }
            )

    kern = docs.select("doc_id", "text").mapInPandas(gen, schema)
    return kern.select(
        "doc_id",
        "n_words",
        str_round6(F.col("mean_raw")).alias("mean_word_len"),
        "n_stop_hits",
        str_round6(
            F.col("n_symbols").cast("double") / F.col("n_chars_raw")
        ).alias("symbol_ratio"),
    )


def gopher_keep_col() -> Column:
    """The conjunction of the four rule predicates (mirrors
    ``_SQL_GOPHER_KEEP``)."""
    return (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(
            GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
        )
        & (F.col("n_stop_hits") >= GOPHER_MIN_STOP_HITS)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
    )


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH {_SQL_GOPHER_M}
    SELECT doc_id, n_words, mean_word_len, n_stop_hits, symbol_ratio,
           CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                AS BOOLEAN) AS r_word_count,
           CAST(mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                AND {GOPHER_MAX_MEAN_WORD_LEN} AS BOOLEAN) AS r_mean_len,
           CAST(n_stop_hits >= {GOPHER_MIN_STOP_HITS} AS BOOLEAN)
             AS r_stopwords,
           CAST(symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO} AS BOOLEAN)
             AS r_symbols,
           CAST(n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                AND mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                    AND {GOPHER_MAX_MEAN_WORD_LEN}
                AND n_stop_hits >= {GOPHER_MIN_STOP_HITS}
                AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}
                AS BOOLEAN) AS keep
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style heuristic quality rules, one bit per
    rule plus the conjunction.

    One projection pass, no aggregation — but NOT all codegen: the
    mean-word-length fold and stopword filter are higher-order-
    function lambdas (interpreted), so the one-split fixture scan is
    repartitioned first, same as text_quality_score.  Thresholds are
    tuned to the fixture's word-count range so both keep and drop
    outcomes occur — the published bounds (50..100k words etc.) slot
    into the same constants at production scale.
    """
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    m = gopher_metrics_frame(docs)
    r_words = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    r_mean = F.col("mean_word_len").between(
        GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
    )
    r_stop = F.col("n_stop_hits") >= GOPHER_MIN_STOP_HITS
    r_sym = F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "n_stop_hits",
        "symbol_ratio",
        r_words.alias("r_word_count"),
        r_mean.alias("r_mean_len"),
        r_stop.alias("r_stopwords"),
        r_sym.alias("r_symbols"),
        (r_words & r_mean & r_stop & r_sym).alias("keep"),
    )


# -- deterministic global shuffle -------------------------------------------

SHUFFLE_SEED = "shuffle42"
N_SHUFFLE_SHARDS = 16


def global_shuffle_frame(
    docs: DataFrame,
    seed: str = SHUFFLE_SEED,
    n_shards: int = N_SHUFFLE_SHARDS,
) -> DataFrame:
    """(doc_id, shard_id, shard_rank) for any frame with a doc_id."""
    skey = F.md5(
        F.concat(
            F.lit(f"{seed}:"), F.col("doc_id").cast("string")
        ).cast("binary")
    )
    nib = lambda c, i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(c, i, 1)
    ) - 1
    s = docs.select("doc_id", skey.alias("skey")).select(
        "doc_id",
        "skey",
        (
            (nib(F.col("skey"), 1) * 16 + nib(F.col("skey"), 2)).cast("int")
            % n_shards
        ).alias("shard_id"),
    )
    w = W.partitionBy("shard_id").orderBy("skey", "doc_id")
    return s.select(
        "doc_id",
        "shard_id",
        F.row_number().over(w).cast("long").alias("shard_rank"),
    )


@query(
    "trainprep_global_shuffle",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS skey
      FROM documents
    ),
    s AS (
      SELECT doc_id, skey,
             CAST((instr('0123456789abcdef', substr(skey, 1, 1)) - 1) * 16
                + (instr('0123456789abcdef', substr(skey, 2, 1)) - 1)
                AS INT) % {N_SHUFFLE_SHARDS} AS shard_id
      FROM k
    )
    SELECT doc_id, shard_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard_id ORDER BY skey, doc_id
           ) AS BIGINT) AS shard_rank
    FROM s
    """,
)
def trainprep_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded training-order shuffle: every doc gets a
    shard (first md5 byte mod N) and a rank inside the shard (order by
    the md5 key).

    Scale shape: the shuffle order is defined by (shard_id,
    shard_rank) jointly — readers consume shards round-robin — so the
    ROW_NUMBER window is partitioned by shard, each ~corpus/N rows and
    hash-balanced.  A single global ROW_NUMBER would funnel the corpus
    through one partition; this never does.
    """
    return global_shuffle_frame(load_table(spark, sf_dir, "documents"))


# -- PII scan / redaction ---------------------------------------------------

# deliberately lookaround-free so Java (Spark) and RE2 (DuckDB)
# interpret them identically
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{7,15}"


def redact_col(c: Column) -> Column:
    """Fully-redacted text: the chain is email → IPv4 → phone so a
    match is consumed by exactly one category; the replacement tags
    themselves can never re-match (property-tested idempotent)."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )


def pii_scan_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII counts + the md5 of the fully-redacted text.

    One projection pass.  Reused by the gated fixture query below and
    directly unit-tested on planted PII rows (the fixture itself
    contains none).
    """
    c = F.col(text_col)
    redacted = redact_col(c)
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PII_IPV4), F.lit(0)))
        .cast("long")
        .alias("n_ipv4"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


@query(
    "text_pii_scan",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS BIGINT)
             AS n_ipv4,
           CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
             AS n_phones,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                   '{PII_IPV4}', '<IP>', 'g'),
                 '{PII_PHONE}', '<PHONE>', 'g')) AS redacted_md5
    FROM documents
    """,
)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan over the corpus (see :func:`pii_scan_frame`).

    The synthetic fixture contains zero PII, so the gate's value hash
    verifies the regex/redaction expression parity at zero hits (every
    redacted_md5 must equal md5(text) in both engines); planted-PII
    behavior is pytest-verified.

    Six regex passes per row is CPU-heavy enough to repartition the
    one-split fixture scan first (CLAUDE.md rule).
    """
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return pii_scan_frame(docs)


# -- fuzzy (MinHash-LSH) decontamination ------------------------------------

#: stand-in "benchmark" split for the FUZZY decontam: every 5th doc.
#: Denser than EVAL_MOD=97 so the fixture's near-dup clusters actually
#: cross the corpus/eval boundary (mod-97 leaves zero LSH candidates at
#: sf0.01 — a 0-row gate proves nothing).  Production contract is the
#: same: a small fixed benchmark corpus.
FUZZY_EVAL_MOD = 5


def _fuzzy_decontam_oracle() -> str:
    from bitcoin_datawarehouse_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        MINHASH_BAND_SIZE,
        MINHASH_SEEDS,
    )

    return f"""
    WITH {_SQL_SHING},
    mh AS (
      SELECT s.doc_id, g.seed,
             MIN(md5(CAST(g.seed AS VARCHAR) || ':' || s.sh)) AS minh
      FROM shing s
      CROSS JOIN (SELECT unnest(generate_series(0, {MINHASH_SEEDS - 1}))
                  AS seed) g
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT doc_id,
             seed // {MINHASH_BAND_SIZE} AS band,
             md5(string_agg(minh, ',' ORDER BY seed)) AS band_key
      FROM mh
      GROUP BY doc_id, seed // {MINHASH_BAND_SIZE}
    ),
    cand AS (
      SELECT DISTINCT c.doc_id, e.doc_id AS eval_doc_id
      FROM bands c
      JOIN bands e ON c.band = e.band AND c.band_key = e.band_key
      WHERE c.doc_id % {FUZZY_EVAL_MOD} <> 0
        AND e.doc_id % {FUZZY_EVAL_MOD} = 0
    ),
    common AS (
      SELECT cd.doc_id, cd.eval_doc_id, COUNT(*) AS n_common
      FROM cand cd
      JOIN shing s1 ON s1.doc_id = cd.doc_id
      JOIN shing s2 ON s2.doc_id = cd.eval_doc_id AND s2.sh = s1.sh
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT cd.doc_id, cd.eval_doc_id,
             COALESCE(
               CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common),
               0.0) AS jaccard
      FROM cand cd
      LEFT JOIN common ON common.doc_id = cd.doc_id
                      AND common.eval_doc_id = cd.eval_doc_id
      JOIN sizes sa ON sa.doc_id = cd.doc_id
      JOIN sizes sb ON sb.doc_id = cd.eval_doc_id
    )
    SELECT doc_id, eval_doc_id, jaccard,
           CAST(jaccard >= {JACCARD_THRESHOLD} AS BOOLEAN) AS contaminated
    FROM (
      SELECT doc_id, eval_doc_id, jaccard,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY jaccard DESC, eval_doc_id
             ) AS rn
      FROM scored
    ) WHERE rn = 1
    """


@query("decontam_minhash_fuzzy", oracle=_fuzzy_decontam_oracle())
def decontam_minhash_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination: flag corpus documents whose
    3-gram shingle set is NEAR-duplicate (Jaccard ≥ threshold) to any
    eval-set document — the MinHash-LSH complement of the exact-overlap
    ``decontam_ngram_overlap`` (rephrased/partial benchmark leakage
    that exact n-gram matching misses at low overlap fractions).

    Per corpus doc the best-matching eval doc is reported (max
    Jaccard, ties to the smallest eval_doc_id) with the contamination
    verdict.  Scale shape: one Arrow kernel pass computes every doc's
    packed shingle set + band keys (shared with the dedup family,
    cached once); the eval side of the band join is the benchmark
    suite — bounded by construction, broadcast like the exact
    decontam's shingle artifact; candidate pairs are verified with an
    exact ``array_intersect`` and reduced per doc by a ``min_by`` hash
    aggregate (no window sort).  Corpus-sized data crosses the plan
    exactly once, in the kernel repartition.
    """
    from bitcoin_datawarehouse_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        SH_SEP,
        band_keys_from_sets,
        doc_shingle_sets,
    )

    from bitcoin_datawarehouse_spark.pipeline.loader import (
        BROADCAST_BATCH_MAX_ROWS,
    )

    docsets = cache_tracked(doc_shingle_sets(spark, sf_dir))
    is_eval = F.col("doc_id") % FUZZY_EVAL_MOD == 0
    # Benchmark suites are bounded by construction, but the same
    # size guard as the loader/incremental paths applies: a
    # mislabeled corpus-sized "eval set" must take the shuffle join,
    # never a forced driver-memory broadcast.  ONE action does double
    # duty (the dedup_incremental_batch pattern, r12): it eagerly
    # fills the docsets cache (bands + both verify sides read it) AND
    # returns the eval-side row count for the broadcast guard —
    # replacing the separate fill-count + gate-count pair.
    n_eval = docsets.agg(
        F.sum(is_eval.cast("long")).alias("n")
    ).first()["n"]
    eval_is_small = (n_eval or 0) <= BROADCAST_BATCH_MAX_ROWS

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if eval_is_small else df

    bands = band_keys_from_sets(docsets)
    ev_bands = bands.filter(is_eval).select(
        F.col("doc_id").alias("eval_doc_id"), "band", "band_key"
    )
    cand = (
        bands.filter(~is_eval)
        .join(_b(ev_bands), ["band", "band_key"])
        .select("doc_id", "eval_doc_id")
        .distinct()
    )
    sets_c = docsets.select(
        "doc_id", F.col("shs").alias("shs_c"), F.col("sz").alias("sz_c")
    )
    sets_e = docsets.filter(is_eval).select(
        F.col("doc_id").alias("eval_doc_id"),
        F.col("shs").alias("shs_e"),
        F.col("sz").alias("sz_e"),
    )
    n_common = F.size(
        F.array_intersect(
            F.split(F.col("shs_c"), SH_SEP), F.split(F.col("shs_e"), SH_SEP)
        )
    )
    scored = (
        cand.join(sets_c, "doc_id")
        .join(_b(sets_e), "eval_doc_id")
        .select(
            "doc_id",
            "eval_doc_id",
            (
                n_common.cast("double")
                / (F.col("sz_c") + F.col("sz_e") - n_common)
            ).alias("jaccard"),
        )
    )
    best = scored.groupBy("doc_id").agg(
        F.max("jaccard").alias("jaccard"),
        F.min_by(
            "eval_doc_id", F.struct(-F.col("jaccard"), F.col("eval_doc_id"))
        ).alias("eval_doc_id"),
    )
    return best.select(
        "doc_id",
        "eval_doc_id",
        "jaccard",
        (F.col("jaccard") >= JACCARD_THRESHOLD).alias("contaminated"),
    )
