"""BPE tokenizer TRAINING as iterative DataFrame aggregates
(SURVEY.md §2.12 north-star family — the tokenizer-training half of
an LLM data pipeline, next to the scoring/dedup/packing operators;
r7 VERDICT item 6).

Byte-pair encoding (Sennrich et al. 2016): start from the corpus
word-frequency table with words split into single-character symbols;
each round, count every ADJACENT symbol pair weighted by word
frequency (overlaps count — the reference ``get_stats``), merge the
most frequent pair everywhere (greedy left-to-right non-overlapping —
the reference ``merge_vocab``), repeat N rounds.  The merge table IS
the trained tokenizer.

Spark-first shape:

* ONE corpus pass builds the word-frequency table (explode → hash
  aggregate with map-side combine) — after that, every round touches
  only the VOCABULARY-sized frame, never the corpus.  At 100 TB the
  corpus aggregate is the only heavy stage; vocabulary is millions of
  rows at web scale, comfortably distributed.
* Symbol sequences ride as ONE DELIMITED STRING per word —
  ``low → [l][o][w]`` (the CLAUDE.md pack-set-columns rule: array
  columns cache/shuffle as slow generic objects).  The bracket form
  makes both BPE primitives single built-in JVM expressions:
  pair counting = ``regexp_extract_all`` + slice-zip explode
  (overlap-counting, exactly ``get_stats``), and the merge =
  ``replace(s, '[a][b]', '[ab]')`` — literal left-to-right
  non-overlapping replacement, exactly ``merge_vocab``'s greedy scan
  (pytest-pinned against an independent python reference).  Tokens
  are ``[a-z0-9]+`` so the delimiters can never collide.
* Rounds follow the PageRank superstep discipline: the words frame is
  eagerly localCheckpoint-ed per round (lineage truncation; blocks
  are RDD-owned, ContextCleaner-reclaimed), and the driver collects
  only the ONE-ROW argmax per round (bounded planning state — the
  codebook pattern).  Ties break on (count DESC, pair_a, pair_b) —
  tokens are ASCII so both engines compare identically.

The oracle unrolls the N rounds as CTE chains (w0 → p0 → b0 → w1 →
…) — DuckDB recomputes the identical word table, pair counts, argmax
and replacement per round, so the hash gate proves the whole
iterative training loop cross-engine.  Every count is an exact
integer; no float surface at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import (
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.operators.dedup import tokens_col
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

#: merge rounds of the registered gate query (parametric in
#: production — a real tokenizer runs tens of thousands)
BPE_MERGE_ROUNDS = 8

_SQL_TOKENS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " t -> t <> '')"
)


def bpe_word_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, cnt): corpus word frequencies with words pre-split into
    bracketed single-character symbols — the one corpus-sized pass."""
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    return (
        docs.repartition(par)
        .select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .select(
            F.regexp_replace("word", "(.)", "[$1]").alias("s"), "cnt"
        )
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, c): adjacent-symbol pair counts weighted by word
    frequency — overlaps count, mirroring the reference
    ``get_stats`` (and the oracle's slice-zip)."""
    toks = F.regexp_extract_all(F.col("s"), F.lit(r"\[([^\]]*)\]"), F.lit(1))
    zipped = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
    )
    return (
        words.select(F.explode(zipped).alias("p"), "cnt")
        .select(
            F.col("p")["0"].alias("a"), F.col("p")["1"].alias("b"), "cnt"
        )
        .groupBy("a", "b")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )


def bpe_train(
    words: DataFrame, n_rounds: int
) -> list[tuple[int, str, str, str, int]]:
    """Run ``n_rounds`` of pair-merge training over a (s, cnt) word
    table; returns the merge table rows
    ``(merge_round, pair_a, pair_b, merged, pair_count)``.

    Driver-coordinated supersteps, data never: per round one
    vocabulary-sized aggregate + a 1-row TakeOrdered collect, then the
    literal replace + eager localCheckpoint.  Stops early if no pairs
    remain (fully merged vocabulary)."""
    words = words.localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(n_rounds):
        best = (
            _pair_counts(words)
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((r, a, b, a + b, c))
        words = words.select(
            F.replace(
                F.col("s"), F.lit(f"[{a}][{b}]"), F.lit(f"[{a}{b}]")
            ).alias("s"),
            "cnt",
        ).localCheckpoint()
    return merges


def _bpe_oracle(n_rounds: int) -> str:
    parts = [
        f"""w0 AS (
      SELECT regexp_replace(word, '(.)', '[\\1]', 'g') AS s,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_SQL_TOKENS}) AS word FROM documents)
      GROUP BY 1
    )"""
    ]
    for r in range(n_rounds):
        parts.append(
            f"""t{r} AS (
      SELECT regexp_extract_all(s, '\\[([^\\]]*)\\]', 1) AS toks, cnt
      FROM w{r}
    ),
    p{r} AS (
      SELECT pr[1] AS a, pr[2] AS b, CAST(SUM(cnt) AS BIGINT) AS c
      FROM t{r}, UNNEST(list_zip(toks[1:-2], toks[2:])) AS u(pr)
      GROUP BY 1, 2
    ),
    b{r} AS (SELECT a, b, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1),
    w{r + 1} AS (
      SELECT replace(s, '[' || a || '][' || b || ']',
                     '[' || a || b || ']') AS s, cnt
      FROM w{r} CROSS JOIN b{r}
    )"""
        )
    sel = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS merge_round, a AS pair_a,"
        f" b AS pair_b, a || b AS merged, c AS pair_count FROM b{r}"
        for r in range(n_rounds)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + sel


def _encode_oracle(n_rounds: int) -> str:
    """Train-then-APPLY oracle: the full training CTE chain, then the
    corpus re-tokenized with every learned merge applied in order —
    per round one literal ``replace`` over the bracketed form with the
    (a, b) values riding in from that round's argmax CTE."""
    train = _bpe_oracle(n_rounds)
    with_part = train[: train.rindex("\n    SELECT")]  # drop final SELECT
    enc_chain = []
    prev = "e0"
    for r in range(n_rounds):
        # LEFT JOIN ON TRUE, not CROSS JOIN: when training stopped
        # early (b{r} empty — a fully merged / single-char vocabulary)
        # the Spark side applies no further merges, so the oracle must
        # pass the corpus through unchanged instead of annihilating it
        # (review-caught: a CROSS JOIN with an empty b{r} emptied every
        # later e{k} and returned zero rows against Spark's full count)
        enc_chain.append(
            f"""e{r + 1} AS (
      SELECT doc_id,
             CASE WHEN b{r}.a IS NULL THEN s
                  ELSE replace(s, '[' || b{r}.a || '][' || b{r}.b || ']',
                               '[' || b{r}.a || b{r}.b || ']')
             END AS s
      FROM {prev} LEFT JOIN b{r} ON TRUE
    )"""
        )
        prev = f"e{r + 1}"
    enc_joined = ",\n    ".join(enc_chain)
    return f"""{with_part},
    docw AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS word FROM documents
    ),
    e0 AS (
      SELECT doc_id,
             regexp_replace(word, '(.)', '[\\1]', 'g') AS s
      FROM docw
    ),
    {enc_joined}
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(s) - length(replace(s, '[', '')))
                AS BIGINT) AS n_bpe_tokens,
           {SQL_STR_ROUND6(
               "CAST(SUM(length(s) - length(replace(s, '[', '')))"
               " AS DOUBLE) / COUNT(*)"
           )} AS bpe_per_word
    FROM {prev}
    GROUP BY doc_id
    """


@query("text_bpe_encode", oracle=_encode_oracle(BPE_MERGE_ROUNDS))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer train → APPLY, end to end: the corpus encoded with
    the ``BPE_MERGE_ROUNDS`` merges :func:`text_bpe_merges` learns —
    per document its word count, BPE token count, and tokens-per-word
    (the compression statistic a tokenizer-training loop monitors).

    The apply side is the production-relevant half at 100 TB: the
    trained merge table is a BOUNDED driver artifact (the codebook
    pattern), so encoding is one stateless JVM projection — explode
    words → bracketize → the N merges as CHAINED LITERAL ``replace``
    calls inside whole-stage codegen (no Python, no HOF lambdas; the
    CLAUDE.md rule about interpreted codebook-in-lambda re-evaluation
    is exactly what this shape avoids) — then one (doc_id)-keyed hash
    aggregate with map-side combine.  Token count per word is
    ``count('[')`` over the bracketed form.

    The oracle re-trains in SQL (the unrolled CTE chain) and applies
    each round's argmax via CROSS JOIN — so the gate proves train AND
    apply cross-engine, including that both engines learned the SAME
    merges.
    """
    merges = bpe_train(
        bpe_word_table(spark, sf_dir), BPE_MERGE_ROUNDS
    )
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    s = F.regexp_replace(F.col("word"), "(.)", "[$1]")
    for _, a, b, _m, _c in merges:
        s = F.replace(s, F.lit(f"[{a}][{b}]"), F.lit(f"[{a}{b}]"))
    n_tok = F.length(s) - F.length(F.replace(s, F.lit("["), F.lit("")))
    return (
        docs.repartition(par)
        .select(
            "doc_id", F.explode(tokens_col(F.col("text"))).alias("word")
        )
        .select("doc_id", n_tok.alias("nt"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("nt").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            str_round6(
                F.col("n_bpe_tokens").cast("double") / F.col("n_words")
            ).alias("bpe_per_word"),
        )
    )


@query("text_bpe_merges", oracle=_bpe_oracle(BPE_MERGE_ROUNDS))
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first ``BPE_MERGE_ROUNDS`` byte-pair merges trained on the
    documents corpus: (merge_round, pair_a, pair_b, merged,
    pair_count) — deterministic tie-break on (count DESC, pair), all
    integer-exact (module docstring has the full design).

    The returned frame is the collected merge table re-created on the
    driver — the merge table is the OUTPUT of an iterative driver-
    coordinated training loop and is bounded by the round count (the
    codebook pattern); the distributed work is the corpus aggregate +
    the per-round vocabulary passes inside :func:`bpe_train`.
    """
    merges = bpe_train(
        bpe_word_table(spark, sf_dir), BPE_MERGE_ROUNDS
    )
    return spark.createDataFrame(
        merges,
        "merge_round int, pair_a string, pair_b string,"
        " merged string, pair_count bigint",
    )
