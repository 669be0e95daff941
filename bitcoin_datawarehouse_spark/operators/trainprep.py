"""Training-data preparation operators (SURVEY.md §2.12 family).

The three standard transforms between "deduped corpus" and "training
shards" in an LLM data pipeline, each deterministic and hash-gated:

* **hash split** — stable train/val/test assignment from md5 of the
  document key: reproducible across runs/engines, no RNG state, and
  membership survives corpus growth (a doc never migrates).
* **sequence packing** (concat-then-chunk) — cumulative token budget
  per shard assigns each document a chunk id + offset; the window is
  partitioned by the shard key (``source``), so state is per-shard —
  the same layout a 1000-worker tokenizer writes.
* **int8 quantization** — per-vector absmax scalar quantization of
  embeddings; ``floor(x/scale + 0.5)`` instead of ROUND so both
  engines round identically.

At 100 TB: the split is a stateless projection (codegen); packing is
one window per shard partition (shards are bounded by construction —
a shard is what one worker wrote); quantization is a projection over
the array column.  Nothing shuffles except packing's per-shard sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.numeric import (
    DEC,
    SQL_DEC,
    SQL_STR_ROUND6,
    str_round6,
)
from bitcoin_datawarehouse_spark.operators.text import _SQL_TOKENS
from bitcoin_datawarehouse_spark.functions.scalars import scalar_cross
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

# split fractions in 256ths of the hash space: [0,229)=train ~0.895,
# [229,242)=val ~0.05, [242,256)=test ~0.055
SPLIT_TRAIN_MAX = 229
SPLIT_VAL_MAX = 242

PACK_BUDGET = 256  # tokens per packed chunk

QUANT_MAX = 127  # int8 absmax


@query(
    "trainprep_hash_split",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           + (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               AS bucket
      FROM documents
    )
    SELECT doc_id, CAST(bucket AS INT) AS bucket,
           CASE WHEN bucket < {SPLIT_TRAIN_MAX} THEN 'train'
                WHEN bucket < {SPLIT_VAL_MAX} THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
)
def trainprep_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: the first md5 byte of
    the key partitions the hash space 90/5/5.

    Stateless projection — no shuffle, no RNG; the same doc gets the
    same split in any engine, any run, any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.col("doc_id").cast("string").cast("binary"))
    nib = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(hx, i, 1)
    ) - 1
    bucket = (nib(1) * 16 + nib(2)).cast("int")
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < SPLIT_TRAIN_MAX, "train")
        .when(bucket < SPLIT_VAL_MAX, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "trainprep_pack_sequences",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'))
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS start_offset
      FROM toks
    )
    SELECT doc_id, source, n_tokens,
           CAST(start_offset AS BIGINT) AS start_offset,
           CAST(start_offset // {PACK_BUDGET} AS BIGINT) AS chunk_id,
           CAST((start_offset + n_tokens - 1) // {PACK_BUDGET}
                <> start_offset // {PACK_BUDGET} AS BOOLEAN)
             AS crosses_boundary
    FROM packed
    """,
)
def trainprep_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: within each shard
    (``source``), documents are laid end to end in doc_id order and
    cut into PACK_BUDGET-token chunks; each doc gets its byte-stream
    offset, owning chunk, and whether it straddles a chunk boundary.

    The exact layout GPT-style pretraining uses (documents
    concatenated, loss mask handles the joins).  Window state is
    per-shard — a shard is one tokenizer-worker's output, so the
    partition is bounded by construction and the cumsum never needs a
    global order.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    ).cast("long")
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    toks = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    packed = toks.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    chunk = F.floor(F.col("start_offset") / PACK_BUDGET)
    last_chunk = F.floor(
        (F.col("start_offset") + F.col("n_tokens") - 1) / PACK_BUDGET
    )
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        chunk.alias("chunk_id"),
        (last_chunk != chunk).alias("crosses_boundary"),
    )


@query(
    "trainprep_quantize_int8",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    s AS (
      SELECT vec_id, e,
             list_reduce(list_transform(e, x -> abs(x)),
                         (acc, x) -> CASE WHEN x > acc THEN x ELSE acc END)
               / {QUANT_MAX} AS scale
      FROM v
    )
    SELECT vec_id, CAST(i - 1 AS INT) AS dim,
           CAST(CASE WHEN scale = 0 THEN 0
                     ELSE floor(x / scale + 0.5) END AS INT) AS q,
           scale
    FROM (SELECT vec_id, scale, generate_subscripts(e, 1) AS i,
                 unnest(e) AS x
          FROM s)
    """,
)
def trainprep_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector absmax int8 quantization of the embedding column —
    the 4× storage cut applied before ANN indexes are written at
    corpus scale.

    ``floor(x/scale + 0.5)`` is used in both engines instead of ROUND
    (whose half-way rule is engine-dependent), so the quantized codes
    are bit-identical.  Long-form output (vec_id, dim, q, scale)
    keeps every column scalar for the driver's canonicalizer.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    absmax = F.aggregate(
        F.transform(F.col("e"), lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.when(x > acc, x).otherwise(acc),
    )
    s = emb.withColumn("scale", absmax / QUANT_MAX)
    q = F.when(F.col("scale") == 0, F.lit(0)).otherwise(
        F.floor(F.col("col") / F.col("scale") + 0.5)
    )
    return (
        s.select("vec_id", "scale", F.posexplode("e"))
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("dim"),
            q.cast("int").alias("q"),
            "scale",
        )
    )


# Domain-mixture weights: keep-fraction per source in 256ths of the
# md5-bucket space (e.g. 64 → keep 1/4 of that domain).  A production
# run derives these from the target token mixture; unlisted sources
# use MIX_DEFAULT.
MIX_WEIGHTS = {"src0": 256, "src1": 64, "src2": 128, "src3": 32}
MIX_DEFAULT = 192


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in MIX_WEIGHTS.items()
    )
    return f"CASE {arms} ELSE {MIX_DEFAULT} END"


@query(
    "trainprep_domain_mixture",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           + (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               AS bucket
      FROM documents
    )
    SELECT doc_id, source, CAST(bucket AS INT) AS bucket,
           CAST({_mix_case_sql()} AS INT) AS keep_threshold
    FROM h
    WHERE bucket < {_mix_case_sql()}
    """,
)
def trainprep_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture downsampling: each source keeps
    ``weight/256`` of its documents, selected by the md5 bucket of the
    key — the reproducible way to hit a target domain mix (RNG
    sampling gives a different corpus every run and engine).

    Stateless projection + filter; composes with trainprep_hash_split
    (independent hash bytes would be used in production — same byte
    here keeps the fixture oracle simple)."""
    docs = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.col("doc_id").cast("string").cast("binary"))
    nib = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(hx, i, 1)
    ) - 1
    bucket = (nib(1) * 16 + nib(2)).cast("int")
    thr = F.lit(MIX_DEFAULT)
    for s, w in reversed(MIX_WEIGHTS.items()):
        thr = F.when(F.col("source") == s, w).otherwise(thr)
    return (
        docs.select(
            "doc_id",
            "source",
            bucket.alias("bucket"),
            thr.cast("int").alias("keep_threshold"),
        )
        .filter(F.col("bucket") < F.col("keep_threshold"))
    )


TOKEN_BUDGET = 500_000  # global training-token budget (fixture-sized)


@query(
    "trainprep_token_budget",
    oracle=rf"""
    WITH toks AS (
      SELECT source,
             CAST(len(regexp_extract_all(lower(text),
                  '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(n_tokens) AS n_tokens
      FROM toks GROUP BY source
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           {SQL_STR_ROUND6(
               'CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()'
           )}
             AS corpus_share,
           CAST(FLOOR({TOKEN_BUDGET} * CAST(n_tokens AS DOUBLE)
                      / SUM(n_tokens) OVER ()) AS BIGINT) AS alloc_tokens,
           {SQL_STR_ROUND6(
               f'CAST(CAST(FLOOR({TOKEN_BUDGET} * CAST(n_tokens AS DOUBLE)'
               ' / SUM(n_tokens) OVER ()) AS BIGINT) AS DOUBLE) / n_tokens'
           )} AS epochs
    FROM per_src
    """,
)
def trainprep_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token accounting under a global training budget:
    docs, tokens, share of the corpus, the proportional token
    allocation, and the epochs (repeats) of the source that allocation
    implies — the planning view a mixture designer reads before
    setting trainprep_domain_mixture's weights.

    One hash aggregate (integer sums — exact, order-independent) plus
    an unpartitioned window over the PER-SOURCE result, which is
    bounded by the number of domains (tens, never corpus-sized).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    ).cast("long")
    per = docs.select("source", n_tokens.alias("n_tokens")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    # bounded: `per` is one row per domain (tens) — never copy this
    # unpartitioned window onto a corpus-sized frame
    total = F.sum("n_tokens").over(W.partitionBy())
    alloc = F.floor(
        F.lit(TOKEN_BUDGET) * F.col("n_tokens").cast("double") / total
    ).cast("long")
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        str_round6(F.col("n_tokens").cast("double") / total).alias(
            "corpus_share"
        ),
        alloc.alias("alloc_tokens"),
        str_round6(alloc.cast("double") / F.col("n_tokens")).alias("epochs"),
    )


# ---------------------------------------------------------------------------
# Flagship composite: corpus → training shards in one plan
# ---------------------------------------------------------------------------

QUALITY_MIN = 0.5  # keeps ~3/4 of the fixture corpus (p25 ≈ 0.52)


@query(
    "trainprep_corpus_pipeline",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_tokens_q,
             CAST(length(text) AS BIGINT) AS n_chars_obs,
             CAST(len(list_filter(tk,
               t -> t IN ('the','a','of','to','and','is','in','it')))
               AS BIGINT) AS n_stop,
             CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
               AS BIGINT) AS n_punct
      FROM (SELECT doc_id, text, {_SQL_TOKENS} AS tk FROM documents)
    ),
    scored AS (
      SELECT doc_id,
             (CAST(n_stop AS DOUBLE) / n_tokens_q) * 0.5
               + CASE WHEN n_tokens_q >= 20 THEN 0.3 ELSE 0.0 END
               + CASE WHEN CAST(n_punct AS DOUBLE) / n_chars_obs < 0.1
                      THEN 0.2 ELSE 0.0 END AS quality_score
      FROM base WHERE n_tokens_q > 0
    ),
    keep AS (
      SELECT d.doc_id, d.text, d.source
      FROM documents d JOIN scored s ON s.doc_id = d.doc_id
      WHERE s.quality_score >= {QUALITY_MIN}
    ),
    canon AS (
      SELECT MIN(doc_id) AS doc_id FROM keep GROUP BY md5(text)
    ),
    surv AS (
      SELECT k.doc_id, k.text, k.source
      FROM keep k JOIN canon c ON c.doc_id = k.doc_id
    ),
    with_split AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(lower(text),
                  '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens,
             (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           + (instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               AS bucket
      FROM surv
    ),
    packed AS (
      SELECT doc_id, source, n_tokens,
             CASE WHEN bucket < {SPLIT_TRAIN_MAX} THEN 'train'
                  WHEN bucket < {SPLIT_VAL_MAX} THEN 'val'
                  ELSE 'test' END AS split,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY CASE WHEN bucket < {SPLIT_TRAIN_MAX} THEN 'train'
                                 WHEN bucket < {SPLIT_VAL_MAX} THEN 'val'
                                 ELSE 'test' END, source
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS start_offset
      FROM with_split
    )
    SELECT doc_id, source, split, n_tokens,
           CAST(start_offset AS BIGINT) AS start_offset,
           CAST(start_offset // {PACK_BUDGET} AS BIGINT) AS chunk_id
    FROM packed
    """,
)
def trainprep_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composite: the whole corpus→shards pipeline as ONE
    declarative plan — quality gate (Gopher-style heuristics) → exact
    dedup (canonical min doc_id per content hash) → hash split →
    per-(split, shard) sequence packing.

    Each stage is individually gated elsewhere
    (text_quality_score, dedup_exact_docs, trainprep_*); this query
    proves the composition end to end AND that Catalyst plans it as
    one job: the quality filter and dedup are hash-aggregates feeding
    the split projection, packing is the only window, and nothing
    materializes between stages.

    At scale this is the shape that matters: a 100 TB corpus flows
    through scan → projection-filter → one dedup window → one packing
    window without a single driver round-trip, cache barrier, or
    self-join: quality scoring is inlined as a projection over the
    same scan (round 2 joined two full scans of ``documents`` on
    doc_id), and canonical-per-content-hash is a row_number window
    over the hash (round 2 hash-aggregated then re-joined the corpus).
    """
    from bitcoin_datawarehouse_spark.operators.text import quality_frame

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    keep = (
        quality_frame(docs, keep=["text", "source"])
        .filter(F.col("quality_score") >= QUALITY_MIN)
        .select("doc_id", "text", "source")
    )
    wdedup = W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    surv = (
        keep.withColumn("_rn", F.row_number().over(wdedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    n_tokens = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    ).cast("long")
    hx = F.md5(F.col("doc_id").cast("string").cast("binary"))
    nib = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(hx, i, 1)
    ) - 1
    bucket = nib(1) * 16 + nib(2)
    split = (
        F.when(bucket < SPLIT_TRAIN_MAX, "train")
        .when(bucket < SPLIT_VAL_MAX, "val")
        .otherwise("test")
    )
    with_split = surv.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        split.alias("split"),
    )
    w = (
        W.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = with_split.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return packed.select(
        "doc_id",
        "source",
        "split",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / PACK_BUDGET).alias("chunk_id"),
    )


SAMPLE_PER_STRATUM = 10


@query(
    "trainprep_stratified_sample",
    oracle=f"""
    SELECT source, doc_id, sample_rank FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= {SAMPLE_PER_STRATUM}
    """,
)
def trainprep_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-per-stratum sample: deterministic md5 order within each
    source, top SAMPLE_PER_STRATUM rows kept.

    Reproducible (pure function of doc_id), exact (precisely n per
    stratum, unlike Bernoulli ``sample()``), and rank-stable (growing
    a stratum never evicts a kept row from a *smaller* rank).  The
    window sorts within strata only — parallel across strata.  For a
    giant stratum at corpus scale, pre-filter with a hash threshold
    just above n/N before ranking so the sort touches a sliver of the
    stratum; the fixture strata are tiny, so the rank runs directly.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "source", "doc_id", F.row_number().over(w).alias("sample_rank")
        )
        .filter(F.col("sample_rank") <= SAMPLE_PER_STRATUM)
    )


# ---------------------------------------------------------------------------
# temperature-based mixture planning (multilingual-sampling standard)
# ---------------------------------------------------------------------------

#: training-doc budget the temperature plan allocates (fixture-sized)
MIX_TEMP_BUDGET = 300

#: source → domain rollup used by the temperature plan.  The fixture's
#: 20 sources are uniform (25 docs each) — a temperature renorm over
#: uniform shares is degenerate — so the plan groups them into four
#: domains with skewed sizes (10/6/3/1 sources), the shape real
#: corpora have (a dominant web crawl, long-tail curated sets).
_TEMP_DOMAIN_SQL = """CASE
      WHEN CAST(substr(source, 4) AS INT) < 10 THEN 'web'
      WHEN CAST(substr(source, 4) AS INT) < 16 THEN 'books'
      WHEN CAST(substr(source, 4) AS INT) < 19 THEN 'code'
      ELSE 'wiki' END"""

@query(
    "trainprep_mixture_temperature",
    oracle=f"""
    WITH dom AS (
      SELECT {_TEMP_DOMAIN_SQL} AS domain, COUNT(*) AS n_docs
      FROM documents
      GROUP BY 1
    ),
    q AS (
      SELECT domain, CAST(n_docs AS BIGINT) AS n_docs,
             CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS q_full
      FROM dom
    ),
    shares AS (
      SELECT domain, n_docs, q_full,
             SQRT(q_full)
               / CAST(CAST(SUM({SQL_DEC("SQRT(q_full)")}) OVER ()
                      AS STRING) AS DOUBLE) AS p_full
      FROM q
    )
    SELECT domain, n_docs,
           {SQL_STR_ROUND6("q_full")} AS natural_share,
           {SQL_STR_ROUND6("p_full")} AS temp_share,
           {SQL_STR_ROUND6(
               f"LEAST(1.0, (p_full * {MIX_TEMP_BUDGET}) / n_docs)"
           )} AS keep_rate,
           CAST(FLOOR(LEAST(1.0, (p_full * {MIX_TEMP_BUDGET}) / n_docs)
                      * n_docs) AS BIGINT) AS alloc_docs
    FROM shares
    """,
)
def trainprep_mixture_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-based mixture plan (the multilingual-sampling
    standard: sample domains ∝ q^α, α<1 upweights the tail): per
    domain, its natural share, the temperature share, and the keep
    rate that hits a global doc budget.

    α is 0.5 DELIBERATELY: SQRT is IEEE-correctly-rounded in both
    engines, so the whole chain (exact counts → one division → sqrt →
    exact-decimal renorm sum → division) is bit-reproducible and the
    query hash-gates.  A production α=0.3 needs POW = exp/ln — libm
    calls with engine-divergent last ulps (the PSI lesson,
    profile_drift_tv) — and would drop this to a rows-only gate.

    Scale shape: one hash aggregate over the corpus, then window
    arithmetic over #domains rows (bounded by construction).  The
    per-doc selection step composes exactly like
    trainprep_domain_mixture's md5-bucket filter with
    ``keep_rate*256`` as the threshold.
    """
    docs = load_table(spark, sf_dir, "documents")
    src_ix = F.substring(F.col("source"), 4, 10).cast("int")
    domain = (
        F.when(src_ix < 10, "web")
        .when(src_ix < 16, "books")
        .when(src_ix < 19, "code")
        .otherwise("wiki")
    )
    dom = docs.groupBy(domain.alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = W.partitionBy()  # bounded: one row per domain
    q_full = F.col("n_docs").cast("double") / F.sum("n_docs").over(w)
    sq = F.sqrt(q_full)
    p_full = sq / (
        F.sum(sq.cast(DEC)).over(w).cast("string").cast("double")
    )
    keep = F.least(
        F.lit(1.0), (p_full * MIX_TEMP_BUDGET) / F.col("n_docs")
    )
    return dom.select(
        "domain",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        str_round6(q_full).alias("natural_share"),
        str_round6(p_full).alias("temp_share"),
        str_round6(keep).alias("keep_rate"),
        F.floor(keep * F.col("n_docs")).cast("bigint").alias("alloc_docs"),
    )


# ---------------------------------------------------------------------------
# weighted Poisson sampling (importance sampling by document weight)
# ---------------------------------------------------------------------------

#: expected sample size the inclusion probabilities are scaled to
WEIGHTED_SAMPLE_K = 120

#: one md5 nibble → 0..15 (the trainprep_hash_split pattern, extended
#: to 8 nibbles = an exact 32-bit uniform draw per document)
_NIB_SQL = (
    "(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),"
    " {i}, 1)) - 1)"
)
_U32_SQL = " + ".join(
    f"{_NIB_SQL.format(i=i + 1)} * {16 ** (7 - i)}" for i in range(8)
)


@query(
    "trainprep_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             CAST(length(text) AS BIGINT) AS weight,
             CAST(({_U32_SQL}) AS DOUBLE) / 4294967296.0 AS u
      FROM documents
    ),
    tot AS (SELECT CAST(SUM(weight) AS DOUBLE) AS sw FROM w)
    SELECT doc_id, source, weight,
           {SQL_STR_ROUND6(
               f"LEAST(CAST(1.0 AS DOUBLE),"
               f" {WEIGHTED_SAMPLE_K} * CAST(weight AS DOUBLE) / sw)"
           )} AS incl_p
    FROM w, tot
    WHERE u < LEAST(CAST(1.0 AS DOUBLE),
                    {WEIGHTED_SAMPLE_K} * CAST(weight AS DOUBLE) / sw)
    """,
)
def trainprep_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weight-proportional Poisson sample: keep a document with
    probability ``min(1, K·w/Σw)`` — expected size K, inclusion
    probability ∝ weight (here ``length(text)``: token-budget-
    proportional sampling, the standard way to sample a fixed training
    budget so long documents aren't under-represented per token).

    Deterministic and engine-neutral END TO END, no RNG state: the
    uniform draw is 8 md5 nibbles → an exact 32-bit integer / 2³² (both
    steps exact in double), Σw is an exact BIGINT sum, and the
    threshold ``K·w/Σw`` is one correctly-rounded double division —
    identical bits in both engines, so the SAME documents are kept
    (re-running, growing the corpus, or switching engines never flips
    a kept doc except through Σw itself, which is the point of Poisson
    sampling: membership is per-doc independent).

    At 100 TB: one scalar aggregate (Σw, map-side combined) broadcast
    into a stateless filter projection — no shuffle of the corpus, no
    per-stratum sort (contrast ``trainprep_stratified_sample``'s
    rank).  The exposed ``incl_p`` is the Horvitz-Thompson inverse
    weight's denominator for downstream unbiased estimates.
    """
    docs = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.col("doc_id").cast("string").cast("binary"))
    nib = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(hx, i, 1)
    ) - 1
    u32 = sum(
        (
            nib(i + 1).cast("long") * F.lit(16 ** (7 - i)).cast("long")
            for i in range(8)
        ),
        start=F.lit(0).cast("long"),
    )
    w = docs.select(
        "doc_id",
        "source",
        F.length("text").cast("bigint").alias("weight"),
        (u32.cast("double") / F.lit(4294967296.0)).alias("u"),
    )
    sw = w.agg(F.sum("weight").cast("double").alias("sw"))
    p = F.least(
        F.lit(1.0),
        F.lit(WEIGHTED_SAMPLE_K) * F.col("weight").cast("double")
        / F.col("sw"),
    )
    return (
        scalar_cross(w, sw)
        .where(F.col("u") < p)
        .select(
            "doc_id", "source", "weight", str_round6(p).alias("incl_p")
        )
    )


# ---------------------------------------------------------------------------
# round 8: length-bucketed batching (padding-minimizing batch planner)
# ---------------------------------------------------------------------------

#: bucket CEILINGS (a doc goes to the smallest ceiling ≥ its length;
#: the last is an open top) and docs per batch.  Real trainers bucket
#: by powers-of-two-ish ceilings so sequences pad only to their
#: bucket's batch max, not the corpus max.
LENGTH_BUCKETS = [32, 48, 64, 96, 1 << 20]
LENGTH_BATCH_SIZE = 4

_BUCKET_SQL = (
    "CASE"
    + "".join(
        f" WHEN n_tok <= {b} THEN {b}" for b in LENGTH_BUCKETS[:-1]
    )
    + f" ELSE {LENGTH_BUCKETS[-1]} END"
)


@query(
    "trainprep_length_batches",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tok, CAST({_BUCKET_SQL} AS BIGINT) AS bucket
      FROM tk WHERE n_tok > 0
    ),
    r AS (
      SELECT doc_id, n_tok, bucket,
             CAST((ROW_NUMBER() OVER (
                     PARTITION BY bucket ORDER BY doc_id) - 1)
                  // {LENGTH_BATCH_SIZE} AS BIGINT) AS batch_ix
      FROM b
    )
    SELECT doc_id, n_tok, bucket, batch_ix,
           CAST(MAX(n_tok) OVER (PARTITION BY bucket, batch_ix)
                AS BIGINT) AS batch_max,
           CAST(MAX(n_tok) OVER (PARTITION BY bucket, batch_ix) - n_tok
                AS BIGINT) AS pad_waste
    FROM r
    """,
)
def trainprep_length_batches(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-bucketed batch planning — the dynamic-batching pass a
    trainer runs so sequences pad to their BATCH max instead of the
    corpus max: docs go to the smallest length-ceiling bucket, fill
    fixed-size batches in doc_id order within the bucket, and each
    doc reports its batch's max length and its own padding waste
    (Σ pad_waste is the tokens a naive corpus-max padder would burn
    per step, bucketed away).

    Scale shape — deliberately NOT a per-bucket ROW_NUMBER window:
    with a handful of buckets each window partition would hold
    ~corpus/|buckets| rows in ONE task (the single-partition-window
    class CLAUDE.md bans).  Instead the in-bucket order comes from
    the DISTRIBUTED global rank over (bucket, doc_id)
    (functions/ranking.py: range repartition + per-partition
    row_number + broadcast offsets); within a bucket global ranks are
    contiguous, so in-bucket rank = global rank − the bucket's min
    rank (a |buckets|-row aggregate broadcast back).  Batch maxima
    are a hash aggregate on (bucket, batch_ix) joined back
    co-partitioned — batches are LENGTH_BATCH_SIZE rows by
    construction, never a skewed group.  Every output is an exact
    integer, so the gate hash-checks bit-free.
    """
    from bitcoin_datawarehouse_spark.functions.ranking import (
        with_global_rank,
    )
    from bitcoin_datawarehouse_spark.operators.dedup import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    n_tok = F.size(tokens_col(F.col("text"))).cast("bigint")
    bucket = F.lit(LENGTH_BUCKETS[-1]).cast("bigint")
    for b in reversed(LENGTH_BUCKETS[:-1]):
        bucket = F.when(F.col("n_tok") <= b, F.lit(b).cast("bigint")).otherwise(
            bucket
        )
    base = (
        docs.repartition(par)
        .select("doc_id", n_tok.alias("n_tok"))
        .filter(F.col("n_tok") > 0)
        .withColumn("bucket", bucket)
    )
    ranked = with_global_rank(base, ["bucket", "doc_id"])
    offs = ranked.groupBy(F.col("bucket").alias("_b")).agg(
        F.min("global_rank").alias("_b0")
    )
    r = (
        ranked.join(
            F.broadcast(offs), ranked["bucket"] == offs["_b"]
        )
        .withColumn(
            "batch_ix",
            F.expr(
                f"CAST((global_rank - _b0) DIV {LENGTH_BATCH_SIZE}"
                " AS BIGINT)"
            ),
        )
        .select("doc_id", "n_tok", "bucket", "batch_ix")
    )
    maxes = r.groupBy(
        F.col("bucket").alias("_mb"), F.col("batch_ix").alias("_mi")
    ).agg(F.max("n_tok").alias("batch_max"))
    return (
        r.join(
            maxes,
            (r["bucket"] == maxes["_mb"])
            & (r["batch_ix"] == maxes["_mi"]),
        )
        .select(
            "doc_id",
            "n_tok",
            "bucket",
            "batch_ix",
            F.col("batch_max").cast("bigint").alias("batch_max"),
            (F.col("batch_max") - F.col("n_tok"))
            .cast("bigint")
            .alias("pad_waste"),
        )
    )
