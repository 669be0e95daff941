"""Language-model quality scoring (north-star extension).

CCNet (public arXiv:1911.00359) filters web corpora by the perplexity
of a language model over each document and splits the corpus into
head/middle/tail quality buckets at the score tertiles.  The
production scorer is a pretrained KenLM; the self-contained
Spark-shaped equivalent here trains the LM *inside the plan*: add-one
smoothed bigram statistics over the whole corpus, then a per-document
mean negative log2 probability (bits per token — the cross-entropy
the perplexity exponentiates).

Scale design:
* per-document bigram counts are finished INSIDE the Arrow tokenize
  kernel (a document is one input row, so its token positions are
  task-local — no corpus-wide position shuffle at all); the bigram
  table, unigram table, vocabulary size, per-document scoring, and
  token counts all derive from that cached aggregate (multiple
  subtrees over a raw explode would re-run the tokenizer);
* scoring joins the per-doc counts against the corpus count tables on
  their natural keys — equi-joins, no driver state (the vocabulary
  size is the one driver-side scalar, same pattern as tf-idf's
  ``n_docs``);
* the per-term ROUND(·, 6) before the decimal sum is the established
  cross-engine float-parity pattern (functions/numeric.py);
* bucket assignment reproduces NTILE(3) over the per-document scores
  WITHOUT a single-partition window: a distributed global rank
  (range-repartition → per-partition row_number → broadcast offsets;
  functions/ranking.py) feeds closed-form NTILE arithmetic.  Every
  per-document stage is partition-parallel — the only unpartitioned
  window runs over #partitions rows — while the bucket assignment
  stays integer-exact against the oracle's NTILE.

Reference parity: the reference has no quality scoring; this extends
the text-analysis family (SURVEY.md §2.12).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.ranking import (
    ntile_bucket,
    with_global_rank,
)
from bitcoin_datawarehouse_spark.functions.scalars import scalar_cross
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table
from bitcoin_datawarehouse_spark.functions.localframe import local_rows_df

_SQL_TOK = """tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS tk
      FROM documents
    )"""


def doc_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2, dcnt) over the fixture documents table — the
    kernel body lives in :func:`_doc_bigram_counts_frame` so serve
    paths can score any (doc_id, text) frame."""
    docs = load_table(spark, sf_dir, "documents")
    # one-split fixture parquet: spread the kernel across cores
    par = spark.sparkContext.defaultParallelism
    return _doc_bigram_counts_frame(docs.repartition(par))


def _doc_bigram_counts_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2, dcnt): per-document bigram-position counts
    (w2 NULL at the document-final position), pre-aggregated INSIDE
    the Arrow kernel.

    Same rationale as ``doc_shingles`` (dedup.py): per-row tokenize
    CPU work vectorizes 3-5× faster than interpreted
    higher-order-function lambdas, and the emitted tokens are
    byte-identical to the oracle's regex split.  Counting per doc in
    the kernel (a document is one input row, so its positions are
    task-local) replaces a corpus-wide groupBy over EVERY token
    position — the single largest shuffle of the round-2 plan — with
    map-side-finished output a fraction of the size.
    """
    import collections

    import pandas as pd
    from pyspark.sql import types as T

    pat = re.compile("[^a-z0-9]+")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("w1", T.StringType()),
            T.StructField("w2", T.StringType()),
            T.StructField("dcnt", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids: list[int] = []
            w1s: list[str] = []
            w2s: list[str | None] = []
            cts: list[int] = []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                tk = [t for t in pat.split(txt.lower()) if t]
                counts = collections.Counter(
                    (w, tk[i + 1] if i + 1 < len(tk) else None)
                    for i, w in enumerate(tk)
                )
                for (a, b), c in counts.items():
                    ids.append(did)
                    w1s.append(a)
                    w2s.append(b)
                    cts.append(c)
            yield pd.DataFrame(
                {"doc_id": ids, "w1": w1s, "w2": w2s, "dcnt": cts}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, schema)


#: Shared oracle CTE chain ending at ``scores`` — both bucketing
#: modes (exact NTILE and approx thresholds) consume this frame.
_SQL_SCORES = f"""{_SQL_TOK},
    pos AS (
      SELECT t.doc_id, t.tk[g.i] AS w1,
             CASE WHEN g.i < len(t.tk) THEN t.tk[g.i + 1] END AS w2
      FROM tok t,
      LATERAL (SELECT unnest(generate_series(1, len(t.tk))) AS i) g
    ),
    docbig AS (
      SELECT doc_id, w1, w2, COUNT(*) AS dcnt
      FROM pos GROUP BY doc_id, w1, w2
    ),
    big AS (
      SELECT w1, w2, SUM(dcnt) AS cb FROM docbig
      WHERE w2 IS NOT NULL GROUP BY w1, w2
    ),
    uni AS (SELECT w1 AS w, SUM(dcnt) AS cu FROM docbig GROUP BY w1),
    vocab AS (SELECT COUNT(*) AS v FROM uni),
    terms AS (
      SELECT d.doc_id, d.dcnt,
             ROUND(log2(CAST(u.cu + v.v AS DOUBLE))
                   - log2(CAST(b.cb + 1 AS DOUBLE)), 6) AS term
      FROM docbig d
      JOIN big b ON d.w1 = b.w1 AND d.w2 = b.w2
      JOIN uni u ON d.w1 = u.w
      CROSS JOIN vocab v
      WHERE d.w2 IS NOT NULL
    ),
    sums AS (
      SELECT doc_id, SUM(dcnt) AS n_bigrams,
             CAST(SUM(CAST(CAST(term AS STRING) AS DECIMAL(38,10)) * dcnt) * 1000000
                  AS BIGINT) AS micro
      FROM terms GROUP BY doc_id
    ),
    scores AS (
      SELECT doc_id, n_bigrams,
             CAST((2 * micro + n_bigrams) // (2 * n_bigrams) AS DOUBLE)
               / 1000000.0 AS bits_per_token
      FROM sums
    )"""


@query(
    "text_lm_quality",
    oracle=f"""
    WITH {_SQL_SCORES}
    SELECT s.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           CAST(s.n_bigrams AS BIGINT) AS n_bigrams,
           s.bits_per_token,
           CASE NTILE(3) OVER (ORDER BY s.bits_per_token, s.doc_id)
             WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM scores s JOIN tok t USING (doc_id)
    """,
)
def text_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score + CCNet-style tertile buckets.

    Per document: mean over bigram positions of
    ``-log2((C(w1,w2)+1) / (C(w1)+V))`` — add-one smoothed bigram
    cross-entropy in bits per token, with unigram/bigram counts and
    vocabulary size V trained on the full corpus inside the plan.
    Lower = more predictable = "head" of the corpus.  Documents with
    fewer than two tokens have no bigram positions and are excluded
    (undefined score; none exist in the fixtures).

    Per-term ROUND(·,6), exact decimal sum, then a half-up integer
    division in micro-bits keeps the score bit-identical to the DuckDB
    oracle (a rounded double mean can land exactly on a 1e-6 boundary
    where the engines round apart); the tertile NTILE is integer-exact
    with a doc_id tie-break.

    This registered entry is the EXACT mode (it must reproduce the
    oracle's NTILE bit-for-bit); production corpora use
    :func:`text_lm_quality_buckets` with the default approx mode,
    which replaces the ranked assignment's persist+count barrier with
    one ``percentile_approx`` aggregate.
    """
    return text_lm_quality_buckets(spark, sf_dir, mode="exact")


def _lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_bigrams, bits_per_token): the per-document
    bigram cross-entropy frame both bucketing modes consume."""
    # per-doc bigram counts arrive FINISHED from the kernel (positions
    # are task-local per document — no corpus-wide position shuffle);
    # everything — bigram table, unigram table, vocabulary, per-doc
    # scoring, token counts — derives from this one frame.  Cached in
    # KERNEL-OUTPUT partitioning (r13 — the r12 shape repartitioned it
    # by w1 to serve the aggregates and joins off one exchange):  with
    # the per-bigram term table (_score_docbig) the scoring joins are
    # model-sized and broadcast, so the w1 exchange only served the
    # two count aggregates — which partial (map-side) aggregation
    # collapses to tasks×vocab rows anyway — while it SCATTERED each
    # document's rows across all partitions, inflating the per-doc
    # scoring aggregate's partial output from one row per doc to one
    # per (task, doc).  Doc-local caching keeps every aggregate's
    # partial collapse maximal: measured 20.9 → 14.6 s end-to-end at
    # sf10 (same-session best-of-3).  If a corpus's count tables ever
    # outgrow broadcast, the planner falls back to shuffling docbig
    # for the joins — the same corpus-sized exchange the old shape
    # always paid.  Eager fill (the vocab count below materializes
    # it): several plan subtrees read it, and un-cached each would
    # re-run the Arrow tokenize kernel (CLAUDE.md multi-subtree
    # rule).  docbig is aggregate-sized (distinct bigrams per doc),
    # not corpus-sized.
    from bitcoin_datawarehouse_spark.functions.cachereg import (
        cache_tracked,
    )

    docbig = cache_tracked(doc_bigram_counts(spark, sf_dir))
    uni = docbig.groupBy("w1").agg(F.sum("dcnt").alias("cu"))
    vocab = uni.count()  # one driver-side scalar (cf. tf-idf n_docs);
    # this action also fills the docbig cache eagerly

    big = (
        docbig.filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.sum("dcnt").alias("cb"))
    )
    return _score_docbig(docbig, big, uni, vocab)


def _score_docbig(
    docbig: DataFrame, big: DataFrame, uni: DataFrame, vocab: int
) -> DataFrame:
    """Score per-doc bigram counts against an LM (count tables +
    vocabulary size) — shared by the in-plan gate and the
    persisted-model serve path.

    r13: the per-position term ``ROUND(log2(cu+V) - log2(cb+1), 6)``
    is a pure function of the BIGRAM, so it is evaluated once per
    model bigram (|big| rows — the bigram vocabulary) instead of once
    per corpus position row, and carried as exact integer micro-bits
    (:func:`functions.numeric.micro6` — a 6-dp-rounded double IS
    k·10⁻⁶ exactly, so ``Σ term_micro·dcnt`` in LONG equals the old
    ``CAST(Σ dec(term)·dcnt · 1e6 AS BIGINT)`` decimal surface
    value-for-value).  At sf10 this removed 26M log2+round+decimal
    evaluations from the scoring pass (measured ~10.5 → ~3 s warm).
    No broadcast hint on the term table: it is bigram-vocabulary-
    sized (corpus-dependent), and both it and ``docbig`` ride the
    hash(w1) partitioning when the planner declines to broadcast."""
    from bitcoin_datawarehouse_spark.functions.numeric import micro6

    # term table: one row per model bigram.  cb is never null here
    # (rows come FROM big); cu left-coalesces for model-internal
    # consistency with the old row-level formula.
    tm_tab = big.join(uni, "w1", "left").select(
        "w1",
        "w2",
        micro6(
            F.round(
                F.log2(
                    (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(vocab)).cast(
                        "double"
                    )
                )
                - F.log2((F.col("cb") + F.lit(1)).cast("double")),
                6,
            )
        ).alias("_tm"),
    )
    # LEFT joins so the one w2-NULL row per document (its final token
    # position) rides along with term=NULL: n_tokens then falls out of
    # the SAME per-doc aggregate as the score — no separate base
    # aggregate, no scores⋈base join.  When the model was trained on
    # this same corpus every w2-non-null row hits the term table; the
    # fallback branch below only evaluates when a PERSISTED model
    # scores UNSEEN text (an unseen bigram smooths to count 0 on both
    # tables: term = round(log2(coalesce(cu,0)+V) - log2(0+1), 6),
    # computed per row exactly as before — only for the misses).
    joined = docbig.join(tm_tab, ["w1", "w2"], "left").join(
        uni, "w1", "left"
    )
    term_micro = F.when(
        F.col("w2").isNotNull(),
        F.coalesce(
            F.col("_tm"),
            micro6(
                F.round(
                    F.log2(
                        (
                            F.coalesce(F.col("cu"), F.lit(0)) + F.lit(vocab)
                        ).cast("double")
                    ),
                    6,
                )
            ),
        ),
    )
    # exact integer micro-bits with explicit half-up division: the
    # decimal mean rounded as a double can land exactly on a 1e-6
    # rounding boundary (observed on the fixture: mean 4.9050935),
    # where Spark and DuckDB round apart — integer arithmetic cannot
    scores = (
        joined.select(
            "doc_id", "dcnt", "w2", term_micro.alias("term_micro")
        )
        .groupBy("doc_id")
        .agg(
            F.sum("dcnt").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("w2").isNotNull(), F.col("dcnt")))
            .cast("long")
            .alias("n_bigrams"),
            F.sum(F.col("term_micro") * F.col("dcnt")).alias("micro"),
        )
        .filter(F.col("n_bigrams").isNotNull())
        .select(
            "doc_id",
            "n_tokens",
            "n_bigrams",
            F.expr(
                "CAST((2 * micro + n_bigrams)"
                " DIV (2 * n_bigrams) AS DOUBLE) / 1000000.0"
            ).alias("bits_per_token"),
        )
    )
    return scores


#: percentile_approx accuracy for the approx bucketing mode.  The
#: per-doc score frame at 100 TB is billions of rows; GK with this
#: accuracy bounds the boundary-rank error to ~n/accuracy rows while
#: the sketch stays a few MB and merges map-side.  Below this many
#: DISTINCT scores the sketch is exact.
APPROX_PERCENTILE_ACCURACY = 10_000


def text_lm_quality_buckets(
    spark: SparkSession,
    sf_dir: str,
    mode: str = "approx",
    accuracy: int = APPROX_PERCENTILE_ACCURACY,
    scores: DataFrame | None = None,
) -> DataFrame:
    """CCNet tertile bucketing with a selectable assignment strategy.

    ``mode="approx"`` (production default): tertile THRESHOLDS via one
    ``percentile_approx(bits_per_token, [1/3, 2/3])`` aggregate,
    broadcast back as a 1-row frame — a single extra aggregate pass,
    no persist+count materialization barrier, no global rank at all.
    Spark's discrete percentile returns the element at rank
    ``ceil(p*n)``, which IS the NTILE(3) bucket edge (NTILE bucket b
    ends at rank ``b*(n DIV 3) + min(b, n % 3)`` = ``ceil(b*n/3)``),
    so with all-distinct scores the buckets match exact NTILE
    row-for-row (pytest-pinned).  Divergence surface: tied boundary
    scores all land in the lower bucket here, while NTILE splits a tie
    group by doc_id rank — and past ``accuracy`` distinct scores the
    GK sketch may shift the boundary by ~n/accuracy ranks.  Both are
    immaterial for corpus filtering (CCNet cuts at the bucket level).

    ``mode="exact"``: the oracle/audit path — distributed global rank
    (range-repartition → per-partition row_number → broadcast offsets;
    functions/ranking.py) + closed-form NTILE arithmetic.  Bit-exact
    against SQL NTILE including tie handling, at the cost of one
    persist+count barrier to pin the nondeterministic range-boundary
    sampling.
    """
    if scores is None:
        scores = _lm_scores(spark, sf_dir)
    if mode == "exact":
        ranked = with_global_rank(
            scores,
            ["bits_per_token", "doc_id"],
            rank_alias="_grank",
            total_alias="_gtotal",
        )
        tercile = ntile_bucket(F.col("_grank"), F.col("_gtotal"), 3)
        return ranked.select(
            "doc_id",
            "n_tokens",
            "n_bigrams",
            "bits_per_token",
            F.when(tercile == 1, "head")
            .when(tercile == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    if mode != "approx":
        raise ValueError(f"unknown bucketing mode {mode!r}")
    # Cache the DOC-SIZED scores frame (4 scalar cols/doc): the
    # threshold aggregate and the output projection are two separate
    # subtrees of the final action, and uncached each re-runs the
    # whole LM join subgraph off the docbig cache — measured 2× the
    # subgraph cost at sf100 (~300 s vs ~95 s; the fixture never
    # showed it because a pass costs <1 s there).  This is reuse, not
    # a rank barrier: the exact mode's persist exists to pin
    # nondeterministic range-boundary sampling; here the cache is
    # just the cheapest join point for a twice-read aggregate.
    from bitcoin_datawarehouse_spark.functions.cachereg import (
        cache_tracked,
    )

    scores = cache_tracked(scores)
    scores.count()  # eager: both subtrees read it in one action
    thr = scores.agg(
        F.percentile_approx(
            "bits_per_token", [1 / 3, 2 / 3], accuracy
        ).alias("_thr")
    )
    return scalar_cross(scores, thr).select(
        "doc_id",
        "n_tokens",
        "n_bigrams",
        "bits_per_token",
        F.when(F.col("bits_per_token") <= F.col("_thr")[0], "head")
        .when(F.col("bits_per_token") <= F.col("_thr")[1], "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


@query(
    "text_lm_quality_approx",
    oracle=f"""
    WITH {_SQL_SCORES},
    ranked AS (
      SELECT bits_per_token,
             ROW_NUMBER() OVER (ORDER BY bits_per_token) AS rn,
             COUNT(*) OVER () AS n
      FROM scores
    ),
    thr AS (
      SELECT MAX(CASE WHEN rn = CAST(ceil(n * (1.0/3)) AS BIGINT)
                 THEN bits_per_token END) AS t1,
             MAX(CASE WHEN rn = CAST(ceil(n * (2.0/3)) AS BIGINT)
                 THEN bits_per_token END) AS t2
      FROM ranked
    )
    SELECT s.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           CAST(s.n_bigrams AS BIGINT) AS n_bigrams,
           s.bits_per_token,
           CASE WHEN s.bits_per_token <= thr.t1 THEN 'head'
                WHEN s.bits_per_token <= thr.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scores s JOIN tok t USING (doc_id) CROSS JOIN thr
    """,
)
def text_lm_quality_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-default bucketing path, hash-gated.

    Same per-document score frame as :func:`text_lm_quality`, but
    bucket assignment via one ``percentile_approx`` threshold
    aggregate instead of the exact global rank — no persist+count
    materialization barrier anywhere in the plan.

    Hash-checkable because the GK sketch is EXACT below ``accuracy``
    distinct scores (the fixtures are far below 10 000) and Spark's
    discrete percentile deterministically returns the element at
    sorted position ``ceil(p*n)`` (verified empirically at sf0.01 and
    sf0.1; the oracle reproduces that rank arithmetic explicitly
    rather than relying on DuckDB's ``quantile_disc``, whose 2/3
    convention is ``floor(p*(n-1))+1`` — off by one).  Boundary-tied
    scores all land in the lower bucket on BOTH engines (``<=``
    threshold compare), so tie handling is deterministic too.  Past
    ``accuracy`` distinct scores the sketch may shift a boundary by
    ~n/accuracy ranks — immaterial for corpus filtering, and exactly
    why the exact mode is retained as the audit surface.
    """
    return text_lm_quality_buckets(spark, sf_dir, mode="approx")


# -- persisted LM (build/serve split) -----------------------------------------

LM_MODEL_SCHEMA = "models"


def fit_lm_parts(
    spark: SparkSession, sf_dir: str, hot_head_safe: bool = False
) -> dict[str, DataFrame]:
    """Train the bigram LM and return its parts as FRAMES —
    {"uni", "big", "consts"} — shared by :func:`save_lm_model` (fixed
    table names) and the versioned ``pipeline.model_registry``
    (atomic generations).

    Skew dial (r10 VERDICT item 4, measured at 500k docs):
    the default shares ONE ``repartition("w1")`` exchange between both
    count aggregates — 9.9 s vs 12.3 s for independent aggregates on
    the real Zipf fixture (alternating-order reproduction), because
    the cached exchange is reused.  Under an ADVERSARIAL head word
    (planted 50% of all bigram rows on one w1) the shared exchange
    funnels half the cache into one partition and inverts 3.2×
    (9.6 s vs 3.0 s — tools/probe_skew_curation.py).  Real-corpus
    Zipf heads ("the" ≈ 5-7% of tokens) stay far from the knee, so
    the shared exchange is the default; pass ``hot_head_safe=True``
    for corpora with a known degenerate head (log/boilerplate dumps)
    to run the two aggregates independently — each then collapses the
    hot key MAP-SIDE via partial aggregation.  Both plans produce
    identical model tables."""
    from bitcoin_datawarehouse_spark.functions.cachereg import (
        cache_tracked,
    )

    docbig = doc_bigram_counts(spark, sf_dir)
    if not hot_head_safe:
        docbig = docbig.repartition("w1")
    docbig = cache_tracked(docbig)
    uni = docbig.groupBy("w1").agg(F.sum("dcnt").cast("long").alias("cu"))
    vocab = uni.count()  # fills docbig
    big = (
        docbig.filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.sum("dcnt").cast("long").alias("cb"))
    )
    return {
        "uni": uni,
        "big": big,
        "consts": local_rows_df(spark, [(vocab,)], "v long"),
    }


def save_lm_model(
    warehouse, spark: SparkSession, sf_dir: str, name: str = "lm_bigram"
) -> None:
    """Train and persist the bigram LM: the unigram and bigram count
    tables plus a 1-row constants table (vocabulary size), atomic
    replace — the ivf_index/bpe/quality-classifier build/serve
    discipline."""
    parts = fit_lm_parts(spark, sf_dir)
    warehouse.write_atomic(parts["uni"], LM_MODEL_SCHEMA, f"{name}_uni")
    warehouse.write_atomic(parts["big"], LM_MODEL_SCHEMA, f"{name}_big")
    warehouse.write_atomic(
        parts["consts"], LM_MODEL_SCHEMA, f"{name}_consts", coalesce=1
    )


def lm_score_with(
    warehouse,
    docs: DataFrame,
    name: str = "lm_bigram",
) -> DataFrame:
    """Serve path: (doc_id, n_tokens, n_bigrams, bits_per_token) for
    ``docs`` (doc_id, text) under a PERSISTED bigram LM — no
    retraining; the corpus work is the bigram kernel plus the two
    count-table joins (path-based parquet reads).  Bigrams the model
    never saw smooth to count 0 (the add-one floor), so unseen text
    scores high-entropy instead of erroring — exactly CCNet's frozen
    serving shape.  Model tables are read WITH ``docs``' own session
    (``Warehouse.read_with``, r9 ADVICE — no dead ``spark`` param)."""
    sess = docs.sparkSession
    crow = warehouse.read_with(
        sess, LM_MODEL_SCHEMA, f"{name}_consts"
    ).collect()[0]
    par = sess.sparkContext.defaultParallelism
    docbig = _doc_bigram_counts_frame(docs.repartition(par))
    uni = warehouse.read_with(sess, LM_MODEL_SCHEMA, f"{name}_uni")
    big = warehouse.read_with(sess, LM_MODEL_SCHEMA, f"{name}_big")
    return _score_docbig(docbig, big, uni, int(crow["v"]))


def lm_score_resolved(model, docs: DataFrame) -> DataFrame:
    """Score ``docs`` with a generation resolved from the versioned
    ``pipeline.model_registry`` (parts "uni"/"big"/"consts") — one
    atomic generation, never a mixed model."""
    crow = model.parts["consts"].collect()[0]
    par = docs.sparkSession.sparkContext.defaultParallelism
    docbig = _doc_bigram_counts_frame(docs.repartition(par))
    return _score_docbig(
        docbig, model.parts["big"], model.parts["uni"], int(crow["v"])
    )


@query("text_lm_quality_served")
def text_lm_quality_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-LM serving round trip, driver-proven: train →
    Warehouse model tables → load → score → exact tertile buckets,
    under the SAME oracle as ``text_lm_quality`` (the persisted counts
    are the trained counts, so scores are identical by construction —
    the persisted-twin discipline)."""
    from bitcoin_datawarehouse_spark.pipeline.catalog import (
        Warehouse,
        scratch_root,
    )

    wh = Warehouse(spark, scratch_root("bds_lm", sf_dir))
    save_lm_model(wh, spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    scores = lm_score_with(wh, docs)
    return text_lm_quality_buckets(spark, sf_dir, mode="exact", scores=scores)


def ensure_lm_model(
    warehouse, spark: SparkSession, sf_dir: str, name: str = "lm_bigram"
) -> bool:
    """Train+persist the bigram LM iff absent (idempotent over the
    immutable fixtures) — the serve-only gate's precondition (r10
    VERDICT item 1).  Returns True when a build ran."""
    if all(
        warehouse.table_exists(LM_MODEL_SCHEMA, f"{name}{suffix}")
        for suffix in ("_uni", "_big", "_consts")
    ):
        return False
    save_lm_model(warehouse, spark, sf_dir, name)
    return True


@query("text_lm_quality_serve_only")
def text_lm_quality_serve_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION serving economics, split from training: perplexity-
    score the corpus under an already-persisted bigram LM — the timed
    plan is one bigram kernel + the two frozen count-table joins +
    the exact tertile bucketing; no training aggregation.  Same
    oracle as ``text_lm_quality`` (frozen counts ≡ trained counts);
    the ``_served`` twin keeps timing the full round trip."""
    from bitcoin_datawarehouse_spark.pipeline.catalog import (
        Warehouse,
        scratch_root,
    )

    wh = Warehouse(spark, scratch_root("bds_lm", sf_dir))
    ensure_lm_model(wh, spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    scores = lm_score_with(wh, docs)
    return text_lm_quality_buckets(spark, sf_dir, mode="exact", scores=scores)


from bitcoin_datawarehouse_spark import registry as _registry  # noqa: E402

_registry.ORACLES["text_lm_quality_served"] = _registry.ORACLES[
    "text_lm_quality"
]
_registry.ORACLES["text_lm_quality_serve_only"] = _registry.ORACLES[
    "text_lm_quality"
]


from bitcoin_datawarehouse_spark.operators.trainprep import (  # noqa: E402
    PACK_BUDGET as _PACK_BUDGET,
)


@query(
    "trainprep_curriculum_pack",
    oracle=f"""
    WITH {_SQL_SCORES},
    base AS (
      SELECT s.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
             s.bits_per_token
      FROM scores s JOIN tok t USING (doc_id)
    ),
    packed AS (
      SELECT doc_id, n_tokens, bits_per_token,
             CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY bits_per_token, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS start_offset
      FROM base
    )
    SELECT doc_id, n_tokens, bits_per_token, start_offset,
           CAST(start_offset // {_PACK_BUDGET} AS BIGINT) AS chunk_id
    FROM packed
    """,
)
def trainprep_curriculum_pack(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CURRICULUM-ordered sequence packing: the corpus packed into
    fixed token-budget chunks in easy→hard order (ascending bigram-LM
    bits-per-token, the curriculum-learning data ordering) — early
    chunks hold the most predictable text, late chunks the hardest.

    The running token offset over a GLOBAL order is the scan
    primitive ``SUM(v) OVER (ORDER BY …)`` — a single-task funnel as
    a monolithic window at corpus scale — computed here with
    :func:`functions.ranking.with_global_prefix_sum` (range-partition
    → local prefix → broadcast offsets), the prefix-sum sibling of
    the distributed global rank.  Ordering key ``(bits_per_token,
    doc_id)`` is cross-engine total: the score is bit-identical by
    the micro-bits construction and doc_id breaks ties.  All packed
    arithmetic is integer-exact (chunk budget = trainprep's
    ``PACK_BUDGET``)."""
    from bitcoin_datawarehouse_spark.functions.ranking import (
        with_global_prefix_sum,
    )
    from bitcoin_datawarehouse_spark.operators.trainprep import PACK_BUDGET

    scores = _lm_scores(spark, sf_dir).select(
        "doc_id", "n_tokens", "bits_per_token"
    )
    packed = with_global_prefix_sum(
        scores,
        ["bits_per_token", "doc_id"],
        "n_tokens",
        prefix_alias="start_offset",
        total_alias="_tot",
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "bits_per_token",
        F.col("start_offset").cast("long").alias("start_offset"),
        F.expr(f"CAST(start_offset DIV {PACK_BUDGET} AS BIGINT)").alias(
            "chunk_id"
        ),
    )
