"""Model-based quality filtering: a multinomial Naive Bayes text
classifier distilled from the rule-based Gopher gate (north-star
extension).

Production curation pipelines (CCNet arXiv:1911.00359, LLaMA,
RefinedWeb arXiv:2306.01116) follow the same recipe: heuristic rules
label a seed set, a cheap linear bag-of-words classifier (fastText in
the published pipelines) generalizes the judgment to the whole crawl.
The self-contained Spark-shaped equivalent trains the classifier
*inside the plan*: add-one smoothed per-class token counts over a
deterministic ~30 % train slice labeled by the registered Gopher
rules, then scores EVERY document with the per-token log-odds

    log2 P(tok | keep) - log2 P(tok | drop)

plus the class-prior log-odds.  The decision surface is exact: each
per-token term is ROUND(·, 6)-ed, accumulated in DECIMAL, and surfaced
as integer micro-bits (the ``text_lm_quality`` arithmetic), so the
keep/drop decision is an integer sign test — bit-identical
cross-engine by construction, no double comparisons anywhere.

Scale design:
* per-document token counts are finished INSIDE the Arrow kernel
  (a document is one input row → its token positions are task-local;
  no corpus-wide position shuffle), the ``doc_bigram_counts`` /
  ``doc_shingles`` precedent;
* the kernel output is hash-partitioned by ``tok`` and cache_tracked:
  HashPartitioning(tok) satisfies the class-count groupBy AND the
  scoring join, so the whole train+score graph runs on that single
  shuffle plus the final per-doc aggregate;
* the label frame is doc-sized (train-slice ids + one boolean) and
  broadcasts into the kernel output — the class-count aggregation
  inherits the tok partitioning through the broadcast join;
* the trained model is vocabulary-sized; the only driver state is
  five integers (class token totals, vocabulary size, class doc
  counts) — same pattern as tf-idf's ``n_docs``;
* at 100 TB the train slice is a hash bucket of the corpus (here
  77/256 ≈ 30 %); the model table stays vocabulary-sized and the
  scoring join broadcasts it.

Reference parity: the reference has no classifier; this extends the
text-analysis family (SURVEY.md §2.12) with the model-based quality
stage every published curation pipeline runs between rules and
sampling.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.functions.cachereg import cache_tracked
from bitcoin_datawarehouse_spark.operators import curation  # noqa: F401  (registers text_gopher_rules)
from bitcoin_datawarehouse_spark.operators.curation import (
    gopher_keep_col,
    gopher_metrics_frame,
)
from bitcoin_datawarehouse_spark import registry as _registry
from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table
from bitcoin_datawarehouse_spark.functions.localframe import local_rows_df

#: md5-bucket upper bound (exclusive, of 256) for the train slice —
#: ≈30 % of documents, the hash-split idiom (trainprep.py).  The
#: SAME doc_id bucket drives the Spark slice and the oracle's, so the
#: train sets are identical by construction.
TRAIN_BUCKETS = 77

_SQL_TRAIN_BUCKET = (
    "(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)

_SQL_TOKENS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)


def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok, cnt): per-document token counts, pre-aggregated
    INSIDE the Arrow kernel (positions are task-local per document —
    the corpus never shuffles at token-position granularity).
    Unigram sibling of ``lm_quality.doc_bigram_counts``; the kernel
    body lives in :func:`_doc_token_counts_frame` so serve paths can
    score any (doc_id, text) frame."""
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    return _doc_token_counts_frame(docs.repartition(par))


def _train_labels_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, is_pos) on the deterministic train slice of an
    arbitrary (doc_id, text) frame: label = the registered Gopher
    conjunction (rule-based seed judgment)."""
    hx = F.md5(F.col("doc_id").cast("string").cast("binary"))
    nib = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(hx, i, 1)
    ) - F.lit(1)
    bucket = (nib(1) * 16 + nib(2)).cast("int")
    return (
        gopher_metrics_frame(docs)
        .select("doc_id", gopher_keep_col().alias("is_pos"), bucket.alias("_b"))
        .filter(F.col("_b") < TRAIN_BUCKETS)
        .drop("_b")
    )


def _train_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-reading wrapper of :func:`_train_labels_frame`."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return _train_labels_frame(docs)


def train_quality_model(
    spark: SparkSession, sf_dir: str, dtc: DataFrame
) -> tuple[DataFrame, dict[str, int]]:
    """Train the NB model over ``dtc`` (the per-doc token counts):
    returns the vocabulary-sized class-count frame (tok, cpos, cneg)
    — cache_tracked and eagerly filled — plus the five model integers
    {npos, nneg, v, dpos, dneg}."""
    return _train_core(dtc, _train_labels(spark, sf_dir))


def _train_core(
    dtc: DataFrame, labels: DataFrame
) -> tuple[DataFrame, dict[str, int]]:
    """The NB training body over (per-doc token counts, labels) —
    shared by the fixture-reading :func:`train_quality_model` and the
    frame-shaped :func:`fit_quality_parts_frame` (streaming refresh)."""
    lab = cache_tracked(labels)
    # class doc counts — the prior's two integers (eagerly fills lab)
    prow = lab.agg(
        F.count(F.when(F.col("is_pos"), 1)).alias("dpos"),
        F.count(F.when(~F.col("is_pos"), 1)).alias("dneg"),
    ).collect()[0]
    if not prow["dpos"] or not prow["dneg"]:
        # log2(0) diverges cross-engine (Spark NULL vs DuckDB -inf)
        # and a one-class prior is semantically undefined — fail loud
        raise ValueError(
            "degenerate training slice: "
            f"dpos={prow['dpos']} dneg={prow['dneg']} — the NB prior "
            "needs both classes present in the hash slice"
        )

    # vocabulary-sized model table: per-class token occurrence counts
    # over the train slice.  Plain join, NOT a broadcast hint: the
    # label frame is ~30% of all doc_ids — corpus-proportional, so
    # forcing a broadcast is what breaks first at 100 TB; AQE decides
    # (r9 ADVICE).  The join output collapses to the vocabulary in
    # the very next aggregate, so the shuffle is the bounded cost.
    cls = cache_tracked(
        dtc.join(lab, "doc_id")
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("is_pos"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("cpos"),
            F.sum(F.when(~F.col("is_pos"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("cneg"),
        )
    )
    trow = cls.agg(
        F.sum("cpos").alias("npos"),
        F.sum("cneg").alias("nneg"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]  # eager fill for cls AND dtc (cls derives from dtc)
    consts = {
        "npos": int(trow["npos"]),
        "nneg": int(trow["nneg"]),
        "v": int(trow["v"]),
        "dpos": int(prow["dpos"]),
        "dneg": int(prow["dneg"]),
    }
    return cls, consts


def score_frame(
    dtc: DataFrame, cls: DataFrame, consts: dict[str, int]
) -> DataFrame:
    """Score per-doc token counts against a trained model — shared by
    the in-plan gate and the persisted-model serve path."""
    from bitcoin_datawarehouse_spark.functions.numeric import micro6

    npos, nneg, v = consts["npos"], consts["nneg"], consts["v"]
    dpos, dneg = consts["dpos"], consts["dneg"]
    # r13: the per-token log-odds term is a pure function of the TOKEN
    # — evaluate it once per model token (the vocabulary-sized cls
    # table) as exact integer micro-bits (numeric.micro6: Σ tm·cnt in
    # LONG ≡ the old CAST(Σ dec(term)·cnt · 1e6 AS BIGINT) decimal
    # surface), instead of 2×log2 + round + a decimal accumulate per
    # corpus token row.  ROUND(·,6) semantics per term are unchanged
    # (the lm_quality float-parity pattern: all log2 arguments are
    # exact integers cast to double, so both engines see identical
    # inputs).
    tm_tab = cls.select(
        "tok",
        micro6(
            F.round(
                F.log2((F.col("cpos") + 1).cast("double"))
                - F.log2(F.lit(npos + v).cast("double"))
                - F.log2((F.col("cneg") + 1).cast("double"))
                + F.log2(F.lit(nneg + v).cast("double")),
                6,
            )
        ).alias("_tm"),
    )
    # unseen-token fallback (a persisted model scoring new text):
    # cpos = cneg = 0 → term = round(-log2(npos+v) + log2(nneg+v), 6)
    # — a literal-only expression the optimizer constant-folds, so the
    # per-row coalesce costs one comparison
    unseen = micro6(
        F.round(
            F.log2(F.lit(nneg + v).cast("double"))
            - F.log2(F.lit(npos + v).cast("double")),
            6,
        )
    )
    terms = dtc.join(tm_tab, "tok", "left").select(
        "doc_id",
        "cnt",
        F.coalesce(F.col("_tm"), unseen).alias("term_micro"),
    )
    # exact integer micro-bits (the surface is BIGINT — no doubles
    # anywhere in the output)
    prior_sql = (
        f"CAST(CAST(CAST(ROUND(log2(CAST({dpos} AS DOUBLE))"
        f" - log2(CAST({dneg} AS DOUBLE)), 6) AS STRING)"
        f" AS DECIMAL(38,10)) * 1000000 AS BIGINT)"
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.col("term_micro") * F.col("cnt")).alias("_odds"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"_odds + {prior_sql}").alias("score_micro"),
        )
        .withColumn("pred_keep", F.col("score_micro") > 0)
    )


def classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, score_micro, pred_keep): NB log-odds in
    integer micro-bits over EVERY document (train + held-out)."""
    # dtc stays in KERNEL partitioning (doc-local rows): the class-
    # count groupBy then shuffles only the train slice (~30 % of the
    # token table) and the scoring join broadcasts the vocabulary-
    # sized model, so the corpus-sized token table never shuffles at
    # all — measured ~505 → ~219 MB shuffle per execution (0.43×) and
    # 13.8 → 11.3 s warm at sf10 vs the earlier repartition("tok")
    # layout (whose single corpus shuffle only wins once the
    # vocabulary outgrows broadcast AND the scoring join must
    # sort-merge — the giant-vocab regime a caller can opt into by
    # pre-partitioning dtc).  Cached: three
    # subtrees (class counts, totals collect, scoring join) would
    # otherwise re-run the tokenize kernel (CLAUDE.md multi-subtree
    # rule); eager fill via the totals collect inside
    # train_quality_model.
    dtc = cache_tracked(doc_token_counts(spark, sf_dir))
    cls, consts = train_quality_model(spark, sf_dir, dtc)
    return score_frame(dtc, cls, consts)


# -- persisted model (build/serve split) -------------------------------------

QC_MODEL_SCHEMA = "models"


def fit_quality_parts(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Train the NB model and return its parts as FRAMES —
    {"cls": (tok, cpos, cneg), "consts": 1-row integers} — the shape
    both persistence paths share: :func:`save_quality_model` writes
    them to fixed table names, the versioned
    ``pipeline.model_registry`` publishes them as an atomic
    generation."""
    dtc = cache_tracked(doc_token_counts(spark, sf_dir))
    cls, consts = train_quality_model(spark, sf_dir, dtc)
    crow = local_rows_df(spark, 
        [tuple(consts[k] for k in ("npos", "nneg", "v", "dpos", "dneg"))],
        "npos long, nneg long, v long, dpos long, dneg long",
    )
    return {"cls": cls, "consts": crow}


def fit_quality_parts_frame(docs: DataFrame) -> dict[str, DataFrame]:
    """Frame-shaped trainer: fit the NB model over an arbitrary
    (doc_id, text) corpus — the builder the STREAMING refresh loop
    (``streaming.model_refresh_stream``) retrains with, where the
    corpus is the accumulated arrivals table rather than a fixture.
    Identical algebra to :func:`fit_quality_parts` (same kernel, same
    rule-based seed labels, same train-slice hash)."""
    sess = docs.sparkSession
    par = sess.sparkContext.defaultParallelism
    docs = docs.select("doc_id", "text").repartition(par)
    dtc = cache_tracked(_doc_token_counts_frame(docs))
    cls, consts = _train_core(dtc, _train_labels_frame(docs))
    crow = local_rows_df(sess, 
        [tuple(consts[k] for k in ("npos", "nneg", "v", "dpos", "dneg"))],
        "npos long, nneg long, v long, dpos long, dneg long",
    )
    return {"cls": cls, "consts": crow}


def save_quality_model(
    warehouse, spark: SparkSession, sf_dir: str, name: str = "quality_nb"
) -> None:
    """Train and persist the NB model: the vocabulary-sized class-
    count table plus a 1-row constants table (atomic replace — the
    ivf_index/bpe build/serve discipline)."""
    parts = fit_quality_parts(spark, sf_dir)
    warehouse.write_atomic(parts["cls"], QC_MODEL_SCHEMA, name)
    warehouse.write_atomic(
        parts["consts"], QC_MODEL_SCHEMA, f"{name}_consts", coalesce=1
    )


def score_with(
    warehouse,
    docs: DataFrame,
    name: str = "quality_nb",
) -> DataFrame:
    """Serve path: score ``docs`` (doc_id, text) with a PERSISTED
    model — no retraining, no label pass; the corpus work is the
    token-count kernel plus one join against the loaded model table.
    Model tables are read WITH ``docs``' own session
    (``Warehouse.read_with``) so a foreachBatch caller's whole plan
    lives on the micro-batch session — r10: the old dead ``spark``
    parameter is gone (r9 ADVICE)."""
    sess = docs.sparkSession
    crow = warehouse.read_with(
        sess, QC_MODEL_SCHEMA, f"{name}_consts"
    ).collect()[0]
    consts = {k: int(crow[k]) for k in ("npos", "nneg", "v", "dpos", "dneg")}
    par = sess.sparkContext.defaultParallelism
    dtc = _doc_token_counts_frame(docs.repartition(par))
    cls = warehouse.read_with(sess, QC_MODEL_SCHEMA, name)
    return score_frame(dtc, cls, consts)


def score_resolved(model, docs: DataFrame) -> DataFrame:
    """Score ``docs`` with a generation resolved from the versioned
    ``pipeline.model_registry`` (parts "cls" + "consts") — the same
    frozen-model plan as :func:`score_with`, but all parts come from
    ONE atomic generation, so a concurrent refresh can never serve a
    mixed model."""
    crow = model.parts["consts"].collect()[0]
    consts = {k: int(crow[k]) for k in ("npos", "nneg", "v", "dpos", "dneg")}
    par = docs.sparkSession.sparkContext.defaultParallelism
    dtc = _doc_token_counts_frame(docs.repartition(par))
    return score_frame(dtc, model.parts["cls"], consts)


def _doc_token_counts_frame(docs: DataFrame) -> DataFrame:
    """The token-count Arrow kernel over an arbitrary (doc_id, text)
    frame — shared by the fixture-reading :func:`doc_token_counts`
    and the serve paths (which score any frame, incl. streaming
    micro-batches)."""
    import collections

    import pandas as pd
    from pyspark.sql import types as T

    pat = re.compile("[^a-z0-9]+")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tok", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids: list[int] = []
            tks: list[str] = []
            cts: list[int] = []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                counts = collections.Counter(
                    t for t in pat.split(txt.lower()) if t
                )
                for t, c in counts.items():
                    ids.append(did)
                    tks.append(t)
                    cts.append(c)
            yield pd.DataFrame({"doc_id": ids, "tok": tks, "cnt": cts})

    return docs.select("doc_id", "text").mapInPandas(gen, schema)


@query("text_quality_classifier_served")
def text_quality_classifier_served(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The persisted-model serving round trip, driver-proven: train →
    Warehouse model tables → load → score, under the SAME oracle as
    ``text_quality_classifier`` (scores are identical by construction
    — the persisted counts are the trained counts; the bpe_served /
    ivf_index persisted-twin discipline)."""
    from bitcoin_datawarehouse_spark.pipeline.catalog import (
        Warehouse,
        scratch_root,
    )

    wh = Warehouse(spark, scratch_root("bds_qc", sf_dir))
    save_quality_model(wh, spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return score_with(wh, docs)


def ensure_quality_model(
    warehouse, spark: SparkSession, sf_dir: str, name: str = "quality_nb"
) -> bool:
    """Train+persist the NB model iff absent (idempotent over the
    immutable fixtures) — the serve-only gate's precondition, so its
    timed plan is pure frozen-model scoring (r10 VERDICT item 1).
    Returns True when a build ran."""
    if warehouse.table_exists(
        QC_MODEL_SCHEMA, name
    ) and warehouse.table_exists(QC_MODEL_SCHEMA, f"{name}_consts"):
        return False
    save_quality_model(warehouse, spark, sf_dir, name)
    return True


@query("text_quality_classifier_serve_only")
def text_quality_classifier_serve_only(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PRODUCTION serving economics, split from training: score the
    corpus under an already-persisted NB model — the timed plan is
    one token-count kernel + one vocabulary-sized model join, no
    label pass, no count aggregation.  Same oracle as
    ``text_quality_classifier`` (frozen counts ≡ trained counts);
    the ``_served`` twin keeps timing the full train→persist→score
    round trip."""
    from bitcoin_datawarehouse_spark.pipeline.catalog import (
        Warehouse,
        scratch_root,
    )

    wh = Warehouse(spark, scratch_root("bds_qc", sf_dir))
    ensure_quality_model(wh, spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return score_with(wh, docs)


def _classifier_oracle() -> str:
    gq = _registry.ORACLES["text_gopher_rules"]
    return f"""
    WITH gq AS ({gq}),
    tk AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    dtc AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, unnest(toks) AS tok FROM tk)
      GROUP BY 1, 2
    ),
    lab AS (
      SELECT doc_id, keep AS is_pos FROM gq
      WHERE {_SQL_TRAIN_BUCKET} < {TRAIN_BUCKETS}
    ),
    cls AS (
      SELECT d.tok,
             CAST(SUM(CASE WHEN l.is_pos THEN d.cnt ELSE 0 END) AS BIGINT)
               AS cpos,
             CAST(SUM(CASE WHEN NOT l.is_pos THEN d.cnt ELSE 0 END) AS BIGINT)
               AS cneg
      FROM dtc d JOIN lab l USING (doc_id)
      GROUP BY d.tok
    ),
    tot AS (
      SELECT CAST(SUM(cpos) AS BIGINT) AS npos,
             CAST(SUM(cneg) AS BIGINT) AS nneg,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM cls
    ),
    pri AS (
      SELECT CAST(CAST(CAST(ROUND(
               log2(CAST(COUNT(*) FILTER (WHERE is_pos) AS DOUBLE))
               - log2(CAST(COUNT(*) FILTER (WHERE NOT is_pos) AS DOUBLE)),
             6) AS STRING) AS DECIMAL(38,10)) * 1000000 AS BIGINT)
             AS prior_micro
      FROM lab
    ),
    terms AS (
      SELECT d.doc_id, d.cnt,
             ROUND(log2(CAST(COALESCE(c.cpos, 0) + 1 AS DOUBLE))
                   - log2(CAST(t.npos + t.v AS DOUBLE))
                   - log2(CAST(COALESCE(c.cneg, 0) + 1 AS DOUBLE))
                   + log2(CAST(t.nneg + t.v AS DOUBLE)), 6) AS term
      FROM dtc d LEFT JOIN cls c USING (tok) CROSS JOIN tot t
    ),
    scores AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(CAST(term AS STRING) AS DECIMAL(38,10)) * cnt)
                  * 1000000 AS BIGINT)
               + (SELECT prior_micro FROM pri) AS score_micro
      FROM terms GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, score_micro, score_micro > 0 AS pred_keep
    FROM scores"""


@query("text_quality_classifier")
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes quality classifier distilled from the Gopher gate
    (module docstring): train on the hash-slice labels inside the
    plan, score every document, surface integer micro-bit log-odds
    and the keep/drop sign test."""
    return classifier_scores(spark, sf_dir)


_registry.ORACLES["text_quality_classifier"] = _classifier_oracle()
# the serving twins gate under the SAME oracle (persisted counts are
# the trained counts — scores identical by construction)
_registry.ORACLES["text_quality_classifier_served"] = _classifier_oracle()
_registry.ORACLES["text_quality_classifier_serve_only"] = (
    _classifier_oracle()
)


@query("text_classifier_heldout_eval")
def text_classifier_heldout_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The classifier's HELD-OUT confusion matrix vs the Gopher truth
    — the observable a pipeline operator actually monitors before
    trusting a model gate (one row: tp/fp/fn/tn + doc counts on the
    ~70 % of documents the training slice never saw)."""
    scores = classifier_scores(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    truth = gopher_metrics_frame(docs).select(
        "doc_id", gopher_keep_col().alias("truth_keep")
    )
    hx = F.md5(F.col("doc_id").cast("string").cast("binary"))
    nib = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(hx, i, 1)
    ) - F.lit(1)
    bucket = (nib(1) * 16 + nib(2)).cast("int")
    held = (
        scores.join(truth, "doc_id")
        .withColumn("_b", bucket)
        .filter(F.col("_b") >= TRAIN_BUCKETS)
    )
    cnt = lambda c: F.count(F.when(c, 1)).cast("long")  # noqa: E731
    p, t = F.col("pred_keep"), F.col("truth_keep")
    return held.agg(
        F.count(F.lit(1)).cast("long").alias("n_heldout"),
        cnt(p & t).alias("tp"),
        cnt(p & ~t).alias("fp"),
        cnt(~p & t).alias("fn"),
        cnt(~p & ~t).alias("tn"),
    )


def _heldout_oracle() -> str:
    gq = _registry.ORACLES["text_gopher_rules"]
    cls = _registry.ORACLES["text_quality_classifier"]
    return f"""
    WITH scored AS ({cls}),
    gq2 AS ({gq}),
    held AS (
      SELECT s.pred_keep, g.keep AS truth_keep
      FROM scored s JOIN gq2 g USING (doc_id)
      WHERE {_SQL_TRAIN_BUCKET.replace('doc_id', 's.doc_id')} >= {TRAIN_BUCKETS}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_heldout,
           CAST(COUNT(*) FILTER (WHERE pred_keep AND truth_keep) AS BIGINT)
             AS tp,
           CAST(COUNT(*) FILTER (WHERE pred_keep AND NOT truth_keep) AS BIGINT)
             AS fp,
           CAST(COUNT(*) FILTER (WHERE NOT pred_keep AND truth_keep) AS BIGINT)
             AS fn,
           CAST(COUNT(*) FILTER (WHERE NOT pred_keep AND NOT truth_keep)
                AS BIGINT) AS tn
    FROM held"""


_registry.ORACLES["text_classifier_heldout_eval"] = _heldout_oracle()


@query("trainprep_classifier_curation")
def trainprep_classifier_curation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The seven-stage curation composite with the MODEL-BASED
    quality gate as stage 1 (the production configuration once a
    classifier replaces the seed rules): NB pred_keep docs flow
    through the identical exact-dedup → LSH → SemDeDup → decontam →
    mixture → split+pack chain via ``curated_packed``'s
    ``quality_keep`` hook.  Stages 2-7 compose verbatim (only s1
    membership changes; every restriction argument is
    membership-based), so the oracle is the registered chain with the
    classifier oracle swapped in as the gate CTE — it cannot drift
    from what the stage gates individually prove."""
    from bitcoin_datawarehouse_spark.operators.curation_pipeline import (
        curated_packed,
    )

    keep = (
        classifier_scores(spark, sf_dir)
        .filter(F.col("pred_keep"))
        .select("doc_id")
    )
    return curated_packed(spark, sf_dir, quality_keep=keep)


def _classifier_curation_oracle() -> str:
    # the stage modules whose registered oracles the curation chain
    # embeds must load FIRST (the CLAUDE.md compose-late rule) — a
    # standalone import of this module must not depend on
    # load_all_operators' ordering
    from bitcoin_datawarehouse_spark.operators import (  # noqa: F401
        bpe,
        dedup,
        semdedup,
    )
    from bitcoin_datawarehouse_spark.operators import curation_pipeline as cp

    return f"""
    WITH {cp._curation_ctes(
        quality_sql=_registry.ORACLES["text_quality_classifier"],
        keep_col="pred_keep",
    )},
    {cp._split_pack_sql("s6")}"""


_registry.ORACLES["trainprep_classifier_curation"] = (
    _classifier_curation_oracle()
)
