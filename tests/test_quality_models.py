"""Model-based curation operators: Naive Bayes quality classifier
(quality_classifier.py) and DSIR hashed-n-gram importance resampling
(dsir.py).

The registered gates prove cross-engine arithmetic; these tests prove
the LEARNERS — on designed corpora with planted vocabulary signal the
classifier must generalize to held-out documents and DSIR must enrich
the selection toward the target slice.
"""

from __future__ import annotations

import hashlib

import pytest

from bitcoin_datawarehouse_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16)


def _designed_docs():
    """Two planted classes the Gopher gate separates AND whose
    vocabularies are disjoint, so a bag-of-words learner trained on
    rule labels must classify held-out docs of both classes:

    * keep-class: 40 words from vocabulary A, two stopword hits,
      clean text (passes every rule);
    * drop-class: 10 words from vocabulary B (fails the word-count
      band).
    """
    vocab_a = ["apple", "river", "stone", "cloud", "meadow", "lantern"]
    vocab_b = ["zx", "qv", "wj", "kp", "fz", "gq"]
    rows = []
    for i in range(40):  # keep class, doc_ids 0..39
        words = ["the", "the"] + [
            vocab_a[(i + j) % len(vocab_a)] for j in range(38)
        ]
        rows.append((i, " ".join(words)))
    for i in range(40):  # drop class, doc_ids 100..139
        words = [vocab_b[(i + j) % len(vocab_b)] for j in range(10)]
        rows.append((100 + i, " ".join(words)))
    return rows


@pytest.fixture()
def designed_dir(spark, tmp_path):
    df = spark.createDataFrame(_designed_docs(), "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_classifier_generalizes_to_heldout(spark, designed_dir):
    rows = _designed_docs()
    # the deterministic hash slice must train on both classes for the
    # fixture to be meaningful (fixed ids -> fixed outcome)
    train_pos = [i for i, _ in rows if i < 100 and _bucket(i) < 77]
    train_neg = [i for i, _ in rows if i >= 100 and _bucket(i) < 77]
    assert len(train_pos) >= 3 and len(train_neg) >= 3

    got = {
        r["doc_id"]: r
        for r in QUERIES["text_quality_classifier"](
            spark, designed_dir
        ).collect()
    }
    assert len(got) == len(rows)
    for doc_id, _ in rows:
        expected = doc_id < 100
        assert got[doc_id]["pred_keep"] == expected, (
            doc_id,
            got[doc_id]["score_micro"],
        )
    # scores separate: every keep-class doc outranks every drop-class
    assert min(
        got[i]["score_micro"] for i, _ in rows if i < 100
    ) > max(got[i]["score_micro"] for i, _ in rows if i >= 100)


def test_classifier_heldout_eval_counts(spark, designed_dir):
    rows = _designed_docs()
    held = [i for i, _ in rows if _bucket(i) >= 77]
    r = QUERIES["text_classifier_heldout_eval"](spark, designed_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_heldout"] == len(held)
    assert r["n_heldout"] == r["tp"] + r["fp"] + r["fn"] + r["tn"]
    # perfect separation on the designed corpus
    assert r["fp"] == 0 and r["fn"] == 0
    assert r["tp"] == sum(1 for i in held if i < 100)
    assert r["tn"] == sum(1 for i in held if i >= 100)


def test_dsir_enriches_toward_target(spark, designed_dir):
    """Selection (top 1/4 by weight) must be drawn overwhelmingly from
    the target (Gopher-keep) class: its vocabulary dominates the
    target distribution while the drop vocabulary appears only in the
    raw pool."""
    sel = QUERIES["trainprep_dsir_select"](spark, designed_dir).collect()
    assert len(sel) == 20  # ceil(80 / 4)
    assert all(r["doc_id"] < 100 for r in sel)
    # ranks are 1..k, each exactly once (global rank, no gaps/ties)
    assert sorted(r["rk"] for r in sel) == list(range(1, 21))


def test_dsir_weights_deterministic_and_complete(spark):
    """On the real fixture: every non-empty document gets a weight;
    re-running produces identical weights (pure plan, no RNG)."""
    from bitcoin_datawarehouse_spark.operators.dsir import dsir_weights

    a = {r["doc_id"]: r["weight_micro"] for r in dsir_weights(spark, SF_SMALL).collect()}
    b = {r["doc_id"]: r["weight_micro"] for r in dsir_weights(spark, SF_SMALL).collect()}
    assert a == b
    assert len(a) == 500


def test_served_model_equals_in_plan_scores(spark, designed_dir):
    """Persisted-model serving must reproduce the in-plan gate row for
    row (the persisted counts ARE the trained counts — the bpe_served
    load≡train discipline)."""
    a = sorted(
        tuple(r)
        for r in QUERIES["text_quality_classifier"](
            spark, designed_dir
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in QUERIES["text_quality_classifier_served"](
            spark, designed_dir
        ).collect()
    )
    assert a == b


def test_classifier_curation_composite_consistency(spark):
    """The classifier-gated composite must agree with manually hooking
    the classifier keep set into curated_packed (same code path the
    probe uses), and survivors must be a subset of predicted keeps."""
    from pyspark.sql import functions as F

    from bitcoin_datawarehouse_spark.operators.curation_pipeline import (
        curated_packed,
    )
    from bitcoin_datawarehouse_spark.operators.quality_classifier import (
        classifier_scores,
    )

    out = QUERIES["trainprep_classifier_curation"](spark, SF_SMALL)
    rows = out.collect()
    keep = {
        r["doc_id"]
        for r in classifier_scores(spark, SF_SMALL)
        .filter(F.col("pred_keep"))
        .select("doc_id")
        .collect()
    }
    assert rows, "composite produced no packed rows"
    assert {r["doc_id"] for r in rows} <= keep
    manual = curated_packed(
        spark,
        SF_SMALL,
        quality_keep=classifier_scores(spark, SF_SMALL)
        .filter(F.col("pred_keep"))
        .select("doc_id"),
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, manual))


def test_stream_model_gate_matches_frozen_batch_reference(
    spark, tmp_path, designed_dir
):
    """The streaming curation ingest with ``quality_model=`` must (a)
    gate on the MODEL, not the rules — a Gopher-passing vocab-B doc is
    dropped — and (b) produce the same curated set as a sequential
    batch loop scoring with the same frozen model; replay is a no-op."""
    import hashlib

    from pyspark.sql import functions as F

    from bitcoin_datawarehouse_spark.operators.curation import (
        gopher_keep_col,
        gopher_metrics_frame,
    )
    from bitcoin_datawarehouse_spark.operators.dedup import (
        shingle_sets_frame,
    )
    from bitcoin_datawarehouse_spark.operators.lsh_index import (
        LshDedupIndex,
    )
    from bitcoin_datawarehouse_spark.operators.quality_classifier import (
        save_quality_model,
        score_with,
    )
    from bitcoin_datawarehouse_spark.pipeline import Warehouse
    from bitcoin_datawarehouse_spark.streaming.curation_stream import (
        run_curation_stream,
    )
    from bitcoin_datawarehouse_spark.streaming.jobs import (
        run_stream_to_completion,
    )

    vocab_b = ["zx", "qv", "wj", "kp", "fz", "gq"]

    def a_text(words: list[str]) -> str:
        # 40 words, two stop hits, built from a 3-word DISJOINT subset
        # of the trained vocab-A (disjoint subsets share no shingles —
        # rotations of one cycle are genuine near-dups and LSH rightly
        # drops them, the first draft of this test proved it)
        body = (words * 13)[:38]
        return " ".join(["the", "the"] + body)

    # 40 words incl. two stop hits -> PASSES Gopher; vocab-B tokens
    # -> the model must drop it (mean word len 2 would fail gopher, so
    # mix in enough 3+-char B-ish words to clear every rule)
    b_long = " ".join(
        ["the", "the"]
        + [vocab_b[j % len(vocab_b)] + "xyz" for j in range(38)]
    )

    idx = LshDedupIndex(Warehouse(spark, str(tmp_path / "wh")))
    # train the model on the designed corpus fixture, persist into the
    # index warehouse (the serve-time artifact)
    save_quality_model(idx.wh, spark, designed_dir, name="qmod")

    doc0 = a_text(["apple", "river", "stone"])
    doc4 = a_text(["cloud", "meadow", "lantern"])
    doc3 = doc0.rsplit(" ", 1)[0] + " meadow"  # near-dup: 1 of 40 tokens
    batches = [
        [(0, doc0, "s0"), (1, doc0, "s0"), (2, b_long, "s1")],
        [(3, doc3, "s2"), (4, doc4, "s2")],
    ]
    # sanity: the distinguishing doc passes the RULES (so only the
    # model explains its absence)
    gm = gopher_metrics_frame(
        spark.createDataFrame([(2, b_long)], "doc_id long, text string")
    )
    assert gm.filter(gopher_keep_col()).count() == 1

    src = tmp_path / "in"
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_stream_to_completion(
        run_curation_stream(
            stream, idx, str(tmp_path / "ck1"), quality_model="qmod"
        )
    )

    # sequential reference with the SAME frozen model
    ref_idx = LshDedupIndex(Warehouse(spark, str(tmp_path / "ref_wh")))
    hist: set[str] = set()
    curated_ref: set[int] = set()
    for rows in batches:
        bdf = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        keep_ids = {
            r["doc_id"]
            for r in score_with(
                idx.wh, bdf.select("doc_id", "text"), "qmod"
            )
            .filter(F.col("pred_keep"))
            .collect()
        }
        best: dict[str, tuple] = {}
        for did, txt, _s in sorted(rows):
            if did not in keep_ids:
                continue
            h = hashlib.md5(txt.encode()).hexdigest()
            if h in hist or h in best:
                continue
            best[h] = (did, txt)
        hist |= set(best.keys())
        if best:
            sdf = spark.createDataFrame(
                sorted(best.values()), "doc_id long, text string"
            )
            dec = ref_idx.ingest_batch(shingle_sets_frame(sdf))
            curated_ref |= {
                r["doc_id"] for r in dec.collect() if not r["is_dup"]
            }

    got = {
        r["doc_id"]
        for r in idx.wh.read(idx.schema, "curated_docs").collect()
    }
    assert got == curated_ref == {0, 4}
    # 1 exact-dup, 2 model-dropped (rules would keep it), 3 LSH near-dup

    # replay, fresh checkpoint -> no-op
    stream2 = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_stream_to_completion(
        run_curation_stream(
            stream2, idx, str(tmp_path / "ck2"), quality_model="qmod"
        )
    )
    assert {
        r["doc_id"]
        for r in idx.wh.read(idx.schema, "curated_docs").collect()
    } == got


def test_soft_dedup_weights_on_planted_clusters(spark, tmp_path):
    """SoftDeDup semantics on planted near-dup clusters: cluster
    labels/sizes are right, singletons are kept unconditionally, and
    every Bernoulli decision equals the salted-md5 integer test
    recomputed in pure python (full decision audit, no sampling
    hand-waving)."""
    base = "one two three four five six seven eight nine ten"
    rows = (
        # a 4-doc near-dup cluster (one token varies at the tail)
        [(i, base + f" tail{i % 2} extra", "s") for i in range(4)]
        # singletons with disjoint vocabulary
        + [
            (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "s"),
            (11, "red green blue yellow purple orange cyan magenta lime teal", "s"),
        ]
    )
    # doc 0/2 share text exactly ("tail0"), 1/3 share "tail1" — and the
    # 9-token common prefix links all four into one Jaccard cluster
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in QUERIES["dedup_soft_weights"](spark, str(tmp_path)).collect()
    }
    assert len(got) == 6
    assert {got[i]["component"] for i in range(4)} == {0}
    assert all(got[i]["cluster_size"] == 4 for i in range(4))
    for s in (10, 11):
        assert got[s]["cluster_size"] == 1
        assert got[s]["kept"] is True  # singletons never downweighted

    def u32(doc_id: int) -> int:
        return int(
            hashlib.md5(f"soft{doc_id}".encode()).hexdigest()[:8], 16
        )

    for did, r in got.items():
        assert r["kept"] == (u32(did) * r["cluster_size"] < 2**32), did


def test_soft_dedup_expected_mass_on_fixture(spark):
    """On the real fixture: every doc labeled, kept ⊆ corpus,
    per-cluster kept counts are plausible (≤ size), and the full
    decision audit holds corpus-wide."""
    rows = QUERIES["dedup_soft_weights"](spark, SF_SMALL).collect()
    assert len(rows) == 500
    from collections import defaultdict

    by_comp = defaultdict(list)
    for r in rows:
        by_comp[r["component"]].append(r)
    for comp, members in by_comp.items():
        assert len({m["cluster_size"] for m in members}) == 1
        assert members[0]["cluster_size"] == len(members)
    # singletons all kept; decision audit corpus-wide
    for r in rows:
        exp = (
            int(
                hashlib.md5(f"soft{r['doc_id']}".encode()).hexdigest()[:8],
                16,
            )
            * r["cluster_size"]
            < 2**32
        )
        assert r["kept"] == exp


def test_lm_served_equals_in_plan_and_smooths_unseen(spark, tmp_path):
    """The persisted-LM serve path must reproduce the in-plan gate row
    for row, and scoring UNSEEN text must smooth (add-one floor) to a
    defined high-entropy score, never NULL."""
    from pyspark.sql import functions as F

    from bitcoin_datawarehouse_spark.operators.lm_quality import (
        lm_score_with,
        save_lm_model,
    )
    from bitcoin_datawarehouse_spark.pipeline import Warehouse
    from bitcoin_datawarehouse_spark.registry import QUERIES as Q

    a = sorted(tuple(r) for r in Q["text_lm_quality"](spark, SF_SMALL).collect())
    b = sorted(
        tuple(r) for r in Q["text_lm_quality_served"](spark, SF_SMALL).collect()
    )
    assert a == b

    wh = Warehouse(spark, str(tmp_path / "wh"))
    save_lm_model(wh, spark, SF_SMALL)
    unseen = spark.createDataFrame(
        [
            (1, "qqqq wwww eeee rrrr tttt"),  # fully unseen vocabulary
            (2, "key agg row scan slow fast"),  # in-vocabulary text
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in lm_score_with(wh, unseen).collect()
    }
    assert rows[1]["bits_per_token"] is not None
    assert rows[2]["bits_per_token"] is not None
    # unseen vocabulary must score strictly higher entropy
    assert rows[1]["bits_per_token"] > rows[2]["bits_per_token"]


def test_semantic_decontam_on_planted_vectors(spark, tmp_path):
    """Planted semantics: a corpus vector equal to an eval vector is
    contaminated (cosine 1), a near-paraphrase above the threshold is
    contaminated, an orthogonal vector is clean — and eval members
    themselves never appear in the output."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),  # eval member (0 % 97 == 0)
        (97, [0.0, 1.0, 0.0, 0.0]),  # eval member
        (1, [1.0, 0.0, 0.0, 0.0]),  # exact copy of eval 0
        (2, [0.9, 0.1, 0.0, 0.0]),  # paraphrase of eval 0 (cos ~0.99)
        (3, [0.0, 0.0, 1.0, 0.0]),  # orthogonal to both -> clean
    ]
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    got = {
        r["vec_id"]: r
        for r in QUERIES["decontam_semantic_overlap"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {1, 2, 3}  # eval members excluded
    assert got[1]["contaminated"] and got[1]["max_eval_cosine"] == 1.0
    assert got[2]["contaminated"] and got[2]["n_eval_hits"] >= 1
    assert not got[3]["contaminated"] and got[3]["n_eval_hits"] == 0


def test_global_prefix_sum_equals_monolithic_window(spark):
    """The distributed scan must be bit-identical to the
    single-partition SUM() OVER (ORDER BY …) it replaces, on a frame
    with ties in the value column and skewed key spacing."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bitcoin_datawarehouse_spark.functions.ranking import (
        with_global_prefix_sum,
    )

    rows = [(i, (i * 7919) % 1000, (i % 13) + 1) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, key long, v long")
    got = {
        r["id"]: (r["ps"], r["tot"])
        for r in with_global_prefix_sum(
            df, ["key", "id"], "v", prefix_alias="ps", total_alias="tot"
        ).collect()
    }
    w = W.orderBy("key", "id").rowsBetween(W.unboundedPreceding, -1)
    exp = {
        r["id"]: (r["ps"], r["tot"])
        for r in df.select(
            "id",
            F.coalesce(F.sum("v").over(w), F.lit(0)).alias("ps"),
            F.sum("v").over(
                W.orderBy("key", "id").rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            ).alias("tot"),
        ).collect()
    }
    assert got == exp


def test_curriculum_pack_invariants(spark):
    """Curriculum packing on the fixture: offsets are the exclusive
    running sum in (bits_per_token, doc_id) order, chunks are
    contiguous, and the easiest doc starts at offset 0."""
    rows = sorted(
        QUERIES["trainprep_curriculum_pack"](spark, SF_SMALL).collect(),
        key=lambda r: (r["bits_per_token"], r["doc_id"]),
    )
    assert rows[0]["start_offset"] == 0
    acc = 0
    for r in rows:
        assert r["start_offset"] == acc
        assert r["chunk_id"] == acc // 256
        acc += r["n_tokens"]


ORACLE_PAIR = ["text_quality_classifier", "trainprep_dsir_select"]


@pytest.mark.parametrize("name", ORACLE_PAIR)
def test_new_gates_match_oracle_on_designed_corpus(
    spark, designed_dir, name
):
    """Cross-engine equality on the DESIGNED corpus too (the sf0.01
    mirror runs via tools/check_oracle.py; this exercises the planted
    two-vocabulary shape where class counts are lopsided)."""
    import duckdb

    from bitcoin_datawarehouse_spark.registry import ORACLES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{designed_dir}/documents.parquet/*.parquet'"
    )
    sdf = QUERIES[name](spark, designed_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(repr(r[i]) for i in order) for r in rows)

    assert norm(srows, sdf.columns) == norm(orows, ocols)


def test_stream_dsir_gate_matches_frozen_batch_reference(
    spark, tmp_path, designed_dir
):
    """The streaming curation ingest with ``dsir_model=`` must (a)
    gate on the frozen importance weights — a Gopher-passing doc with
    off-target vocabulary is dropped — and (b) keep exactly the docs a
    batch ``dsir_score_with`` pass at the same threshold keeps; the
    persisted default threshold equals the build-time rank boundary."""
    from pyspark.sql import functions as F

    from bitcoin_datawarehouse_spark.operators.curation import (
        gopher_keep_col,
        gopher_metrics_frame,
    )
    from bitcoin_datawarehouse_spark.operators.dsir import (
        SELECT_DENOM,
        _select_top,
        dsir_score_with,
        dsir_threshold,
        save_dsir_model,
    )
    from bitcoin_datawarehouse_spark.operators.lsh_index import LshDedupIndex
    from bitcoin_datawarehouse_spark.pipeline import Warehouse
    from bitcoin_datawarehouse_spark.streaming.curation_stream import (
        run_curation_stream,
    )
    from bitcoin_datawarehouse_spark.streaming.jobs import (
        run_stream_to_completion,
    )

    vocab_a = ["apple", "river", "stone", "cloud", "meadow", "lantern"]
    vocab_b = ["zx", "qv", "wj", "kp", "fz", "gq"]

    def a_text(words):
        body = (words * 13)[:38]
        return " ".join(["the", "the"] + body)

    # on-target arrivals: disjoint vocab-A subsets (not near-dups of
    # each other); off-target arrival: Gopher-PASSING but vocab-B-ish
    doc1 = a_text(vocab_a[:3])
    doc2 = a_text(vocab_a[3:])
    b_long = " ".join(
        ["the", "the"] + [vocab_b[j % len(vocab_b)] + "xyz" for j in range(38)]
    )
    arrivals = [(201, doc1, "s0"), (202, doc2, "s0"), (203, b_long, "s1")]
    gm = gopher_metrics_frame(
        spark.createDataFrame(
            [(i, t) for i, t, _ in arrivals], "doc_id long, text string"
        )
    )
    assert gm.filter(gopher_keep_col()).count() == 3  # only DSIR drops

    idx = LshDedupIndex(Warehouse(spark, str(tmp_path / "wh")))
    save_dsir_model(idx.wh, spark, designed_dir, name="dmod")

    # persisted default threshold == the build-time rank boundary
    build_docs = spark.read.parquet(
        str(tmp_path / "documents.parquet")
    )
    k = (build_docs.count() + SELECT_DENOM - 1) // SELECT_DENOM
    boundary = (
        _select_top(dsir_score_with(idx.wh, build_docs, "dmod"), k)
        .agg(F.min("weight_micro"))
        .collect()[0][0]
    )
    assert dsir_threshold(idx.wh, spark, "dmod") == boundary

    # batch reference at an explicit separating threshold
    bdf = spark.createDataFrame(
        [(i, t) for i, t, _ in arrivals], "doc_id long, text string"
    )
    wts = {
        r["doc_id"]: r["weight_micro"]
        for r in dsir_score_with(idx.wh, bdf, "dmod").collect()
    }
    assert wts[201] > wts[203] and wts[202] > wts[203]
    thr = (min(wts[201], wts[202]) + wts[203]) // 2
    ref_keep = {i for i, w in wts.items() if w >= thr}
    assert ref_keep == {201, 202}

    src = tmp_path / "in"
    spark.createDataFrame(
        arrivals, "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_stream_to_completion(
        run_curation_stream(
            stream,
            idx,
            str(tmp_path / "ck1"),
            dsir_model="dmod",
            dsir_threshold_micro=int(thr),
        )
    )
    got = {
        r["doc_id"]
        for r in idx.wh.read(idx.schema, "curated_docs").collect()
    }
    assert got == ref_keep

    # replay with a fresh checkpoint -> no-op
    stream2 = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_stream_to_completion(
        run_curation_stream(
            stream2,
            idx,
            str(tmp_path / "ck2"),
            dsir_model="dmod",
            dsir_threshold_micro=int(thr),
        )
    )
    assert {
        r["doc_id"]
        for r in idx.wh.read(idx.schema, "curated_docs").collect()
    } == ref_keep
