"""A day in production, end to end (r10 VERDICT item 3).

Every subsystem below is individually pinned elsewhere; this test
proves they COMPOSE under one session's cache/catalog state:

1. ELT pipeline (CLI surface): seed the job registry, first sync
   (full refresh), incremental sync (watermark pushdown + merge);
2. bad batch + recovery: a poisoned third sync lands, the
   METRIC-HISTORY anomaly detector (median ± k·MAD over the prior
   syncs' ledger) catches it — an internally-valid batch wrong only
   against history — snapshot ROLLBACK restores the table, a
   corrected re-sync converges clean against the same ledger, VACUUM
   reclaims the snapshots;
3. SQL serving over the warehouse views reflects the recovered state;
4. model lifecycle: the NB gate model bootstraps through the
   versioned ModelRegistry, a volume-triggered REFRESH publishes a
   new generation between stream triggers, serving never mixes parts;
5. curation stream over arriving documents (registry-gated quality
   model + LSH dedup state), across the model swap;
6. retrieval index: curated docs chunk+featurize into the persisted
   IvfIndex inside the stream, searches serve streamed content, and
   COMPACTION leaves results bit-identical.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.pipeline import (
    FileReplaySource,
    Pipeline,
    Warehouse,
    parse_spec,
    register_warehouse_views,
    run_sql,
)
from bitcoin_datawarehouse_spark.pipeline.model_registry import (
    ModelRegistry,
    RefreshPolicy,
    corpus_profile,
)

from examples.bitcoin_warehouse_demo import (
    REFERENCE_JOBS,
    TRANSFORM_SPEC,
    record_responses,
    synth_rows,
)


def _nb_keep_all_parts(spark, marker: int):
    """Prior-only NB model (empty vocab, dpos > dneg → keep every
    doc); ``marker`` rides in npos purely to tell generations apart
    (npos=nneg keeps every per-token term 0 regardless)."""
    cls = spark.createDataFrame([], "tok string, cpos long, cneg long")
    consts = spark.createDataFrame(
        [(marker, marker, 1, 4, 1)],
        "npos long, nneg long, v long, dpos long, dneg long",
    )
    return {"cls": cls, "consts": consts}


def test_day_in_production(spark, tmp_path):
    from bitcoin_datawarehouse_spark.operators.chunk_retrieval import (
        CHUNK_EMB_DIM,
        CHUNK_VEC_MOD,
        chunk_vectors_frame,
    )
    from bitcoin_datawarehouse_spark.operators.ivf_index import IvfIndex
    from bitcoin_datawarehouse_spark.operators.lsh_index import LshDedupIndex
    from bitcoin_datawarehouse_spark.operators.text_stats import (
        chunk_windows_frame,
    )
    from bitcoin_datawarehouse_spark.streaming.curation_stream import (
        run_curation_stream,
    )
    from bitcoin_datawarehouse_spark.streaming.jobs import (
        run_stream_to_completion,
    )

    # ---- 1. seed + two good syncs (full refresh, then incremental) ----
    responses = tmp_path / "responses"
    record_responses(responses, synth_rows(16))
    wh = Warehouse(spark, str(tmp_path / "warehouse"), keep_versions=2)
    pipe = Pipeline(
        spark,
        wh,
        FileReplaySource(str(responses), param_column="date"),
        specs=parse_spec(TRANSFORM_SPEC),
    )
    pipe.control.seed(
        [
            {
                "job_name": name,
                "query_id": qid,
                "target_table": tgt,
                "p_key": key,
                "status": 0,
                "active": 1,
                "incremental_column": "date",
            }
            for name, qid, tgt, key in REFERENCE_JOBS
        ]
    )
    from bitcoin_datawarehouse_spark.pipeline.quality import MetricHistory

    hist = MetricHistory(wh, "block_sync")

    def block_metrics():
        row = (
            wh.read("bitcoin", "block")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.max("total_fees").alias("max_fees"),
            )
            .first()
        )
        return {"rows": float(row["rows"]), "max_fees": float(row["max_fees"])}

    first = pipe.run()
    assert all(r.ok for r in first)
    hist.record(block_metrics())
    record_responses(responses, synth_rows(24))
    second = pipe.run()
    assert all(r.ok for r in second)
    hist.record(block_metrics())
    good_blocks = wh.read("bitcoin", "block").count()
    assert good_blocks == 24

    # ---- 2. the bad batch: poisoned fees land via a normal sync ----
    poisoned = synth_rows(32)
    for row in poisoned[2177266][24:]:
        row["total_fees"] = 1e9  # corrupted upstream export
    record_responses(responses, poisoned)
    third = pipe.run()
    assert all(r.ok for r in third)  # the pipeline can't know yet
    # the METRIC-HISTORY detector fires — the batch is internally
    # valid (every row well-typed), wrong only against history; row
    # growth 16→24→32 stays inside the band, the fee spike does not
    flagged = hist.check(block_metrics(), k=4.0, min_history=2, floor=1.0)
    assert [a.metric for a in flagged] == ["max_fees"]

    # rollback restores the pre-bad snapshot
    wh.rollback("bitcoin", "block")
    restored = wh.read("bitcoin", "block")
    assert restored.count() == good_blocks
    assert restored.filter(F.col("total_fees") > 1e6).count() == 0

    # corrected upstream re-export → the incremental re-sync converges
    # (watermark comes from the RESTORED table, so the fixed rows are
    # re-fetched)
    record_responses(responses, synth_rows(32))
    fourth = pipe.run()
    assert all(r.ok for r in fourth)
    final_block = wh.read("bitcoin", "block")
    assert final_block.count() == 32
    assert final_block.filter(F.col("total_fees") > 1e6).count() == 0
    # the corrected state is unremarkable against history — record it
    assert hist.check(block_metrics(), k=4.0, min_history=2, floor=1.0) == []
    hist.record(block_metrics())

    # vacuum reclaims the recovery points once the day is verified
    assert wh.vacuum("bitcoin", "block", keep=1) >= 1

    # ---- 3. SQL serving reflects the recovered state ----
    register_warehouse_views(spark, wh)
    linked = run_sql(
        spark,
        """
        SELECT COUNT(*) AS linked_blocks
        FROM bitcoin_block b
        JOIN bitcoin_block p ON b.previous_block_hash = p.hash
        WHERE b.height = p.height + 1
        """,
    ).collect()[0]["linked_blocks"]
    assert linked == 31  # 32 blocks, every non-genesis link intact

    # ---- 4 + 5 + 6. model lifecycle + curation stream + index ----
    reg = ModelRegistry(wh)

    # distinct body per doc (shared bodies would be LSH near-dups);
    # only doc 4 repeats doc 1 verbatim — the exact-dup plant
    bodies = {
        1: "the quick brown fox jumps over the lazy dog and then walks "
           "back home across the quiet meadow while evening settles in",
        2: "a steady rain fell over the harbor town as fishing boats "
           "returned with their catch and lights came on along the pier",
        3: "deep in the library the old clock ticked while students "
           "turned pages and copied careful notes into worn journals",
    }
    doc_batches = [
        [(1, bodies[1], "s0"), (2, bodies[2], "s0")],
        [(3, bodies[3], "s1"), (4, bodies[1], "s1")],
        # ^ doc 4 is an exact dup of doc 1 → dedup state must drop it
    ]
    src = tmp_path / "docs_in"

    def _arrive(i: int) -> None:
        spark.createDataFrame(
            doc_batches[i], "doc_id long, text string, source string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))

    _arrive(0)
    # bootstrap generation 1 WITH the build-corpus profile so later
    # refresh decisions can drift/volume-compare against it
    reg.publish(
        "gate_nb",
        _nb_keep_all_parts(spark, marker=1),
        corpus_profile(
            spark.createDataFrame(
                [r[:2] for r in doc_batches[0]], "doc_id long, text string"
            )
        ),
    )

    def basis(i):
        v = [0.0] * CHUNK_EMB_DIM
        v[i] = 1.0
        return v

    idx = LshDedupIndex(wh)
    cidx = IvfIndex(wh, schema="rag", name="day_chunks")
    cidx.build(
        spark.createDataFrame([], "vec_id long, e array<double>"),
        centroids=spark.createDataFrame(
            [(0, basis(0)), (1, basis(1))],
            "centroid_id long, ce array<double>",
        ),
    )

    def _drain():
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, source string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        run_stream_to_completion(
            run_curation_stream(
                stream,
                idx,
                str(tmp_path / "ck"),
                quality_model="gate_nb",
                quality_registry=reg,
                chunk_index=cidx,
            )
        )

    # trigger 1: batch 0 under generation 1
    _drain()
    curated = {
        int(r["doc_id"])
        for r in wh.read("dedup_index", "curated_docs").collect()
    }
    assert curated == {1, 2}

    # the arriving corpus doubled → the volume trigger refreshes the
    # gate model between triggers (atomic generation swap under the
    # live stream)
    all_docs = spark.createDataFrame(
        [r[:2] for rows in doc_batches for r in rows],
        "doc_id long, text string",
    )
    dec = reg.refresh_if_needed(
        "gate_nb",
        all_docs,
        lambda: _nb_keep_all_parts(spark, marker=2),
        RefreshPolicy(growth_factor=1.5),
    )
    assert dec.refresh and "volume" in dec.reason
    assert reg.resolve(spark, "gate_nb").generation == 2

    # trigger 2: batch 1 arrives under generation 2 — stream stays
    # green, dedup state drops the cross-batch exact dup
    _arrive(1)
    _drain()
    curated = {
        int(r["doc_id"])
        for r in wh.read("dedup_index", "curated_docs").collect()
    }
    assert curated == {1, 2, 3}

    # the index serves STREAMED content: query with doc 3's own chunk
    # vectors, expect hits
    q = (
        chunk_vectors_frame(
            chunk_windows_frame(
                spark.createDataFrame(
                    [(3, bodies[3])],
                    "doc_id long, text string",
                )
            )
        )
        .filter(F.col("vec_id") % CHUNK_VEC_MOD == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    )
    kw = dict(top_k=3, exclude_self=False, exclude_group_div=CHUNK_VEC_MOD)
    before = sorted(tuple(r) for r in cidx.search(q, **kw).collect())
    assert before

    # compaction: maintenance under the served index is a no-op for
    # results
    cidx.compact()
    after = sorted(tuple(r) for r in cidx.search(q, **kw).collect())
    assert after == before

    # the day ends with a consistent ledger: job control saw four
    # pipeline runs × five jobs, all completed
    marks = wh.read("etl", "etl_job").count()
    assert marks == 5
    print(
        json.dumps(
            {
                "blocks": 32,
                "curated": sorted(curated),
                "model_generation": 2,
                "index_hits": len(before),
            }
        )
    )
