"""Hot-key skew probe for the curation composites (r10 VERDICT
item 4): the two uncapped shuffles the verdict named —

* ``paragraph.py``'s global-first-occurrence window
  (``MIN(k) OVER (PARTITION BY h)``): a boilerplate paragraph in 50%
  of documents puts half the kernel output in ONE window partition;
* ``lm_quality.fit_lm_parts``'s ``repartition("w1")`` cache: a hot
  head word ("the" starts ~half of all bigrams) funnels half the
  docbig rows into one cache partition and its downstream aggregates.

Planted-hot-key fixture (the salted_join methodology from
tools/probe_skew_join.py / the CLAUDE.md AQE-bytes lesson): N
synthetic docs, 50% sharing the hot paragraph / hot head word.  Each
variant is timed twice (warmed second run recorded) so the verdict is
a measured number, not a guess:

* paragraph: window plan vs partial-agg+join rewrite
  (``groupBy(h).min(k)`` collapses the hot key MAP-SIDE, then a join
  whose hot partition AQE can split — windows it cannot);
* LM: shared ``repartition(w1)`` exchange vs two independent
  aggregates (each with map-side combine).

Usage: python tools/probe_skew_curation.py [--docs 100000]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def emit(**kv) -> None:
    print(json.dumps(kv), flush=True)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(label: str, fn) -> float:
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 2))
    emit(case=label, cold_s=walls[0], warm_s=walls[1])
    return walls[1]


def _para_docs(spark, n_docs: int, hot_share: float):
    """n_docs docs × 4 paragraphs of PARA_W tokens; the first
    paragraph of ``hot_share`` of the docs is ONE shared boilerplate
    string (hot md5), everything else unique per (doc, para)."""
    from pyspark.sql import functions as F
    from bitcoin_datawarehouse_spark.operators.paragraph import PARA_W

    boiler = " ".join(f"boil{i}" for i in range(PARA_W))
    uniq = (
        "concat_ws(' ', transform(sequence(0, {w}), "
        "i -> concat('u', id, 'x', {p}, 'x', i)))"
    )
    paras = [
        F.when(
            F.col("id") % F.lit(int(1 / hot_share)) == 0, F.lit(boiler)
        ).otherwise(F.expr(uniq.format(w=PARA_W - 1, p=0)))
    ] + [
        F.expr(uniq.format(w=PARA_W - 1, p=p)) for p in (1, 2, 3)
    ]
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("probe").alias("source"),
            F.concat_ws(" ", *paras).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )


def probe_paragraph(spark, n_docs: int) -> None:
    from pyspark.sql import Window as W, functions as F
    from bitcoin_datawarehouse_spark.operators.paragraph import (
        dedup_paragraphs_frame,
        paragraph_rows_frame,
    )

    docs = _para_docs(spark, n_docs, hot_share=0.5)
    emit(fixture="paragraph", docs=n_docs, hot_share=0.5)

    _timed("para_window_current", lambda: _noop(dedup_paragraphs_frame(docs)))

    def agg_join() -> None:
        paras = paragraph_rows_frame(docs)
        firsts = paras.groupBy("h").agg(F.min("k").alias("k0"))
        kept = paras.join(firsts, "h").withColumn(
            "keep", F.col("k") == F.col("k0")
        )
        surviving = F.array_sort(
            F.collect_list(F.when(F.col("keep"), F.struct("pos", "para")))
        )
        out = kept.groupBy("doc_id").agg(
            F.count("*").alias("n_paras"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.md5(
                F.concat_ws(
                    "\n", F.transform(surviving, lambda x: x["para"])
                ).cast("binary")
            ).alias("dedup_md5"),
        )
        _noop(out)

    _timed("para_aggjoin_variant", agg_join)

    # sanity: both plans agree on the aggregate observables
    w = W.partitionBy("h")
    paras = paragraph_rows_frame(docs)
    cur = (
        paras.withColumn("keep", F.col("k") == F.min("k").over(w))
        .agg(
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    firsts = paras.groupBy("h").agg(F.min("k").alias("k0"))
    alt = (
        paras.join(firsts, "h")
        .withColumn("keep", F.col("k") == F.col("k0"))
        .agg(
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    emit(
        check="paragraph_plans_agree",
        ok=(cur["kept"] == alt["kept"] and cur["n"] == alt["n"]),
        kept=int(cur["kept"]),
        rows=int(cur["n"]),
    )


def _lm_docs(spark, n_docs: int):
    """Docs whose text alternates the hot head word with unique
    tails: "the a<d>x0 the a<d>x1 ..." → half of all bigram rows have
    w1='the' (each with a distinct w2, so nothing pre-collapses in
    the per-doc kernel)."""
    from pyspark.sql import functions as F

    body = (
        "concat_ws(' ', flatten(transform(sequence(0, 39), "
        "i -> array('the', concat('a', id, 'x', i)))))"
    )
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), F.expr(body).alias("text"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )


def probe_lm(spark, n_docs: int) -> None:
    from pyspark.sql import functions as F
    from bitcoin_datawarehouse_spark.functions.cachereg import (
        cache_tracked,
        release_tracked_caches,
    )
    from bitcoin_datawarehouse_spark.operators.lm_quality import (
        _doc_bigram_counts_frame,
    )

    docs = _lm_docs(spark, n_docs)
    emit(fixture="lm_bigrams", docs=n_docs, hot_w1="the")

    def current() -> None:
        docbig = cache_tracked(
            _doc_bigram_counts_frame(docs).repartition("w1")
        )
        uni = docbig.groupBy("w1").agg(
            F.sum("dcnt").cast("long").alias("cu")
        )
        uni.count()
        big = (
            docbig.filter(F.col("w2").isNotNull())
            .groupBy("w1", "w2")
            .agg(F.sum("dcnt").cast("long").alias("cb"))
        )
        _noop(big)
        release_tracked_caches()

    def independent() -> None:
        docbig = cache_tracked(_doc_bigram_counts_frame(docs))
        uni = docbig.groupBy("w1").agg(
            F.sum("dcnt").cast("long").alias("cu")
        )
        uni.count()
        big = (
            docbig.filter(F.col("w2").isNotNull())
            .groupBy("w1", "w2")
            .agg(F.sum("dcnt").cast("long").alias("cb"))
        )
        _noop(big)
        release_tracked_caches()

    _timed("lm_repartition_w1_current", current)
    _timed("lm_independent_aggs_variant", independent)


def main() -> int:
    n_docs = 100_000
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])

    from bitcoin_datawarehouse_spark.session import get_spark

    spark = get_spark()
    # warm the Arrow/pandas worker pool
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    probe_paragraph(spark, n_docs)
    probe_lm(spark, n_docs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
