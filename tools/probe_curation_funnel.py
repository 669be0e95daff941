"""Funnel-realistic decade probe of the composed curation pipeline
(r8 VERDICT item 3).

The r8 composition probe was honest about its blind spot: the
fixture-tuned Gopher band keeps only ~3 k docs at sf10/sf100, so the
measured composition exercised the full-corpus kernels while the
PAIR-GENERATING stages (MinHash-LSH, the mixture windows, packing)
saw thousands of survivors.  This probe re-runs the IDENTICAL
downstream composition (`curation_pipeline.curated_packed`, the
registered code path) under a PERCENTILE-DERIVED quality band — keep
docs whose n_words lies within [P05, P95] of the corpus — so a
constant ~90 % of the corpus survives stage 1 and the pair stages see
hundreds of thousands of documents at sf10 (millions at sf100).

Measured per scale: total wall, the per-stage funnel (survivor count
after each gate), and the shuffle ledger (stage count + total/peak
shuffle write) from the UI REST API — the contention-independent
composition evidence the r8 ledger established.

Usage: python tools/probe_curation_funnel.py [--factor N] (default
100 = sf10 from the sf0.1 fixture; 1000 = sf100 — generation alone
is minutes and needs ~12 GB of /tmp)
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SCRATCH = Path("/tmp/curation_funnel_probe")


def emit(**kv) -> None:
    print(json.dumps(kv), flush=True)


def shuffle_ledger(spark) -> dict:
    """Stage count + shuffle write totals for THIS app via UI REST."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    w = [s.get("shuffleWriteBytes", 0) for s in stages]
    return {
        "stages": len(stages),
        "shuffle_stages": sum(1 for x in w if x),
        "shuffle_write_mb": round(sum(w) / 1e6, 1),
        "peak_stage_mb": round(max(w, default=0) / 1e6, 1),
    }


def main() -> int:
    factor = 100
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])

    if SCRATCH.exists():
        shutil.rmtree(SCRATCH)
    SCRATCH.mkdir(parents=True)
    gen_dir = SCRATCH / "gen"
    t0 = time.perf_counter()
    subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "gen_sf.py"),
            "/root/testdata/sf0.1",
            str(gen_dir),
            str(factor),
            "--tables",
            "documents,embeddings",
        ],
        check=True,
    )
    emit(step="generate", factor=factor,
         sec=round(time.perf_counter() - t0, 1))

    from pyspark.sql import functions as F

    from bitcoin_datawarehouse_spark.functions.cachereg import (
        release_tracked_caches,
    )
    from bitcoin_datawarehouse_spark.operators.curation_pipeline import (
        _curation_stage_frames,
        curated_packed,
    )
    from bitcoin_datawarehouse_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    sf_dir = str(gen_dir)

    docs = spark.read.parquet(str(gen_dir / "documents.parquet"))
    n_docs = docs.count()

    # percentile band on n_words: [P05, P95] keeps ~90 % — the
    # funnel-realistic stage-1 gate (percentile_approx, one aggregate)
    n_words = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda t: t != F.lit(""),
        )
    )
    wdocs = docs.select("doc_id", n_words.alias("nw"))
    lo, hi = wdocs.select(
        F.percentile_approx("nw", [0.05, 0.95], 10000).alias("p")
    ).collect()[0]["p"]
    keep = wdocs.filter(
        (F.col("nw") >= lo) & (F.col("nw") <= hi)
    ).select("doc_id")
    emit(step="band", p05=int(lo), p95=int(hi), corpus=n_docs)

    # ---- the composition, funnel-realistic -----------------------------
    t0 = time.perf_counter()
    out = curated_packed(spark, sf_dir, quality_keep=keep).count()
    total = round(time.perf_counter() - t0, 1)
    led = shuffle_ledger(spark)
    emit(step="composite", factor=factor, packed_rows=out, sec=total,
         **led)
    release_tracked_caches()

    # ---- per-stage funnel (separate pass — counts re-run the chain) ----
    frames = _curation_stage_frames(spark, sf_dir, quality_keep=keep)
    funnel = {}
    t0 = time.perf_counter()
    for name in (
        "input", "gopher", "exact", "minhash", "semdedup",
        "decontam", "mixture",
    ):
        funnel[name] = frames[name].count()
    emit(step="funnel", sec=round(time.perf_counter() - t0, 1), **funnel)
    release_tracked_caches()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
