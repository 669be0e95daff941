"""Serve-economics probe for the model families (r10 VERDICT item 1):
split the FROZEN-model serving wall from the build wall for DSIR, the
NB quality classifier, and the bigram LM at sf0.1 and sf10.

Per scale and family it emits one JSON line with:
* ``build_s`` — fit + persist (the offline half a production loop
  pays once per refresh);
* ``serve_cold_s`` / ``serve_warm_s`` — scoring the whole corpus
  under the persisted model (the steady-state wall; warm run is the
  recorded number — Spark 4.1 first executions pay codegen/JIT).

Usage: python tools/probe_model_serve.py [--factors 100]
(factors scale sf0.1's documents table via gen_sf; 100 → sf10)
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SCRATCH = Path("/tmp/model_serve_probe")


def emit(**kv) -> None:
    print(json.dumps(kv), flush=True)


def run_scale(spark, sf_dir: str, label: str) -> None:
    from bitcoin_datawarehouse_spark.functions.cachereg import (
        release_tracked_caches,
    )
    from bitcoin_datawarehouse_spark.operators import dsir as D
    from bitcoin_datawarehouse_spark.operators import lm_quality as L
    from bitcoin_datawarehouse_spark.operators import quality_classifier as Q
    from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse
    from bitcoin_datawarehouse_spark.tables import load_table

    wh = Warehouse(spark, str(SCRATCH / f"wh_{label.replace('.', '_')}"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    families = (
        (
            "dsir",
            lambda: D.save_dsir_model(wh, spark, sf_dir),
            lambda: D.dsir_score_with(wh, docs),
        ),
        (
            "classifier",
            lambda: Q.save_quality_model(wh, spark, sf_dir),
            lambda: Q.score_with(wh, docs),
        ),
        (
            "lm",
            lambda: L.save_lm_model(wh, spark, sf_dir),
            lambda: L.lm_score_with(wh, docs),
        ),
    )
    for name, build, serve in families:
        t0 = time.perf_counter()
        build()
        build_s = round(time.perf_counter() - t0, 2)
        release_tracked_caches()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            noop(serve())
            walls.append(round(time.perf_counter() - t0, 2))
            release_tracked_caches()
        emit(
            scale=label,
            corpus=n,
            family=name,
            build_s=build_s,
            serve_cold_s=walls[0],
            serve_warm_s=walls[1],
            build_over_serve=round(build_s / walls[1], 1)
            if walls[1] > 0
            else None,
        )


def main() -> int:
    factors = [100]
    if "--factors" in sys.argv:
        factors = [
            int(x)
            for x in sys.argv[sys.argv.index("--factors") + 1].split(",")
        ]

    from bitcoin_datawarehouse_spark.session import get_spark

    if SCRATCH.exists():
        shutil.rmtree(SCRATCH)
    spark = get_spark()
    run_scale(spark, "/root/testdata/sf0.1", "sf0.1")

    for factor in factors:
        gen_dir = SCRATCH / f"gen{factor}"
        t0 = time.perf_counter()
        subprocess.run(
            [
                sys.executable,
                str(REPO / "tools" / "gen_sf.py"),
                "/root/testdata/sf0.1",
                str(gen_dir),
                str(factor),
                "--tables",
                "documents",
            ],
            check=True,
        )
        emit(step="generate", factor=factor,
             sec=round(time.perf_counter() - t0, 1))
        run_scale(spark, str(gen_dir), f"sf{factor / 10:g}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
