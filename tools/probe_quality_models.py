"""Decade probe: NB quality classifier + DSIR selection
(quality_classifier.py, dsir.py) at sf0.1 / sf1 / sf10.

Per scale: corpus size, wall for each operator (warmed second run —
Spark 4.1 first executions pay codegen/JIT), predicted-keep and
selection counts, and the shuffle ledger from the UI REST API.

Usage: python tools/probe_quality_models.py [--factors 10,100]
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

SCRATCH = Path("/tmp/quality_models_probe")


def emit(**kv) -> None:
    print(json.dumps(kv), flush=True)


def ledger(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    w = [s.get("shuffleWriteBytes", 0) for s in stages]
    return {
        "stages": len(stages),
        "shuffle_write_mb": round(sum(w) / 1e6, 1),
        "peak_stage_mb": round(max(w, default=0) / 1e6, 1),
    }


def run_scale(spark, sf_dir: str, label: str) -> None:
    from bitcoin_datawarehouse_spark.functions.cachereg import (
        release_tracked_caches,
    )
    from bitcoin_datawarehouse_spark.operators.dsir import (
        trainprep_dsir_select,
    )
    from bitcoin_datawarehouse_spark.operators.quality_classifier import (
        classifier_scores,
    )

    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    for name, fn, agg in (
        (
            "classifier",
            lambda: classifier_scores(spark, sf_dir),
            lambda df: df.selectExpr(
                "count(*) AS n", "count_if(pred_keep) AS kept"
            ).collect()[0],
        ),
        (
            "dsir",
            lambda: trainprep_dsir_select(spark, sf_dir),
            lambda df: df.selectExpr("count(*) AS n", "0 AS kept").collect()[
                0
            ],
        ),
    ):
        walls = []
        out = None
        for _ in range(2):  # warmed second run is the recorded number
            t0 = time.perf_counter()
            out = agg(fn())
            walls.append(round(time.perf_counter() - t0, 2))
            release_tracked_caches()
        emit(
            scale=label,
            corpus=n,
            op=name,
            cold_s=walls[0],
            warm_s=walls[1],
            rows=out["n"],
            kept=out["kept"],
            **ledger(spark),
        )


def main() -> int:
    factors = [10, 100]
    if "--factors" in sys.argv:
        factors = [
            int(x)
            for x in sys.argv[sys.argv.index("--factors") + 1].split(",")
        ]

    from bitcoin_datawarehouse_spark.session import get_spark

    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    run_scale(spark, "/root/testdata/sf0.1", "sf0.1")

    for factor in factors:
        if SCRATCH.exists():
            shutil.rmtree(SCRATCH)
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
