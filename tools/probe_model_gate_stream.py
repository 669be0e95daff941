"""Per-trigger flatness probe: the MODEL-GATED curation stream
(SCALING.md evidence, round 9 session 2).

The r8/r9 probes established per-trigger flatness for the rule-gated
3/5-stage loops; this one swaps stage 1 to the persisted NB model
(``quality_model=``) and re-measures: 8 triggers × 625 docs of the
sf0.1 documents fixture, model trained on the same corpus and
persisted into the index warehouse first (the serve-time shape).
Reports per-trigger wall from the streaming progress log plus final
state sizes.

Usage: python tools/probe_model_gate_stream.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

from pyspark.sql import Window as W
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from bitcoin_datawarehouse_spark.operators.lsh_index import (  # noqa: E402
    LshDedupIndex,
)
from bitcoin_datawarehouse_spark.operators.quality_classifier import (  # noqa: E402
    save_quality_model,
)
from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse  # noqa: E402
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402
from bitcoin_datawarehouse_spark.streaming.curation_stream import (  # noqa: E402
    run_curation_stream,
)
from bitcoin_datawarehouse_spark.streaming.jobs import (  # noqa: E402
    run_stream_to_completion,
)

SF_DIR = "/root/testdata/sf0.1"
N_TRIGGERS = 8


def main() -> int:
    spark = get_spark()
    scratch = Path(tempfile.mkdtemp(prefix="model_gate_stream_"))
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
        n = docs.count()
        # ntile by RANK of doc_id, not `doc_id // per` range filters:
        # range slices drop the trailing n % N_TRIGGERS docs (and
        # assume contiguous ids), silently overstating streamed input
        # in the probe JSON (r9 ADVICE)
        sliced = docs.selectExpr(
            "doc_id", "text", "lang AS source"
        ).withColumn(
            "_t",
            F.ntile(N_TRIGGERS).over(W.orderBy("doc_id")) - 1,
        )
        src = scratch / "in"
        streamed = 0
        for i in range(N_TRIGGERS):
            part = sliced.filter(F.col("_t") == i).drop("_t")
            streamed += part.count()
            part.coalesce(1).write.mode("overwrite").parquet(
                str(src / f"f{i}")
            )
        assert streamed == n, (streamed, n)

        idx = LshDedupIndex(Warehouse(spark, str(scratch / "wh")))
        save_quality_model(idx.wh, spark, SF_DIR, name="qmod")
        print(json.dumps({"step": "model_saved", "corpus": n}), flush=True)

        stream = (
            spark.readStream.schema(
                "doc_id long, text string, source string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = run_curation_stream(
            stream, idx, str(scratch / "ck"), quality_model="qmod"
        )
        run_stream_to_completion(q)
        progress = [
            json.loads(p) if isinstance(p, str) else p
            for p in q.recentProgress
        ]
        walls = [
            round(p["durationMs"]["triggerExecution"] / 1000, 1)
            for p in progress
            if p["numInputRows"] > 0
        ]
        curated = idx.wh.read(idx.schema, "curated_docs").count()
        print(
            json.dumps(
                {
                    "step": "stream",
                    "trigger_walls_s": walls,
                    "curated": curated,
                    "corpus": n,
                }
            ),
            flush=True,
        )
        return 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
