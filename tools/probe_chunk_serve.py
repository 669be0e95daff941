"""Chunk-retrieval SERVE-path decade probe (r9 VERDICT item 5).

The registered gate pays the index BUILD inside its plan (the fixture
has nowhere to amortize it); production builds once and serves many
queries.  This probe separates the two: build the persisted chunk IVF
index ONCE per fixture, then time the SERVE half
(``_chunk_retrieval_serve``: bucket-pruned search + the two-window doc
reduction) at several nprobe settings — the claim under test is that
serve cost scales with PROBED LISTS, not with the corpus (the
bucketed-index contract), with the build amortized away.

Decade-probe discipline (CLAUDE.md): ONE warmed session, noop-sink
end-to-end runs, TWO timed runs per (fixture, nprobe), tracked caches
released between runs; the query workload is localCheckpoint-pinned so
search timings never re-pay the featurizer.

Prints one JSON line per step:

  {"dir": ..., "step": "build", "chunks": N, "s": t}
  {"dir": ..., "step": "serve", "nprobe": p, "rows": N, "runs_s": [a, b]}

Usage: python tools/probe_chunk_serve.py DIR [DIR ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bitcoin_datawarehouse_spark.functions.cachereg import (  # noqa: E402
    release_tracked_caches,
)
from bitcoin_datawarehouse_spark.operators.chunk_retrieval import (  # noqa: E402
    _build_chunk_index,
    _chunk_retrieval_serve,
)
from bitcoin_datawarehouse_spark.registry import load_all_operators  # noqa: E402
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402

NPROBES = (1, 2, 4, 8)


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: probe_chunk_serve.py DIR [DIR ...]")
        return 2
    dirs = sys.argv[1:]
    load_all_operators()
    spark = get_spark("chunk-serve-probe", shuffle_partitions=96)

    for d in dirs:
        t0 = time.time()
        idx, emb, queries = _build_chunk_index(spark, d)
        n_chunks = emb.count()
        # pin the workload: serve timings must not re-pay the
        # featurizer once the tracked emb cache is released
        queries = queries.localCheckpoint()
        build_s = round(time.time() - t0, 1)
        release_tracked_caches()
        print(
            json.dumps(
                {"dir": d, "step": "build", "chunks": n_chunks, "s": build_s}
            ),
            flush=True,
        )

        # warm the serve path once (codegen/JIT)
        idx.nprobe = NPROBES[0]
        _chunk_retrieval_serve(idx, queries).write.format("noop").mode(
            "overwrite"
        ).save()
        release_tracked_caches()

        for p in NPROBES:
            idx.nprobe = p
            runs = []
            for _ in range(2):
                t0 = time.time()
                _chunk_retrieval_serve(idx, queries).write.format(
                    "noop"
                ).mode("overwrite").save()
                runs.append(round(time.time() - t0, 2))
                release_tracked_caches()
            rows = _chunk_retrieval_serve(idx, queries).count()
            release_tracked_caches()
            print(
                json.dumps(
                    {
                        "dir": d,
                        "step": "serve",
                        "nprobe": p,
                        "rows": rows,
                        "runs_s": runs,
                    }
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
