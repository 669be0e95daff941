"""Persisted-index ingest-loop scale probe (VERDICT r5 #6).

The sf-decade tables cover ONE-SHOT queries; the persisted index
loops (LshDedupIndex, IvfIndex) claim per-ingest cost ∝ batch while
the index grows.  This probe measures that claim: generate sf10
documents + embeddings (500 k docs / 200 k vectors), split each into
10 arrival batches by id decile, then

* ``LshDedupIndex.ingest_batch`` each document batch in sequence and
  record per-batch wall clock + index size after each;
* ``IvfIndex.build`` on the first vector batch, ``ingest`` the other
  nine, and after every ingest run the SAME bounded 50-query
  ``search`` — per-ingest wall AND per-search wall recorded while the
  index grows 10×.

The claim holds if per-batch ingest wall is roughly flat (the only
index-sized surface in the LSH decision plan is the band-bucket
equi-join; IVF ingest appends in bucket layout without touching
existing files) and search wall grows only with the probed lists.

Output: one JSON line per measurement, for SCALING.md.

Usage:  python tools/probe_index_loops.py [--factor N] (default 100)
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

SCRATCH = Path("/tmp/index_loops_probe")
N_BATCHES = 10


def emit(**kv) -> None:
    print(json.dumps(kv), flush=True)


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

    from bitcoin_datawarehouse_spark.operators.dedup import doc_shingle_sets
    from bitcoin_datawarehouse_spark.operators.embeddings_extra import _normed
    from bitcoin_datawarehouse_spark.operators.ivf_index import IvfIndex
    from bitcoin_datawarehouse_spark.operators.lsh_index import LshDedupIndex
    from bitcoin_datawarehouse_spark.operators.similarity import N_QUERIES
    from bitcoin_datawarehouse_spark.pipeline.catalog import Warehouse
    from bitcoin_datawarehouse_spark.session import get_spark

    spark = get_spark()

    # ---- split into N_BATCHES arrival batches by id decile -------------
    docs = spark.read.parquet(str(gen_dir / "documents.parquet"))
    n_docs = docs.count()
    emb_all = spark.read.parquet(str(gen_dir / "embeddings.parquet"))
    n_vecs = emb_all.count()
    emit(step="corpus", docs=n_docs, vectors=n_vecs)
    doc_cut = [round(i * n_docs / N_BATCHES) for i in range(N_BATCHES + 1)]
    vec_cut = [round(i * n_vecs / N_BATCHES) for i in range(N_BATCHES + 1)]
    for b in range(N_BATCHES):
        bd = SCRATCH / f"docs_b{b}"
        docs.filter(
            (F.col("doc_id") >= doc_cut[b]) & (F.col("doc_id") < doc_cut[b + 1])
        ).write.mode("overwrite").parquet(str(bd / "documents.parquet"))
        be = SCRATCH / f"vecs_b{b}"
        emb_all.filter(
            (F.col("vec_id") >= vec_cut[b]) & (F.col("vec_id") < vec_cut[b + 1])
        ).write.mode("overwrite").parquet(str(be / "embeddings.parquet"))
    emit(step="batches_staged", n=N_BATCHES)

    # ---- LSH dedup index loop ------------------------------------------
    lsh = LshDedupIndex(Warehouse(spark, str(SCRATCH / "lsh_wh")))
    for b in range(N_BATCHES):
        sets = doc_shingle_sets(spark, str(SCRATCH / f"docs_b{b}"))
        t0 = time.perf_counter()
        dec = lsh.ingest_batch(sets)
        n_dup = dec.filter(F.col("is_dup")).count()
        wall = time.perf_counter() - t0
        idx_docs = lsh._docsets().count()
        emit(step="lsh_ingest", batch=b, sec=round(wall, 1),
             batch_docs=doc_cut[b + 1] - doc_cut[b], dups=n_dup,
             index_docs=idx_docs)

    # ---- IVF index loop -------------------------------------------------
    ivf = IvfIndex(
        Warehouse(spark, str(SCRATCH / "ivf_wh")),
        schema="probe",
        name="e",
    )
    first = _normed(spark, str(SCRATCH / "vecs_b0")).select("vec_id", "e")
    queries = first.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    t0 = time.perf_counter()
    ivf.build(first)
    emit(step="ivf_build", batch=0, sec=round(time.perf_counter() - t0, 1),
         vectors=vec_cut[1])
    for b in range(1, N_BATCHES):
        batch = _normed(spark, str(SCRATCH / f"vecs_b{b}")).select(
            "vec_id", "e"
        )
        t0 = time.perf_counter()
        ivf.ingest(batch)
        t_ing = time.perf_counter() - t0
        # search() holds no tracked caches (r6 review fix), but keep
        # the probe honest against any future cache reuse between
        # identical per-iteration plans
        from bitcoin_datawarehouse_spark.functions.cachereg import (
            release_tracked_caches,
        )

        release_tracked_caches()
        t0 = time.perf_counter()
        n_res = ivf.search(queries).count()
        t_srch = time.perf_counter() - t0
        emit(step="ivf_ingest", batch=b, ingest_sec=round(t_ing, 1),
             search_sec=round(t_srch, 1), results=n_res,
             index_vectors=vec_cut[b + 1],
             lists_files=ivf._lists_file_count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
