"""Production index loops demo — persisted dedup + ANN serving.

The two Warehouse-persisted index families the engine runs at corpus
scale, exercised end to end on the smallest fixture:

1. **Near-dup dedup loop** (``operators/lsh_index.LshDedupIndex``):
   build the MinHash-LSH index from an initial corpus, then ingest
   the rest as arrival-ordered batches THROUGH Structured Streaming
   (``streaming/dedup_stream.run_lsh_dedup_stream``) — each
   micro-batch is decided against the persisted band/docset tables
   and folded in; the cumulative ledger is the audit surface.
2. **ANN serving loop** (``operators/ivf_index.IvfIndex``): build the
   bucketed inverted-file index, stream NEW vectors in
   (``streaming/ann_stream.run_ivf_ingest_stream``), and serve
   top-k searches from the persisted lists — the search plan bucket-
   prunes to the probed centroids and never re-shuffles the corpus.

Run: ``python examples/index_loops_demo.py [workdir]``
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bitcoin_datawarehouse_spark.operators.dedup import (  # noqa: E402
    doc_shingle_sets,
)
from bitcoin_datawarehouse_spark.operators.embeddings_extra import (  # noqa: E402
    _normed,
)
from bitcoin_datawarehouse_spark.operators.ivf_index import (  # noqa: E402
    IvfIndex,
)
from bitcoin_datawarehouse_spark.operators.lsh_index import (  # noqa: E402
    LshDedupIndex,
)
from bitcoin_datawarehouse_spark.operators.similarity import (  # noqa: E402
    N_QUERIES,
)
from bitcoin_datawarehouse_spark.pipeline import Warehouse  # noqa: E402
from bitcoin_datawarehouse_spark.session import get_spark  # noqa: E402
from bitcoin_datawarehouse_spark.streaming.ann_stream import (  # noqa: E402
    run_ivf_ingest_stream,
)
from bitcoin_datawarehouse_spark.streaming.dedup_stream import (  # noqa: E402
    run_lsh_dedup_stream,
)
from bitcoin_datawarehouse_spark.streaming.jobs import (  # noqa: E402
    run_stream_to_completion,
)
from bitcoin_datawarehouse_spark.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def run_dedup_loop(spark, workdir: Path) -> dict:
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n = docs.count()
    half = n // 2

    index = LshDedupIndex(Warehouse(spark, str(workdir / "dedup_wh")))
    # bootstrap: one batch ingest of the standing corpus
    index.ingest_batch(
        doc_shingle_sets(spark, SF_DIR).filter(F.col("doc_id") < half)
    )

    # arrival path: the rest of the corpus as a file stream, two
    # micro-batches, decided against the persisted index
    src = workdir / "docs_in"
    rest = docs.filter(F.col("doc_id") >= half)
    rest.filter(F.col("doc_id") < half + half // 2).coalesce(1).write.parquet(
        str(src / "f0")
    )
    rest.filter(F.col("doc_id") >= half + half // 2).coalesce(1).write.parquet(
        str(src / "f1")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    run_stream_to_completion(
        run_lsh_dedup_stream(stream, index, str(workdir / "dedup_ck"))
    )

    ledger = index.wh.read(
        index.schema, f"{index.decisions_table}_stream"
    )
    return {
        "docs_streamed": ledger.count(),
        "dups_found": ledger.filter(F.col("is_dup")).count(),
        "index_docs": index._docsets().count(),
    }


def run_ann_loop(spark, workdir: Path) -> dict:
    emb = _normed(spark, SF_DIR).select("vec_id", "e")
    n = emb.count()
    half = n // 2

    index = IvfIndex(Warehouse(spark, str(workdir / "ann_wh")))
    index.build(emb.filter(F.col("vec_id") < half))

    # new vectors arrive as a stream and become searchable, no rebuild
    src = workdir / "vec_in"
    emb.filter(F.col("vec_id") >= half).coalesce(1).write.parquet(
        str(src / "f0")
    )
    stream = spark.readStream.schema(
        "vec_id long, e array<double>"
    ).parquet(str(src / "*"))
    run_stream_to_completion(
        run_ivf_ingest_stream(stream, index, str(workdir / "ann_ck"))
    )

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    hits = index.search(queries).collect()

    # lifecycle close-out: take down a few served vectors (deletion-
    # vector tombstones) — they vanish from results with no rebuild
    victims = sorted({r["cand_id"] for r in hits})[:3]
    index.delete(victims)
    after = index.search(queries).collect()
    return {
        "indexed_vectors": index.wh.spark.table(index.lists_name).count(),
        "queries_served": len({r["query_id"] for r in hits}),
        "hits": len(hits),
        "streamed_vectors_in_results": sum(
            1 for r in hits if r["cand_id"] >= half
        ),
        "deleted": len(victims),
        "deleted_still_served": sum(
            1 for r in after if r["cand_id"] in set(victims)
        ),
    }


def run_ivfpq_loop(spark, workdir: Path) -> dict:
    """The compressed serving tier: same inverted-file layout, lists
    carry nibble-packed PQ codes instead of raw vectors — search
    never reads an embedding array.  Reports the measured on-disk
    list-storage ratio vs the vec-payload index built above."""
    import glob
    import os

    emb = _normed(spark, SF_DIR).select("vec_id", "e")
    index = IvfIndex(
        Warehouse(spark, str(workdir / "pq_wh")), payload="pq"
    )
    index.build(emb)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    hits = index.search(queries).collect()

    wdir = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix(
        "file:"
    )

    def dir_bytes(table_name: str) -> int:
        return sum(
            os.path.getsize(f)
            for f in glob.glob(f"{wdir}/{table_name.lower()}/*.parquet")
        )

    def payload_bytes(table_name: str, col: str) -> int:
        # compressed bytes of the payload COLUMN only, summed from
        # parquet row-group metadata — per-file footer floors (~0.5 KB
        # each across hundreds of tiny demo-scale files) would
        # otherwise drown the 4-byte-per-vector code payload
        import pyarrow.parquet as papq

        total = 0
        for f in glob.glob(
            f"{wdir}/{table_name.lower()}/**/*.parquet", recursive=True
        ):
            md = papq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema.split(".")[0] == col:
                        total += c.total_compressed_size
        return total

    vec_lists = IvfIndex(Warehouse(spark, str(workdir / "ann_wh")))
    return {
        "queries_served": len({r["query_id"] for r in hits}),
        "hits": len(hits),
        "pq_list_bytes": dir_bytes(index.lists_name),
        "vec_list_bytes": dir_bytes(vec_lists.lists_name),
        "pq_payload_bytes": payload_bytes(index.lists_name, "pq_code"),
        "vec_payload_bytes": payload_bytes(vec_lists.lists_name, "e"),
    }


def main(workdir: str | None = None) -> dict:
    work = Path(workdir or tempfile.mkdtemp(prefix="index_loops_"))
    spark = get_spark("index-loops-demo", cpus=8, shuffle_partitions=8)
    out = {
        "dedup": run_dedup_loop(spark, work),
        "ann": run_ann_loop(spark, work),
        "ivfpq": run_ivfpq_loop(spark, work),
    }
    print(out)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
