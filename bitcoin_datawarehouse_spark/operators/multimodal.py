"""Multimodal-column plumbing (SURVEY.md §2.12).

Treats media as opaque ``binary`` payloads with typed metadata and
runs decode/feature-extraction as Arrow-batched Pandas functions over
``mapInPandas`` — the shape a 100 TB image/audio pipeline needs:

* payloads never pass through Python row-at-a-time — Arrow moves
  whole columnar batches;
* per-batch output schema is declared up front so Catalyst can plan
  downstream operators;
* the actual codec call is isolated in ``decode_payload`` so the
  container's missing image/audio libs are a one-line swap
  (deterministic fake today, PIL/librosa in production — clearly
  marked below).

The ``documents`` fixture stands in for a media table: ``text`` bytes
are the payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bitcoin_datawarehouse_spark.registry import query
from bitcoin_datawarehouse_spark.tables import load_table

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_payload(payload: bytes) -> np.ndarray:
    """STUB codec. Production would be e.g. PIL.Image.open / soundfile.

    The container has no media libraries, so this returns a
    deterministic fake 'decode': the raw bytes as a uint8 array.  The
    surrounding Spark plumbing (binary column → Arrow batch → feature
    vector) is real and tested.
    """
    return np.frombuffer(payload, dtype=np.uint8)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: payload → FEATURE_DIM byte-histogram features.

    Runs once per Arrow batch (not per row); everything inside is
    vectorized numpy.
    """
    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            arr = decode_payload(payload)
            # deterministic fake featurization: coarse byte histogram,
            # normalized — stands in for an embedding model forward pass
            hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
            total = max(int(hist.sum()), 1)
            feats.append((hist / total).tolist())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "media_type": pdf["media_type"],
                "features": feats,
            }
        )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents re-shaped as a media table: (doc_id, payload binary,
    media_type, props struct)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.concat(F.lit("text/plain;src="), F.col("source")).alias("media_type"),
        F.struct(
            F.col("n_chars").alias("declared_len"), F.col("lang").alias("lang")
        ).alias("props"),
    )


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text/plain;src=' || source AS media_type
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads (the SQL-checkable half of
    the multimodal path — byte length, media type)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        "media_type",
    )


# DuckDB has no blob subscripting, so the oracle walks the hex string
# of the UTF-8 payload: byte i of the blob is hex chars (2i-1, 2i).
_SQL_BYTES = """bytes AS (
      SELECT d.doc_id, g.i,
             (instr('0123456789abcdef', lower(substr(d.h, 2*g.i-1, 1)))-1)*16
           + (instr('0123456789abcdef', lower(substr(d.h, 2*g.i,   1)))-1)
             AS byteval
      FROM (SELECT doc_id, hex(encode(text)) AS h FROM documents) d,
      LATERAL (SELECT unnest(generate_series(1, length(d.h)//2)) AS i) g
    )"""


@query(
    "multimodal_feature_extract",
    oracle=f"""
    WITH {_SQL_BYTES},
    meta AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             'text/plain;src=' || source AS media_type
      FROM documents
    ),
    dims AS (SELECT unnest(generate_series(0, {FEATURE_DIM - 1})) AS dim),
    counts AS (
      SELECT doc_id, byteval // (256 // {FEATURE_DIM}) AS dim,
             COUNT(*) AS cnt
      FROM bytes GROUP BY 1, 2
    )
    SELECT m.doc_id, m.n_bytes, m.media_type, CAST(d.dim AS INT) AS dim,
           CAST(COALESCE(c.cnt, 0) AS DOUBLE)
             / CAST(greatest(m.n_bytes, 1) AS DOUBLE) AS value
    FROM meta m
    CROSS JOIN dims d
    LEFT JOIN counts c ON c.doc_id = m.doc_id AND c.dim = d.dim
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches).

    At scale: partition by a uniform key (doc_id hash), size
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so one batch of
    payloads fits executor memory, and the GPU/codec stage slots in at
    ``decode_payload`` without touching the plan.

    Output is long-form ``(doc_id, n_bytes, media_type, dim, value)``
    — scalar columns only, so any downstream canonicalizer (including
    the driver's pandas row sort) can order the rows; an
    ``array<double>`` column is unsortable there.

    The stub featurizer (byte histogram over ``FEATURE_DIM`` equal
    bins) is deliberately SQL-expressible, so the whole Arrow path —
    encode → decode → histogram → normalize — is hash-checked against
    a DuckDB oracle; a production model swap would drop the oracle and
    fall back to the rows-only gate.
    """
    m = media_table(spark, sf_dir).select("doc_id", "payload", "media_type")
    # fixture parquet is one input split: spread the CPU-heavy per-row
    # decode across all cores before the Arrow kernel
    m = m.repartition(spark.sparkContext.defaultParallelism)
    feats = m.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        "n_bytes",
        "media_type",
        F.posexplode("features").alias("dim", "value"),
    )


# ---------------------------------------------------------------------------
# resize + frame-sample stubs (the remaining media kernels)
# ---------------------------------------------------------------------------

RESIZE_DIM = 16

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_payload(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize. Production: PIL Image.resize / cv2.resize.

    Deterministic fake: nearest-neighbor downsample of the byte
    stream to w*h bytes — preserves the real kernel's contract
    (binary in, fixed-size binary out) so the Spark plumbing and
    output schema are exactly what a real codec produces.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return bytes(w * h)
    idx = (np.arange(w * h) * arr.size) // (w * h)
    return arr[idx].tobytes()


def resize_image_payload(payload: bytes, w: int, h: int) -> bytes:
    """REAL image resize behind an availability gate: decodes the
    payload with PIL (a public dependency, import-gated because this
    container ships no imaging libs), bilinear-resizes to (w, h), and
    returns the raw RGB bytes (w·h·3).  Raises ``NotImplementedError``
    when PIL is absent — callers fall back to :func:`resize_payload`,
    the deterministic byte stub the registered digest-twin queries pin
    (fixture payloads are synthetic bytes, not decodable images, so
    the stub remains the gate surface either way; the PIL path is
    exercised by a skip-if-unavailable pytest on constructed PNGs).
    """
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "real image resize needs PIL; use the resize_payload stub"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return img.resize((w, h), Image.BILINEAR).tobytes()


def resize_images_frame(
    media: DataFrame, w: int = RESIZE_DIM, h: int = RESIZE_DIM
) -> DataFrame:
    """(doc_id, resized, out_w, out_h) over REAL image payloads via
    the PIL-gated kernel — identical Spark plumbing (schema, Arrow
    batching, partitioning) to :func:`multimodal_resize`; only the
    per-payload codec differs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": [
                        resize_image_payload(bytes(p), w, h)
                        for p in pdf["payload"]
                    ],
                    "out_w": np.full(len(pdf), w, dtype=np.int32),
                    "out_h": np.full(len(pdf), h, dtype=np.int32),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        kernel, RESIZE_SCHEMA
    )


def sample_frames(payload: bytes, n_frames: int, frame_size: int) -> list[bytes]:
    """STUB frame sampler. Production: pyav / ffmpeg keyframe pull.

    Deterministic fake: n evenly-spaced fixed-size byte windows —
    the real sampler's shape (one row per sampled frame).
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    out = []
    for i in range(n_frames):
        start = (i * max(arr.size - frame_size, 0)) // max(n_frames - 1, 1)
        chunk = arr[start : start + frame_size]
        out.append(chunk.tobytes().ljust(frame_size, b"\0"))
    return out


@query("multimodal_resize")  # rows-only: binary kernel, no SQL analog
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch resize over mapInPandas: every payload → RESIZE_DIM²
    bytes.  One Arrow batch per task; the codec swap point is
    :func:`resize_payload`."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": [
                        resize_payload(p, RESIZE_DIM, RESIZE_DIM)
                        for p in pdf["payload"]
                    ],
                    "out_w": RESIZE_DIM,
                    "out_h": RESIZE_DIM,
                }
            )

    m = media_table(spark, sf_dir).select("doc_id", "payload")
    # one-split fixture input: spread the per-row kernel across cores
    m = m.repartition(spark.sparkContext.defaultParallelism)
    return m.mapInPandas(kernel, schema=RESIZE_SCHEMA)


@query("multimodal_frame_sample")  # rows-only: binary kernel, no SQL analog
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over mapInPandas: every payload → 4 fixed-size
    'frames' (one output row per frame — the explode happens inside
    the Arrow kernel, not as a separate shuffle)."""
    n_frames, frame_size = 4, 32

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                for i, fr in enumerate(sample_frames(p, n_frames, frame_size)):
                    ids.append(did)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    m = media_table(spark, sf_dir).select("doc_id", "payload")
    # one-split fixture input: spread the per-row kernel across cores
    m = m.repartition(spark.sparkContext.defaultParallelism)
    return m.mapInPandas(kernel, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Byte-exact digests of the binary kernels (hash-gated companions)
# ---------------------------------------------------------------------------
# The resize / frame-sample queries return ``binary`` columns — the
# genuine API — which the driver's rows-only canonicalizer can count
# but not value-hash.  These companions prove the kernels byte-exact:
# same Arrow path, output reduced to the hex encoding of the bytes, and
# a DuckDB oracle that recomputes the identical byte streams from the
# hex string of the payload (DuckDB md5 is VARCHAR-only, so hex — which
# both engines emit uppercase — is the comparable digest).


@query(
    "multimodal_resize_digest",
    oracle=f"""
    WITH {_SQL_BYTES},
    src AS (
      SELECT doc_id, octet_length(encode(text)) AS sz FROM documents
    ),
    out_idx AS (
      SELECT unnest(generate_series(0, {RESIZE_DIM * RESIZE_DIM - 1})) AS j
    ),
    picked AS (
      SELECT s.doc_id, o.j,
             CASE WHEN s.sz = 0 THEN 0
                  ELSE (SELECT b.byteval FROM bytes b
                        WHERE b.doc_id = s.doc_id
                          AND b.i = (o.j * s.sz) // {RESIZE_DIM * RESIZE_DIM} + 1)
             END AS byteval
      FROM src s CROSS JOIN out_idx o
    )
    SELECT doc_id,
           string_agg(upper(lpad(hex(byteval), 2, '0')), '' ORDER BY j)
             AS resized_hex,
           CAST({RESIZE_DIM} AS INT) AS out_w,
           CAST({RESIZE_DIM} AS INT) AS out_h
    FROM picked GROUP BY doc_id
    """,
)
def multimodal_resize_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex digest of :func:`multimodal_resize` output — byte-exact
    hash gate over the nearest-neighbor downsample kernel."""
    return multimodal_resize(spark, sf_dir).select(
        "doc_id",
        F.hex("resized").alias("resized_hex"),
        "out_w",
        "out_h",
    )


@query(
    "multimodal_frame_digest",
    oracle=f"""
    WITH {_SQL_BYTES},
    src AS (
      SELECT doc_id, octet_length(encode(text)) AS sz FROM documents
    ),
    frames AS (SELECT unnest(generate_series(0, 3)) AS frame_idx),
    offs AS (SELECT unnest(generate_series(0, 31)) AS o),
    cells AS (
      SELECT s.doc_id, f.frame_idx, ofs.o,
             (f.frame_idx * greatest(s.sz - 32, 0)) // 3 + ofs.o + 1 AS pos,
             s.sz
      FROM src s CROSS JOIN frames f CROSS JOIN offs ofs
    )
    SELECT c.doc_id, CAST(c.frame_idx AS INT) AS frame_idx,
           string_agg(
             upper(lpad(hex(CASE WHEN c.pos <= c.sz
                                 THEN (SELECT b.byteval FROM bytes b
                                       WHERE b.doc_id = c.doc_id
                                         AND b.i = c.pos)
                                 ELSE 0 END), 2, '0')),
             '' ORDER BY c.o) AS frame_hex
    FROM cells c GROUP BY c.doc_id, c.frame_idx
    """,
)
def multimodal_frame_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex digest of :func:`multimodal_frame_sample` output — byte-
    exact hash gate over the evenly-spaced frame-window kernel."""
    return multimodal_frame_sample(spark, sf_dir).select(
        "doc_id",
        "frame_idx",
        F.hex("frame").alias("frame_hex"),
    )
