"""Error-bound tests for sketch aggregates + batch-shape tests for
the multimodal kernels (the rows-only gate entries get their real
verification here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.registry import QUERIES
from bitcoin_datawarehouse_spark.tables import load_table
from tests.conftest import SF_ORACLE, SF_SMALL


def test_hll_distinct_within_rsd(spark):
    approx = {
        r["order_month"]: r["approx_customers"]
        for r in QUERIES["sketch_hll_distinct_per_group"](
            spark, SF_ORACLE
        ).collect()
    }
    exact = {
        r["order_month"]: r["n"]
        for r in (
            load_table(spark, SF_ORACLE, "orders")
            .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
            .agg(F.countDistinct("o_custkey").alias("n"))
            .collect()
        )
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(5, 0.1 * n), (k, approx[k], n)


def test_approx_percentiles_close_to_exact(spark):
    approx = {
        r["l_returnflag"]: (r["approx_p50"], r["approx_p90"], r["approx_p99"])
        for r in QUERIES["sketch_approx_percentiles"](
            spark, SF_ORACLE
        ).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in QUERIES["agg_percentiles"](spark, SF_ORACLE).collect()
    }
    for flag, (p50, p90, p99) in exact.items():
        a50, a90, a99 = approx[flag]
        for a, e in ((a50, p50), (a90, p90), (a99, p99)):
            assert abs(a - e) / e < 0.01, (flag, a, e)


def test_multimodal_resize_shape(spark):
    rows = QUERIES["multimodal_resize"](spark, SF_SMALL).collect()
    assert len(rows) == 500
    assert all(len(r["resized"]) == r["out_w"] * r["out_h"] for r in rows)
    # deterministic: same payload → same bytes across runs
    again = QUERIES["multimodal_resize"](spark, SF_SMALL).collect()
    assert {r["doc_id"]: bytes(r["resized"]) for r in rows} == {
        r["doc_id"]: bytes(r["resized"]) for r in again
    }


def test_multimodal_frame_sample_shape(spark):
    df = QUERIES["multimodal_frame_sample"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) == 500 * 4  # one row per sampled frame
    assert all(len(r["frame"]) == 32 for r in rows)
    per_doc = (
        df.groupBy("doc_id").count().agg(F.min("count"), F.max("count")).first()
    )
    assert per_doc[0] == per_doc[1] == 4


def test_count_min_estimates_bounded(spark):
    """CMS contract: exact ≤ estimate ≤ exact + ε·N where N is the
    total token stream length (seed-pinned, so deterministic)."""
    from bitcoin_datawarehouse_spark.operators.sketches import CMS_EPS
    from bitcoin_datawarehouse_spark.registry import QUERIES

    from .conftest import SF_SMALL

    rows = QUERIES["sketch_count_min_token_counts"](
        spark, SF_SMALL
    ).collect()
    assert rows
    # N = total stream length; the histogram head covers the fixture's
    # whole tiny vocabulary, so summing exact counts reproduces it
    n_stream = sum(r.exact_count for r in rows)
    for r in rows:
        assert r.exact_count <= r.cms_count, r
        assert r.cms_count <= r.exact_count + CMS_EPS * n_stream, r


def test_real_image_resize_when_pil_available(spark):
    """The PIL-gated real codec: constructed PNGs decode + resize to
    w*h*3 RGB bytes through the same Spark plumbing as the stub
    kernel.  Skips where PIL is absent (this container); the gate
    raises NotImplementedError there, which the companion test pins."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from bitcoin_datawarehouse_spark.operators.multimodal import (
        RESIZE_DIM,
        resize_images_frame,
    )

    rows = []
    for doc_id, color in [(1, (255, 0, 0)), (2, (0, 128, 255))]:
        buf = io.BytesIO()
        Image.new("RGB", (31, 17), color).save(buf, format="PNG")
        rows.append((doc_id, bytearray(buf.getvalue())))
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in resize_images_frame(media).collect()}
    for doc_id, color in [(1, (255, 0, 0)), (2, (0, 128, 255))]:
        r = got[doc_id]
        assert r["out_w"] == r["out_h"] == RESIZE_DIM
        assert len(r["resized"]) == RESIZE_DIM * RESIZE_DIM * 3
        # a solid-color input resizes to the same solid color
        assert bytes(r["resized"][:3]) == bytes(color)


def test_real_image_resize_gate_raises_without_pil():
    """When PIL is missing the gate must fail loudly (marked stub
    discipline), never silently fall back."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — gate open")
    except ImportError:
        pass
    from bitcoin_datawarehouse_spark.operators.multimodal import (
        resize_image_payload,
    )

    with pytest.raises(NotImplementedError, match="PIL"):
        resize_image_payload(b"\x89PNG\r\n\x1a\n", 4, 4)
