"""One-command proof of the REAL multimodal codec path (r10 VERDICT
item 8 stretch): in any environment that HAS PIL installed, this
drives the import-gated decode/resize kernel end to end over
constructed PNGs — the same check the skip-marked pytest
(tests/test_sketches_multimodal.py) runs, runnable standalone so a
CI box with imaging libs proves the path in one command.

In this container (no imaging libs, installs forbidden) it reports
the NotImplementedError fallback and exits 0 — the honest-stub
contract, not a failure.

Usage: python tools/probe_multimodal_pil.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    from bitcoin_datawarehouse_spark.operators.multimodal import (
        RESIZE_DIM,
        resize_image_payload,
        resize_images_frame,
    )

    try:
        import io

        from PIL import Image
    except ImportError:
        # the stub must refuse loudly — prove the gate, then report
        try:
            resize_image_payload(b"\x89PNG", 4, 4)
        except NotImplementedError:
            print(
                json.dumps(
                    {
                        "pil": False,
                        "gate": "NotImplementedError raised as contracted",
                        "note": "install pillow to exercise the real codec",
                    }
                )
            )
            return 0
        print(json.dumps({"pil": False, "gate": "BROKEN: no error raised"}))
        return 1

    # PIL available: real decode, scalar then through the Spark kernel
    def png(color, size=(8, 6)) -> bytes:
        buf = io.BytesIO()
        Image.new("RGB", size, color).save(buf, format="PNG")
        return buf.getvalue()

    raw = png((255, 0, 0))
    out = resize_image_payload(raw, 4, 4)
    assert len(out) == 4 * 4 * 3, len(out)
    assert out[:3] == b"\xff\x00\x00", out[:3]

    from bitcoin_datawarehouse_spark.session import get_spark

    spark = get_spark("pil-probe")
    media = spark.createDataFrame(
        [(1, png((255, 0, 0))), (2, png((0, 0, 255), (16, 16)))],
        "doc_id long, payload binary",
    )
    rows = {
        int(r["doc_id"]): r
        for r in resize_images_frame(media).collect()
    }
    assert len(rows) == 2
    for r in rows.values():
        assert int(r["out_w"]) == RESIZE_DIM and int(r["out_h"]) == RESIZE_DIM
        assert len(bytes(r["resized"])) == RESIZE_DIM * RESIZE_DIM * 3
    assert bytes(rows[1]["resized"])[:3] == b"\xff\x00\x00"
    assert bytes(rows[2]["resized"])[:3] == b"\x00\x00\xff"
    print(
        json.dumps(
            {
                "pil": True,
                "scalar_resize": "ok",
                "spark_kernel": "ok",
                "docs": 2,
                "out_dim": RESIZE_DIM,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
