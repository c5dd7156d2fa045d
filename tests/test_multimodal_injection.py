"""The README's PIL injection recipe, run verbatim when Pillow is
importable (it does not ship in this container -> skipped here; a user
host with `pip install pillow` runs it for real). Proves the
decoder-injection contract against a REAL compressed codec, not just
the PPM reference implementation."""

from __future__ import annotations

import io

import pytest

from pagerank_mapreduce_implementation_spark.operators import multimodal as mm

PIL = pytest.importorskip("PIL.Image", reason="Pillow not installed")


def pil_decoder(b: bytes) -> tuple[int, int, str]:
    img = PIL.open(io.BytesIO(b))
    return img.width, img.height, (img.format or "unknown").lower()


def pil_resizer(b: bytes, w: int, h: int) -> bytes:
    img = PIL.open(io.BytesIO(b))
    img.thumbnail((w, h))
    out = io.BytesIO()
    img.save(out, format=img.format or "PNG")
    return out.getvalue()


def _png_blobs(spark):
    def png(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
        img = PIL.new("RGB", (w, h), rgb)
        out = io.BytesIO()
        img.save(out, format="PNG")
        return out.getvalue()

    rows = [(1, png(32, 16, (255, 0, 0))), (2, png(8, 8, (0, 0, 255)))]
    return spark.createDataFrame(rows, mm.BLOB_SCHEMA)


def test_pil_decode_image(spark):
    got = {r["doc_id"]: r for r in mm.decode_image(_png_blobs(spark), decoder=pil_decoder).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) == (32, 16, "png")
    assert (got[2]["width"], got[2]["height"]) == (8, 8)


def test_pil_resize_image(spark):
    small = mm.resize_image(_png_blobs(spark), 8, 8, resizer=pil_resizer)
    meta = {r["doc_id"]: r for r in mm.decode_image(small, decoder=pil_decoder).collect()}
    assert meta[1]["width"] <= 8 and meta[1]["height"] <= 8
    assert meta[1]["format"] == "png"
