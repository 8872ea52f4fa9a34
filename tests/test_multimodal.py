"""Multimodal plumbing: decode-seam routing, resize, frame sampling,
feature extraction — Spark-side schemas/batch shapes are real; the
codec seam wires PIL when installed and falls back to the
deterministic fake here (no PIL/ffmpeg in this environment)."""

import numpy as np
import pytest

from camelot_spark.tdp import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "word%d " % i * (10 + i), "en", "web", 0) for i in range(6)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_decode_image_routing():
    # non-image payloads never reach a codec: ValueError routes them to
    # the deterministic fake in the kernels
    with pytest.raises(ValueError):
        mm.decode_image(b"plain text payload")
    png_header_only = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8
    if mm._PILImage is None:
        # real container, no codec installed: loud, not silently faked
        with pytest.raises(NotImplementedError):
            mm.decode_image(png_header_only)


@pytest.mark.skipif(mm._PILImage is None, reason="PIL not installed (sandbox)")
def test_decode_image_real_roundtrip():
    import io

    img = mm._PILImage.new("L", (5, 3), color=7)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    arr = mm.decode_image(buf.getvalue())
    assert arr.shape == (3, 5) and (arr == 7).all()


def test_fake_route_runs_regardless_of_codec(docs):
    """Synthetic payloads are not PNG/JPEG containers, so the fake-decode
    metadata is produced whether or not a codec library is installed —
    installing PIL must not change these values."""
    r = {x["doc_id"]: x for x in mm.media_metadata(docs).collect()}
    n = len("word0 " * 10)
    assert r["0"]["n_bytes"] == n
    assert r["0"]["fake_width"] == (n % 640) + 1
    assert r["0"]["fake_height"] == ((n * 7) % 480) + 1


def test_resize_media_shapes(docs):
    out = mm.resize_media(docs, width=16, height=8).collect()
    assert len(out) == 6
    for r in out:
        assert (r["width"], r["height"]) == (16, 8)
        px = np.frombuffer(r["frame" if False else "pixels"], dtype=np.uint8)
        assert px.size == 16 * 8


def test_resize_deterministic(docs):
    a = {r["doc_id"]: r["pixels"] for r in mm.resize_media(docs).collect()}
    b = {r["doc_id"]: r["pixels"] for r in mm.resize_media(docs).collect()}
    assert a == b


def test_frame_sample_fanout(docs):
    out = mm.frame_sample(docs, frame_bytes=16, every_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(r["frame"]) == 16
    # doc 0: text len = 6*10=60 bytes -> 3 frames -> idx 0, 2 kept
    assert sorted(r["frame_idx"] for r in by_doc["0"]) == [0, 2]


def test_media_features_histogram(docs, spark):
    out = {r["doc_id"]: r["features"] for r in mm.media_features(docs, dim=4).collect()}
    assert all(len(v) == 4 for v in out.values())
    # histogram sums to the character count of the text
    row = docs.where("doc_id = 1").collect()[0]
    assert sum(out["1"]) == len(row["text"])
