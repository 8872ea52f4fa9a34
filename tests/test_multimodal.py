"""Multimodal plumbing: fake-decode metadata, resize, frame sampling,
feature extraction — Spark-side schemas/batch shapes are real, codec
bodies stubbed (no PIL/ffmpeg in this environment)."""

import numpy as np
import pytest

from camelot_spark.tdp import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "word%d " % i * (10 + i), "en", "web", 0) for i in range(6)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")


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
