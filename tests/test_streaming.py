"""Structured Streaming extraction: backlog drain, checkpointed
exactly-once resume, golden equality through the streaming path."""

from camelot_spark import fixtures as fx
from camelot_spark.schema import DOCUMENTS_SCHEMA
from camelot_spark.streaming import start_extraction_stream


def _write_docs(spark, builders, path):
    rows = [(b.doc_id, [tuple(s.values()) for s in b.spans]) for b in builders]
    spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_extraction_and_resume(spark, tmp_path):
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    b1 = fx.doc_health("st-1")
    _write_docs(spark, [b1], inp)

    q = start_extraction_stream(spark, inp, outp, ckpt, flavor="stream", fail_fast=True)
    q.awaitTermination(120)
    first = spark.read.parquet(outp)
    assert first.count() == 1
    row = first.collect()[0]
    got = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]]
    assert got == b1.golden()

    # drop a second file: only the new doc flows through (checkpoint)
    b2 = fx.doc_twotables("st-2")
    _write_docs(spark, [b2], inp)
    q = start_extraction_stream(spark, inp, outp, ckpt, flavor="stream", fail_fast=True)
    q.awaitTermination(120)
    out = spark.read.parquet(outp)
    assert out.count() == 2

    # no new files: exactly-once, nothing re-emitted
    q = start_extraction_stream(spark, inp, outp, ckpt, flavor="stream", fail_fast=True)
    q.awaitTermination(120)
    assert spark.read.parquet(outp).count() == 2


def test_streaming_cross_batch_dedup(spark, tmp_path):
    """At-least-once sources re-deliver documents; with dedup_within the
    stateful dropDuplicatesWithinWatermark keeps one extraction per
    doc_id across micro-batches AND across checkpointed restarts."""
    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    b1, b2 = fx.doc_health("dd-1"), fx.doc_twotables("dd-2")
    _write_docs(spark, [b1, b2], inp)
    q = start_extraction_stream(spark, inp, outp, ckpt, flavor="stream",
                                fail_fast=True, dedup_within="1 hour")
    q.awaitTermination(120)
    assert spark.read.parquet(outp).count() == 2

    # re-deliver dd-2 (duplicate) alongside a genuinely new doc: the
    # duplicate is dropped by state restored from the checkpoint
    b3 = fx.doc_health("dd-3")
    _write_docs(spark, [b2, b3], inp)
    q = start_extraction_stream(spark, inp, outp, ckpt, flavor="stream",
                                fail_fast=True, dedup_within="1 hour")
    q.awaitTermination(120)
    out = spark.read.parquet(outp)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == ["dd-1", "dd-2", "dd-3"]  # dd-2 extracted exactly once
