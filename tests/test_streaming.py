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


def test_windowed_metrics_close_on_watermark_and_drop_late(spark, tmp_path):
    """Watermark + windowed agg, append mode: a window emits exactly
    once when the watermark passes its end, and an event later than the
    watermark is dropped instead of mutating an already-emitted row —
    the bounded-state late-data contract."""
    import datetime

    from camelot_spark.streaming import windowed_ingest_metrics

    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    schema = "doc_id string, event_ts timestamp, n_spans long"
    t = datetime.datetime(2024, 5, 1, 10, 0, 0)

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(inp)

    def drain():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (windowed_ingest_metrics(stream)
             .writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .format("parquet").option("path", outp).start())
        q.awaitTermination(120)
        try:
            return spark.read.parquet(outp).collect()
        except Exception:
            return []

    def sec(s):
        return t + datetime.timedelta(seconds=s)

    # batch 1: events in windows [10:00,10:01) and [10:01,10:02);
    # watermark after the drain = 10:01:10 - 2min -> nothing closed yet
    write([("a", sec(0), 3), ("b", sec(30), 5), ("c", sec(70), 7)])
    assert drain() == []

    # batch 2: an event at 10:05 pushes the watermark to 10:03 -> both
    # earlier windows close and emit exactly once
    write([("d", sec(300), 2)])
    out = {r["window_start"]: r for r in drain()}
    assert {w.minute for w in out} == {0, 1}
    first = out[t]
    assert (first["n_docs"], first["n_spans"]) == (2, 8)
    assert (out[sec(60)]["n_docs"], out[sec(60)]["n_spans"]) == (1, 7)

    # batch 3: a LATE event inside the already-closed 10:00 window is
    # dropped — no new row, no mutation of the emitted one
    write([("late", sec(45), 100)])
    again = {r["window_start"]: r for r in drain()}
    assert set(again) == set(out)
    assert (again[t]["n_docs"], again[t]["n_spans"]) == (2, 8)
