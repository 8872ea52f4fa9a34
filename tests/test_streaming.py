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


def _write_parts(spark, rows, path):
    spark.createDataFrame(
        rows, "doc_id string, part_idx int, n_parts int, payload string"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_assembly(spark, inp, outp, ckpt):
    from camelot_spark.streaming import assemble_multipart_stream

    parts = (spark.readStream
             .schema("doc_id string, part_idx int, n_parts int, payload string")
             .parquet(inp))
    q = (assemble_multipart_stream(parts)
         .writeStream.option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True)
         .format("parquet").option("path", outp).start())
    q.awaitTermination(120)


def test_multipart_assembly_across_batches(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): parts arrive
    out of order across micro-batches AND checkpointed restarts; a doc
    emits exactly once, fully assembled in part order, with re-delivered
    parts dropped. Incomplete docs emit nothing (state persists in the
    checkpoint's state store)."""
    import glob
    import os

    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # batch 1: doc A partial (2 of 3, out of order), doc B complete
    _write_parts(spark, [("A", 2, 3, "c"), ("A", 0, 3, "a"),
                         ("B", 0, 2, "x"), ("B", 1, 2, "y")], inp)
    _run_assembly(spark, inp, outp, ckpt)
    out1 = ({r["doc_id"]: r for r in spark.read.parquet(outp).collect()}
            if glob.glob(os.path.join(outp, "*.parquet")) else {})
    assert set(out1) == {"B"}
    assert out1["B"]["text"] == "xy" and out1["B"]["complete"] == 1

    # batch 2 (restarted query, same checkpoint): A's missing part plus
    # a re-delivered duplicate of part 0
    _write_parts(spark, [("A", 1, 3, "b"), ("A", 0, 3, "a-dup")], inp)
    _run_assembly(spark, inp, outp, ckpt)
    out2 = {r["doc_id"]: r for r in spark.read.parquet(outp).collect()}
    assert set(out2) == {"A", "B"}
    assert out2["A"]["text"] == "abc"          # part order, first delivery wins
    assert out2["A"]["n_received"] == 3 and out2["A"]["complete"] == 1

    # batch 3: nothing new -> nothing re-emitted (exactly-once)
    _write_parts(spark, [("C", 0, 2, "only-half")], inp)
    _run_assembly(spark, inp, outp, ckpt)
    out3 = spark.read.parquet(outp)
    assert out3.count() == 2 and set(
        r["doc_id"] for r in out3.collect()) == {"A", "B"}


def test_multipart_assembly_state_machine_unit():
    """The state-transition logic, driven directly with a stub
    GroupState: accumulate -> update; complete -> emit + remove;
    timeout -> partial emit (complete=0) + remove."""
    import pandas as pd

    from camelot_spark.streaming import assemble_multipart_stream  # noqa: F401
    from camelot_spark import streaming as st

    class StubState:
        def __init__(self, value=None, timed_out=False):
            self.value = value
            self.hasTimedOut = timed_out
            self.removed = False
            self.timeout_set = None

        @property
        def exists(self):
            return self.value is not None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = v

        def remove(self):
            self.value, self.removed = None, True

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    # reach the inner function through the operator factory: build it
    # against a plain DataFrame-free shim by capturing the closure
    captured = {}

    class FakeGrouped:
        def applyInPandasWithState(self, fn, *a, **k):
            captured["fn"] = fn
            return None

    class FakeDF:
        def groupBy(self, *_):
            return FakeGrouped()

    st.assemble_multipart_stream(FakeDF(), timeout_ms=5000)
    fn = captured["fn"]

    pdf = pd.DataFrame([{"doc_id": "d", "part_idx": 1, "n_parts": 2, "payload": "B"}])
    state = StubState()
    assert list(fn(("d",), [pdf], state)) == []          # incomplete: no emit
    assert state.exists and state.timeout_set == 5000

    pdf2 = pd.DataFrame([{"doc_id": "d", "part_idx": 0, "n_parts": 2, "payload": "A"}])
    [out] = list(fn(("d",), [pdf2], state))
    assert out.iloc[0]["text"] == "AB" and out.iloc[0]["complete"] == 1
    assert state.removed

    # timeout on a half-assembled doc: partial emit, state cleared
    state = StubState(value=([3], ["tail"], 4, 0), timed_out=True)
    [out] = list(fn(("d",), [], state))
    assert out.iloc[0]["complete"] == 0 and out.iloc[0]["n_received"] == 1
    assert state.removed
