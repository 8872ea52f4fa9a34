"""Streaming session rollup: the native session_window operator over
an unbounded stream — append-mode emission on watermark passage,
batch equivalence, late-event drop, bounded state."""

import datetime

T0 = datetime.datetime(2024, 5, 1, 10, 0, 0)


def _sec(s):
    return T0 + datetime.timedelta(seconds=s)


def test_streaming_session_rollup_batch_equivalence(spark, tmp_path):
    from camelot_spark.streaming import streaming_session_rollup
    from camelot_spark.tdp.relational import session_rollup

    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    schema = "user_id long, ts timestamp, event_id long"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(inp)

    def drain():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (streaming_session_rollup(stream, gap_s=60,
                                      watermark_delay="2 minutes")
             .writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .format("parquet").option("path", outp).start())
        q.awaitTermination(120)
        try:
            return spark.read.parquet(outp).collect()
        except Exception:
            return []

    # u1: exactly-gap merge (0, 60 -> ONE session, span 60);
    # u3: > gap split (0 | 61 -> TWO sessions)
    batch1 = [(1, _sec(0), 1), (1, _sec(60), 2), (2, _sec(5), 3),
              (3, _sec(0), 4), (3, _sec(61), 5)]
    write(batch1)
    assert drain() == []          # watermark still behind session ends

    # sentinel far ahead pushes the watermark past every batch-1
    # session end -> they all emit, exactly once; the sentinel's own
    # session stays open (bounded state = open sessions only)
    write([(999, _sec(3600), 6)])
    got = sorted(((r["user_id"], r["session_start"], r["n_events"],
                   r["span_s"]) for r in drain()))
    batch_df = spark.createDataFrame(batch1, schema)
    want = sorted(((r["user_id"], r["session_start"], r["n_events"],
                    r["span_s"])
                   for r in session_rollup(batch_df, gap_s=60).collect()))
    assert got == want and len(got) == 4
    assert {(u, n, s) for u, _, n, s in got} == {
        (1, 2, 60), (2, 1, 0), (3, 1, 0), (3, 1, 0)}

    # a LATE event inside u1's closed session is dropped: no new row,
    # no re-emission
    write([(1, _sec(30), 7)])
    assert sorted(((r["user_id"], r["session_start"], r["n_events"],
                    r["span_s"]) for r in drain())) == got
