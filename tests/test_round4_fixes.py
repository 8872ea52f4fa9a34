"""Round-4 fixes: verified near-dup curation, degenerate-corpus BPE
oracle, star-CC convergence reporting, JPEG marker-scan robustness."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


NEAR_A = ("the quick brown fox jumps over the lazy dog while seventeen "
          "sparrows observe the entire scene from a nearby oak branch")
NEAR_B = ("the quick brown fox jumps over the lazy dog while eighteen "
          "sparrows observe the entire scene from a nearby oak branch")
FAR_C = "completely unrelated text about submarine hydraulics and pressure"
FAR_D = "a third topic entirely: medieval bread prices in lowland markets"


def _docs(spark):
    rows = [(1, NEAR_A), (2, NEAR_B), (3, FAR_C), (4, FAR_D)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_verify_pairs_jaccard_drops_banding_false_positives(spark):
    """A candidate list containing one true near-dup pair and one
    dissimilar (banding-collision) pair keeps only the true pair."""
    from camelot_spark.tdp.dedup import verify_pairs_jaccard

    cand = spark.createDataFrame([(1, 2), (3, 4)], "a_id long, b_id long")
    out = verify_pairs_jaccard(_docs(spark), cand, threshold_x10k=7000).collect()
    assert [(r["a_id"], r["b_id"]) for r in out] == [(1, 2)]
    assert out[0]["jaccard_x10k"] >= 7000


def test_dedup_groups_verified_keeps_true_groups(spark):
    """dedup_groups with verification still groups genuine near-dups
    (canonical = min doc_id) and leaves dissimilar docs singleton."""
    from camelot_spark.tdp.dedup import dedup_groups

    groups = {r["doc_id"]: (r["component"], r["is_canonical"])
              for r in dedup_groups(_docs(spark),
                                    verify_threshold_x10k=7000).collect()}
    # docs 1 and 2 are near-identical -> same component, 1 canonical
    assert groups[1] == (1, 1)
    assert groups[2] == (1, 0)
    # any other doc that surfaced as an LSH candidate must be its own
    # canonical singleton after verification
    for doc_id, (comp, canon) in groups.items():
        if doc_id not in (1, 2):
            assert comp == doc_id and canon == 1


def test_curate_dedup_near_verified_end_to_end(spark):
    """The curation delete step keeps dissimilar docs even when they are
    LSH candidates, and drops only verified near-dups."""
    from jobs.curate_job import apply_steps

    rows = [(1, NEAR_A, "en", "s", 100), (2, NEAR_B, "en", "s", 100),
            (3, FAR_C, "en", "s", 100), (4, FAR_D, "en", "s", 100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")

    class Args:
        steps = "dedup_near"
        min_quality = 0
        substr_k = 40
        cc_algorithm = "star"
        near_threshold = 7000
        sample_rates = ""
        strata_col = "lang"

    curated, report = apply_steps(spark, docs, Args)
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert ids == {1, 3, 4}
    assert report[-1]["docs"] == 3


def test_bpe_oracle_degenerate_corpus_matches(spark):
    """A corpus that exhausts learnable merges before round 8 (single-
    letter words only) must still hash-match its DuckDB twin: the CTE
    rounds pass state through unchanged when a round's argmax is empty,
    mirroring the Spark loop's early break."""
    import duckdb

    from camelot_spark.tdp import bpe

    rows = [(0, "a b c d"), (8, "a b a b"), (16, "c a c a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["n_tokens"])
        for r in bpe.bpe_token_counts(docs).collect())
    con = duckdb.connect()
    con.execute("create table documents(doc_id bigint, text varchar)")
    con.executemany("insert into documents values (?, ?)", rows)
    want = sorted(map(tuple, con.execute(bpe.BPE_TOKEN_COUNTS_SQL).fetchall()))
    assert got == want and len(got) == 3
    # sanity on the values: merges do fire on the repeated-pair docs
    counts = dict(got)
    assert counts[0] == 4          # no merges applicable -> 4 tokens


def test_star_cc_raises_when_not_converged(spark):
    """Exhausting max_iters before the edge-set fixpoint must raise, not
    return silently split components."""
    from camelot_spark.tdp.dedup import connected_components_star

    edges = [(i, i + 1) for i in range(0, 40)]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(df, max_iters=1).collect()


def test_jpeg_marker_scan_handles_fill_bytes_and_standalone_markers():
    """0xFF fill padding between segments and standalone TEM markers
    (T.81 B.1.1.2) must not derail the segment scan."""
    import numpy as np

    from camelot_spark.tdp.jpeg_codec import decode_jpeg, encode_jpeg

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    payload = encode_jpeg(img)
    base = decode_jpeg(payload)
    # inject fill bytes + a TEM marker right after SOI
    patched = payload[:2] + b"\xff\xff\xff\x01" + payload[2:]
    out = decode_jpeg(patched)
    assert np.array_equal(out, base)


def test_link_rank_matches_python_reference(spark):
    """Integer PageRank against a driver-side reference implementation
    on a small crafted graph, plus ordering sanity (hub outranks
    leaves)."""
    from camelot_spark.tdp.ranking import link_rank

    edges = [(1, 0), (2, 0), (3, 0), (4, 2), (0, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["doc_id"]: r["rank_ppm"] for r in link_rank(df, iters=8).collect()}

    MU, d = 1_000_000, 85
    base = MU * (100 - d) // 100
    nodes = {0, 1, 2, 3, 4}
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    rank = {n: MU for n in nodes}
    for _ in range(8):
        nxt = {n: base for n in nodes}
        for s, ts in out.items():
            c = (rank[s] * d // 100) // len(ts)
            for t in ts:
                nxt[t] += c
        rank = nxt
    assert got == rank
    # in-cycle nodes (0<->2) accumulate mass; pure leaves sit at base
    assert min(got[0], got[2]) > 10 * base
    assert got[1] == got[3] == got[4] == base


def test_jpeg_sof2_without_scans_raises():
    """A truncated progressive stream (SOF2 + EOI, zero scans) must
    raise, not return a uniform gray image."""
    import struct

    from camelot_spark.tdp.jpeg_codec import (_forward_blocks, _headers,
                                              _ACP_BITS, _ACP_VALS,
                                              decode_jpeg)
    import numpy as np

    zzs, qts, gray, h, w = _forward_blocks(np.zeros((8, 8), np.uint8), 90)
    out = _headers(0xC2, zzs, qts, gray, h, w, _ACP_BITS, _ACP_VALS)
    out += b"\xff\xd9"
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(bytes(out))


def test_jpeg_non_interleaved_baseline_decodes_exactly():
    """T.81 A.2.2 non-interleaved layout (one SOS per component, raster
    block order over the component's native grid) decodes bit-exactly
    like the interleaved stream of the same coefficients — including
    subsampled layouts and subset-interleaved (split) scan scripts."""
    import numpy as np

    from camelot_spark.tdp.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    for shape, ss in [((16, 16, 3), "4:4:4"), ((24, 40, 3), "4:2:0"),
                      ((17, 13, 3), "4:2:2"), ((9, 11, 3), "4:2:0")]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        inter = decode_jpeg(encode_jpeg(img, quality=85, subsampling=ss))
        nonint = decode_jpeg(encode_jpeg(img, quality=85, subsampling=ss,
                                         non_interleaved=True))
        assert np.array_equal(inter, nonint), (shape, ss)

    # subset-interleaved scripts (luma alone, then the chroma pair as
    # one interleaved subset scan) decode exactly too
    rng2 = np.random.default_rng(17)
    for shape, ss in [((16, 16, 3), "4:4:4"), ((24, 40, 3), "4:2:0")]:
        img = rng2.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=ss))
        split = decode_jpeg(encode_jpeg(img, quality=85, subsampling=ss,
                                        split_scans=True))
        assert np.array_equal(split, base), (shape, ss)


def test_assembly_stray_part_index_does_not_complete():
    """An out-of-range part index must not satisfy completeness by
    count; the doc stays pending (later timeout flushes it partial)."""
    import pandas as pd

    from camelot_spark import streaming as st

    captured = {}

    class FakeGrouped:
        def applyInPandasWithState(self, fn, *a, **k):
            captured["fn"] = fn

    class FakeDF:
        def groupBy(self, *_):
            return FakeGrouped()

    class StubState:
        value, hasTimedOut, removed = None, False, False

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
            pass

    st.assemble_multipart_stream(FakeDF())
    fn = captured["fn"]
    state = StubState()
    pdf = pd.DataFrame([
        {"doc_id": "d", "part_idx": 0, "n_parts": 3, "payload": "a"},
        {"doc_id": "d", "part_idx": 1, "n_parts": 3, "payload": "b"},
        {"doc_id": "d", "part_idx": 5, "n_parts": 3, "payload": "STRAY"},
    ])
    assert list(fn(("d",), [pdf], state)) == []     # 3 distinct != complete
    assert state.exists
    # the missing part arrives: complete, stray excluded from the text
    pdf2 = pd.DataFrame([{"doc_id": "d", "part_idx": 2, "n_parts": 3,
                          "payload": "c"}])
    [out] = list(fn(("d",), [pdf2], state))
    assert out.iloc[0]["text"] == "abc"
    assert out.iloc[0]["complete"] == 1 and out.iloc[0]["n_received"] == 4


def test_sqlite_skips_empty_grid_and_sheet_names_stay_bounded(spark, tmp_path):
    import sqlite3

    from pyspark.sql import functions as F

    from camelot_spark import sinks

    # extracted row with one real table and one zero-cell table
    df = spark.range(1).select(
        F.lit("d").alias("doc_id"),
        F.array(F.struct(
            F.lit("cell").alias("kind"), F.lit("v").alias("text"),
            F.lit("").alias("media_ref"), F.lit(0).alias("order"))).alias("spans"),
        F.lit(2).alias("n_tables"),
        F.lit(100.0).alias("accuracy"), F.lit(0.0).alias("whitespace"),
        F.array(
            F.struct(
                F.lit(1).alias("order"), F.lit(100.0).alias("accuracy"),
                F.lit(0.0).alias("whitespace"), F.lit(1).alias("nrows"),
                F.lit(1).alias("ncols"), F.lit(0.0).alias("x0"), F.lit(0.0).alias("y0"),
                F.lit(0.0).alias("x1"), F.lit(0.0).alias("y1")),
            F.struct(
                F.lit(2).alias("order"), F.lit(0.0).alias("accuracy"),
                F.lit(100.0).alias("whitespace"), F.lit(0).alias("nrows"),
                F.lit(0).alias("ncols"), F.lit(0.0).alias("x0"), F.lit(0.0).alias("y0"),
                F.lit(0.0).alias("x1"), F.lit(0.0).alias("y1")),
        ).alias("tables"),
    )
    db = str(tmp_path / "t.db")
    assert sinks.to_sqlite(df, db) == 1          # empty grid skipped, no crash
    conn = sqlite3.connect(db)
    assert [r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")] == ["page-d-table-1"]
    conn.close()

    # sheet-name collisions terminate and stay within 31 chars
    rows = [{"doc_id": "x" * 40, "table_order": 1}] * 5
    names = sinks._sheet_names(rows)
    assert len(set(names)) == 5 and all(len(n) <= 31 for n in names)


def test_jpeg_restart_markers_in_all_scan_layouts():
    """restart_interval must compose with every scan layout (the DRI
    segment promises RSTn markers; missing ones crash the decoder's
    resync scan): interleaved counts MCUs, non-interleaved and split
    scans count blocks per scan."""
    import numpy as np

    from camelot_spark.tdp.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    for ss in ("4:4:4", "4:2:0"):
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=ss))
        for kw in ({"non_interleaved": True}, {"split_scans": True}, {}):
            got = decode_jpeg(encode_jpeg(img, quality=85, subsampling=ss,
                                          restart_interval=3, **kw))
            assert np.array_equal(got, base), (ss, kw)
