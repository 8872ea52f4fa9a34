"""Round-3 regression tests for the round-2 advice findings: custom
benchmark decontamination, split-aware spread(), legacy-parquet
snapshot migration, and inclusive as-of tie semantics."""

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_decontaminate_custom_benchmark_keeps_full_corpus(spark):
    """A caller-supplied benchmark must not trigger the synthetic %50
    corpus filter: every corpus doc appears in the output, and overlap
    is computed against the custom set."""
    from camelot_spark.tdp.contamination import decontaminate

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta" if i == 50
          else "nothing shared here at all doc %d" % i)
         for i in range(100)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9001, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, benchmark=bench).collect()}
    # doc_id 50 (a multiple of 50) must NOT be dropped, and it is the
    # contaminated one
    assert len(out) == 100
    assert out[50]["contaminated"] == 1 and out[50]["overlap"] >= 5
    assert out[49]["contaminated"] == 0


def test_decontaminate_default_still_excludes_synthetic_benchmark(spark):
    from camelot_spark.tdp.contamination import decontaminate

    docs = spark.createDataFrame(
        [(i, "w%d x y z a b c" % i) for i in range(100)],
        "doc_id long, text string",
    )
    ids = {r["doc_id"] for r in decontaminate(docs).collect()}
    assert 0 not in ids and 50 not in ids and len(ids) == 98


class TestSpread:
    def test_small_file_scan_is_spread(self, spark, tmp_path):
        from camelot_spark.tdp import spread

        p = str(tmp_path / "small")
        spark.range(100).coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        target = spark.sparkContext.defaultParallelism
        assert spread(df).rdd.getNumPartitions() == target

    def test_large_splittable_file_is_left_alone(self, spark, tmp_path):
        """A file big enough to be split into >= target partitions by
        maxPartitionBytes must NOT be repartitioned (round-2 advice: the
        file-count check shuffled exactly this case). Simulated by
        shrinking maxPartitionBytes below the file size."""
        from camelot_spark.tdp import spread

        p = str(tmp_path / "big")
        spark.range(20000).selectExpr("id", "repeat('x', 64) AS pad") \
            .coalesce(1).write.parquet(p)
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
            df = spark.read.parquet(p)
            out = spread(df)
            assert out is df  # no gratuitous exchange on a splittable scan
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    def test_in_memory_narrow_plan_is_spread(self, spark):
        """inputFiles()==[] plans fall back to the RDD partition count
        instead of being silently skipped."""
        from camelot_spark.tdp import spread

        df = spark.range(1000).coalesce(1)
        target = spark.sparkContext.defaultParallelism
        assert spread(df).rdd.getNumPartitions() == target

    def test_wide_in_memory_plan_untouched(self, spark):
        from camelot_spark.tdp import spread

        target = spark.sparkContext.defaultParallelism
        df = spark.range(1000).repartition(target * 2)
        assert spread(df) is df


def test_asof_join_matches_same_timestamp_right_row(spark):
    """Inclusive as-of (l.ts >= r.ts): a purchase must see a signup at
    the IDENTICAL timestamp even when the signup's event_id sorts after
    the purchase's — previously the (ts, event_id) window order made
    the match depend on id assignment."""
    from camelot_spark.tdp.relational import asof_join

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # purchase id 1 and signup id 9 share a timestamp (id 9 > 1)
        (1, t0, 7, "purchase"),
        (9, t0, 7, "signup"),
        # control: a later purchase sees the same signup
        (2, t0 + datetime.timedelta(seconds=30), 7, "purchase"),
        # a user whose signup strictly precedes
        (3, t0, 8, "signup"),
        (4, t0 + datetime.timedelta(seconds=5), 8, "purchase"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {r["event_id"]: r for r in asof_join(df).collect()}
    assert out[1]["asof_event_id"] == 9 and out[1]["gap_seconds"] == 0
    assert out[2]["asof_event_id"] == 9 and out[2]["gap_seconds"] == 30
    assert out[4]["asof_event_id"] == 3 and out[4]["gap_seconds"] == 5


def test_legacy_parquet_dir_folds_into_first_snapshot(spark, tmp_path):
    """run_extraction into a directory holding pre-snapshot-log plain
    parquet: manifest v1 must fold the legacy part files in, so legacy
    rows stay visible and their docs are not re-extracted on resume."""
    from camelot_spark import fixtures as fx
    from camelot_spark.pipeline import extract, read_extracted, run_extraction
    from camelot_spark.snapshots import SnapshotLog
    from tests.test_pipeline_spark import docs_df

    out_path = str(tmp_path / "legacy_tbl")
    b1, b2 = fx.doc_health("lg-1"), fx.doc_health("lg-2")
    # legacy output: plain parquet written directly to the root
    extract(docs_df(spark, [b1]), flavor="stream").write.parquet(out_path)
    assert spark.read.parquet(out_path).count() == 1

    metrics = run_extraction(spark, docs_df(spark, [b1, b2]), out_path, flavor="stream")
    assert metrics["docs"] == 1  # lg-1 resumed from the legacy files
    allrows = read_extracted(spark, out_path)
    assert {r["doc_id"] for r in allrows.select("doc_id").collect()} == {"lg-1", "lg-2"}

    hist = SnapshotLog(out_path).history()
    assert len(hist) == 1 and hist[0].get("legacy_files"), "v1 must list legacy files"
    # a further append carries the legacy files forward
    run_extraction(spark, docs_df(spark, [b1, b2, fx.doc_health("lg-3")]), out_path,
                   flavor="stream")
    log = SnapshotLog(out_path)
    assert log.latest().get("legacy_files") == hist[0]["legacy_files"]
    assert read_extracted(spark, out_path).count() == 3


def test_pack_sequences_shard_docs_bounds_task_size(spark):
    """With shard_docs=N on a SINGLE-source corpus, the cumsum window
    partitions on (source, shard): parallelism is corpus-size/N instead
    of 1, and the per-shard packing matches an independent reference."""
    from pyspark.sql import functions as F

    from camelot_spark.tdp.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "one", " ".join(["t"] * (7 + i % 13))) for i in range(80)],
        "doc_id long, source string, text string",
    )
    out = pack_sequences(docs, seq_len=64, shard_docs=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan and "hashpartitioning" in plan

    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 80
    # reference: packing restarts at every shard boundary of 10 docs
    cum = {}
    for i in range(80):
        shard = i // 10
        prev = cum.get(shard, 0)
        assert rows[i]["seq_id"] == prev // 64, i
        assert rows[i]["seq_offset"] == prev % 64, i
        cum[shard] = prev + (7 + i % 13)
    # default (no shard key) is unchanged: one packing stream per source
    base = {r["doc_id"]: r for r in pack_sequences(docs, seq_len=64).collect()}
    running = 0
    for i in range(80):
        assert base[i]["seq_id"] == running // 64 and base[i]["seq_offset"] == running % 64
        running += 7 + i % 13


def test_scrub_pii_undecorated_reports_only_true_hits(spark):
    """Production path (decorate=False, the default): counts reflect the
    actual text, and clean text is returned verbatim."""
    from camelot_spark.tdp.text import scrub_pii

    docs = spark.createDataFrame(
        [(0, "totally clean text"),  # doc_id % 7 == 0: decoration target
         (7, "reach me at jo@corp.io or 555-123-4567")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[0]["n_emails"] == 0 and out[0]["n_phones"] == 0 and out[0]["n_ips"] == 0
    assert out[0]["scrubbed"] == "totally clean text"
    assert out[7]["n_emails"] == 1 and out[7]["n_phones"] == 1
    assert out[7]["scrubbed"] == "reach me at <EMAIL> or <PHONE>"


def test_connected_components_matches_union_find(spark):
    """Fixed-round min-label propagation vs a true union-find on random
    graphs: with rounds >= diameter the labels are exact components."""
    import random

    from camelot_spark.tdp.dedup import connected_components

    rng = random.Random(5)
    nodes = list(range(60))
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(45)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    got = {r["doc_id"]: r["component"]
           for r in connected_components(df, rounds=10).collect()}

    parent = {n: n for n in nodes}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for p in pairs for x in p}
    want = {}
    for n in touched:
        root = find(n)
        want[n] = min(m for m in touched if find(m) == root)
    assert got == want


def test_connected_components_long_chain_needs_rounds(spark):
    """A 12-node chain: rounds below the diameter leave far nodes
    unconverged (documented fixed-round semantics); enough rounds
    collapse the whole chain to one component."""
    from camelot_spark.tdp.dedup import connected_components

    chain = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(chain, "a_id long, b_id long")
    full = {r["doc_id"]: r["component"]
            for r in connected_components(df, rounds=12).collect()}
    assert set(full.values()) == {0}
    partial = {r["doc_id"]: r["component"]
               for r in connected_components(df, rounds=2).collect()}
    assert partial[11] != 0  # honest: 2 rounds cannot reach 11 hops


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key: the join plan has NO
    Exchange (co-located scan-local join) and matches the plain-join
    result exactly."""
    from pyspark.sql import functions as F

    from camelot_spark.tdp.relational import write_bucketed

    left = spark.range(500).select(
        (F.col("id") % 40).alias("user_id"), F.col("id").alias("event_id"))
    right = spark.range(40).select(
        F.col("id").alias("user_id"), (F.col("id") * 7).alias("score"))
    write_bucketed(left, "bkt_left", buckets=8, key="user_id")
    write_bucketed(right, "bkt_right", buckets=8, key="user_id")
    try:
        a, b = spark.table("bkt_left"), spark.table("bkt_right")
        # disable broadcast so the co-location (not a broadcast) kills
        # the shuffle — the shape that matters when BOTH sides are huge
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "user_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            got = sorted(map(tuple, joined.collect()))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        want = sorted(map(tuple, left.join(right, "user_id").collect()))
        assert got == want and len(got) == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketized_interval_join_is_equi_not_nested_loop(spark):
    """The banded re-expression plans an equi-join; the naive range
    join on the same data plans a BroadcastNestedLoopJoin — the shape
    this operator exists to avoid. Results match exactly."""
    from pyspark.sql import functions as F

    from camelot_spark.tdp.relational import bucketized_interval_join

    pts = spark.range(2000).select(
        F.col("id").alias("event_id"), (F.col("id") % 331 * 0.7).alias("value"))
    iv = spark.range(50).select(
        F.col("id").alias("key"), (F.col("id") * 4.0).alias("lo"),
        (F.col("id") * 4.0 + 9.0).alias("hi"))

    ours = bucketized_interval_join(pts, iv, "value", "lo", "hi", bucket_width=8.0)
    plan = ours._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan

    naive = pts.join(iv, (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")))
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in naive_plan or "Cartesian" in naive_plan

    got = sorted((r["event_id"], r["key"]) for r in ours.collect())
    want = sorted((r["event_id"], r["key"]) for r in naive.collect())
    assert got == want and len(got) > 0


def test_kmv_distinct_estimator_accuracy(spark):
    """KMV estimate within ~2/sqrt(k) of the true distinct count on a
    group far larger than k, and exact below k."""
    import random

    from camelot_spark.tdp.dedup import kmv_distinct

    rng = random.Random(17)
    rows = [(i, "big", "doc %d %s" % (rng.randint(0, 1199), "x" * (i % 5)))
            for i in range(4000)]
    rows += [(10_000 + i, "small", "tiny %d" % i) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    true_big = df.where("source = 'big'").select("text").distinct().count()
    out = {r["source"]: r for r in kmv_distinct(df, k=64).collect()}
    assert out["small"]["distinct_est"] == 20  # below k: exact
    err = abs(out["big"]["distinct_est"] - true_big) / true_big
    assert err < 0.25, (out["big"]["distinct_est"], true_big)


def _union_find_components(pairs):
    """Ground-truth min-id components for a pair list."""
    nodes = {x for p in pairs for x in p}
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}


def test_star_cc_matches_union_find_on_random_graphs(spark):
    """Large-star/small-star contraction returns TRUE components (vs a
    union-find oracle) on random graphs, cliques, and self-loops."""
    import random

    from camelot_spark.tdp.dedup import connected_components_star

    rng = random.Random(7)
    cases = [
        [(5, 5), (1, 2), (2, 2)],
        [(a, b) for base in (0, 100)
         for a in range(base, base + 6) for b in range(a + 1, base + 6)],
    ]
    for _ in range(2):
        nodes = list(range(200))
        cases.append([(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)])
    for pairs in cases:
        df = spark.createDataFrame(pairs, "a_id long, b_id long")
        got = {r["doc_id"]: r["component"]
               for r in connected_components_star(df).collect()}
        assert got == _union_find_components(pairs)


def test_star_cc_converges_on_huge_diameter_component(spark):
    """The O(log n) motivation: a 60-hop path collapses to one component
    in few contraction iterations, where fixed-round min-label would
    need 60 rounds (cf. test_connected_components_long_chain_needs_rounds)."""
    from camelot_spark.tdp.dedup import connected_components_star

    chain = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(chain, "a_id long, b_id long")
    got = {r["doc_id"]: r["component"]
           for r in connected_components_star(df, max_iters=8).collect()}
    assert len(got) == 61 and set(got.values()) == {0}


def test_dedup_groups_star_equals_rounds_on_corpus(spark):
    """On the real sampled corpus (dense near-dup clusters), the star
    algorithm and converged fixed-round propagation produce identical
    groups — the contract behind DEDUP_GROUPS_STAR_SQL's oracle."""
    from pyspark.sql import functions as F

    from camelot_spark.tdp.dedup import dedup_groups

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
        F.col("doc_id") % 2 == 0)
    a = {(r["doc_id"], r["component"], r["is_canonical"])
         for r in dedup_groups(docs, portable=True, algorithm="star").collect()}
    b = {(r["doc_id"], r["component"], r["is_canonical"])
         for r in dedup_groups(docs, portable=True, rounds=12).collect()}
    assert a == b and len(a) > 0


def test_kmv_partial_agg_identical_to_plain(spark):
    """Per-partition k-cap before the shuffle loses nothing: on a
    many-partition input where every partition holds far more than k
    distinct hashes, the partial-agg sketch is bit-identical to the
    plain one (same estimate AND same kth hash)."""
    import random

    from camelot_spark.tdp.dedup import kmv_distinct, kmv_distinct_partial

    rng = random.Random(23)
    rows = [(i, "s%d" % (i % 3), "doc %d" % rng.randint(0, 2999))
            for i in range(6000)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string").repartition(16)
    plain = {r["source"]: (r["distinct_est"], r["kth_hash"])
             for r in kmv_distinct(df, k=32).collect()}
    partial = {r["source"]: (r["distinct_est"], r["kth_hash"])
               for r in kmv_distinct_partial(df, k=32).collect()}
    assert partial == plain and len(plain) == 3


def test_kmv_partial_agg_bounds_shuffle_rows(spark):
    """The point of the partial agg: rows entering the merge are capped
    at k per (partition, source), not one per distinct document."""
    from camelot_spark.tdp.dedup import kmv_distinct_partial
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "only", "doc %d" % i) for i in range(5000)],
        "doc_id long, source string, text string").repartition(8)
    # reach into the pre-merge stage: replicate the capped mapInPandas
    # output by counting rows the estimator's input would carry
    est = kmv_distinct_partial(df, k=16)
    row = {r["source"]: r for r in est.collect()}["only"]
    # capping must not change the estimate (accuracy itself is covered
    # by test_kmv_distinct_estimator_accuracy at a usable k)
    from camelot_spark.tdp.dedup import kmv_distinct
    plain = {r["source"]: r for r in kmv_distinct(df, k=16).collect()}["only"]
    assert (row["distinct_est"], row["kth_hash"]) == (
        plain["distinct_est"], plain["kth_hash"])
    # structural bound: 8 partitions x 1 source x k=16 = 128 rows max
    # entering the merge — assert via the capped stage itself
    from camelot_spark.tdp import dedup as D
    h = F.aggregate(F.split(F.col("text"), ""), F.lit(0).cast("long"),
                    lambda a, c: (a * 31 + F.coalesce(F.ascii(c), F.lit(0))) % D._KMV_M)
    import pandas as pd

    def _cap(batches, k=16):
        acc = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            both = both.drop_duplicates()
            acc = (both.sort_values(["source", "h"], kind="mergesort")
                   .groupby("source", sort=False).head(k))
        if acc is not None and len(acc):
            yield acc

    capped = df.select("source", h.alias("h")).mapInPandas(
        _cap, schema="source string, h long")
    assert capped.count() <= 8 * 16


def test_snapshot_compaction_rewrites_files_and_preserves_rows(spark, tmp_path):
    """compact() = Iceberg rewrite_data_files: many small append dirs
    become one replacing snapshot with the same rows; time travel to
    pre-compaction versions still works, and expire + remove_orphans
    reclaims the old dirs without touching the live data."""
    import os as _os

    from camelot_spark.snapshots import SnapshotLog

    root = str(tmp_path / "tbl")
    log = SnapshotLog(root)
    for i in range(4):
        log.append(spark.range(i * 10, (i + 1) * 10).selectExpr(
            "id", "id * 2 AS twice"))
    before = {r["id"] for r in log.read(spark).collect()}
    assert len(log.latest()["data_dirs"]) == 4

    m = log.compact(spark, target_partitions=1)
    assert m["operation"] == "replace" and len(m["data_dirs"]) == 1
    after = {r["id"] for r in log.read(spark).collect()}
    assert after == before == set(range(40))
    # time travel: version 4 (pre-compaction) still lists 4 dirs
    assert {r["id"] for r in log.read(spark, version=4).collect()} == before

    # maintenance: expire old snapshots, then the 4 original dirs are
    # orphans; removing them leaves the compacted table intact
    log.expire_snapshots(keep_last=1)
    removed = log.remove_orphans()
    assert len(removed) == 4
    assert {r["id"] for r in log.read(spark).collect()} == before
    data_root = _os.path.join(root, "data")
    assert len(_os.listdir(data_root)) == 1


def test_snapshot_compaction_refuses_to_drop_concurrent_append(spark, tmp_path):
    """Serializable rewrite: a commit that lands between the compaction
    read and its publish must fail the compaction (retrying blindly
    would drop the concurrent rows)."""
    import pytest

    from camelot_spark.snapshots import CommitConflict, SnapshotLog

    root = str(tmp_path / "tbl")
    log = SnapshotLog(root)
    log.append(spark.range(10))

    orig_latest = log.latest
    calls = {"n": 0}

    def racing_latest():
        m = orig_latest()
        # after compact() captured its parent (first call), land a
        # concurrent append before its validation re-read
        if calls["n"] == 1:
            log2 = SnapshotLog(root)
            log2.latest = orig_latest
            SnapshotLog(root).append(spark.range(100, 110))
        calls["n"] += 1
        return orig_latest()

    log.latest = racing_latest
    with pytest.raises(CommitConflict):
        log.compact(spark)
    # nothing lost: both commits' rows are visible
    assert log.read(spark).count() == 20


def test_snapshot_schema_evolution_reads_added_column_as_null(spark, tmp_path):
    """Appends with an evolved (added-column) schema: merge_schema=True
    reconciles old files with NULLs, default read stays cheap."""
    from camelot_spark.snapshots import SnapshotLog

    log = SnapshotLog(str(tmp_path / "tbl"))
    log.append(spark.range(5).selectExpr("id"))
    log.append(spark.range(5, 10).selectExpr("id", "id * 3 AS extra"))
    merged = log.read(spark, merge_schema=True)
    assert set(merged.columns) == {"id", "extra"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert rows[2] is None and rows[7] == 21 and len(rows) == 10


def test_snapshot_merge_upserts_by_key(spark, tmp_path):
    """Copy-on-write MERGE: updated keys replace, new keys append, one
    replacing snapshot; time travel still shows the pre-merge rows."""
    from camelot_spark.snapshots import SnapshotLog

    log = SnapshotLog(str(tmp_path / "tbl"))
    log.append(spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "doc_id long, text string"))
    m = log.merge(spark, spark.createDataFrame(
        [(2, "new2"), (9, "new9")], "doc_id long, text string"))
    assert m["operation"] == "replace" and m["version"] == 2
    rows = {r["doc_id"]: r["text"] for r in log.read(spark).collect()}
    assert rows == {1: "old1", 2: "new2", 3: "old3", 9: "new9"}
    old = {r["doc_id"]: r["text"] for r in log.read(spark, version=1).collect()}
    assert old == {1: "old1", 2: "old2", 3: "old3"}
    # merge into an empty table is a plain append
    log2 = SnapshotLog(str(tmp_path / "tbl2"))
    m2 = log2.merge(spark, spark.createDataFrame([(5, "x")],
                                                 "doc_id long, text string"))
    assert m2["version"] == 1 and log2.read(spark).count() == 1


def test_snapshot_merge_refuses_concurrent_commit(spark, tmp_path):
    import pytest

    from camelot_spark.snapshots import CommitConflict, SnapshotLog

    root = str(tmp_path / "tbl")
    log = SnapshotLog(root)
    log.append(spark.range(5).selectExpr("id AS doc_id", "'a' AS text"))
    orig_latest = log.latest
    calls = {"n": 0}

    def racing_latest():
        if calls["n"] == 1:
            SnapshotLog(root).append(
                spark.range(100, 103).selectExpr("id AS doc_id", "'b' AS text"))
        calls["n"] += 1
        return orig_latest()

    log.latest = racing_latest
    with pytest.raises(CommitConflict):
        log.merge(spark, spark.range(2).selectExpr("id AS doc_id", "'c' AS text"))
    assert log.read(spark).count() == 8  # nothing lost


def test_pack_sequences_global_matches_serial_scan(spark):
    """The three-level prefix sum equals the serial global scan over
    (source, doc_id) order — checked against a pure-Python reference —
    and the plan carries exactly one SinglePartition exchange (the
    enum-small source-totals level) plus a broadcast back."""
    from camelot_spark.tdp.packing import pack_sequences_global

    docs = spark.createDataFrame(
        [(i, ["alpha", "beta", "gamma"][i % 3],
          " ".join(["t"] * (5 + (i * 7) % 17))) for i in range(120)],
        "doc_id long, source string, text string",
    )
    out = pack_sequences_global(docs, seq_len=64, shard_docs=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1
    assert "BroadcastExchange" in plan

    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 120
    running = 0
    order = sorted(range(120), key=lambda i: (["alpha", "beta", "gamma"][i % 3], i))
    for i in order:
        assert rows[i]["seq_id"] == running // 64, i
        assert rows[i]["seq_offset"] == running % 64, i
        running += 5 + (i * 7) % 17
    # partition-invariance: same answer from a different physical layout
    again = {r["doc_id"]: (r["seq_id"], r["seq_offset"])
             for r in pack_sequences_global(
                 docs.repartition(13), seq_len=64, shard_docs=10).collect()}
    assert again == {k: (v["seq_id"], v["seq_offset"]) for k, v in rows.items()}


def test_pack_sequences_global_keeps_null_source(spark):
    """NULL-source docs pack (null-safe joins), placed LAST in the
    stream exactly as the twin's ORDER BY source (DuckDB NULLS LAST)
    places them — a plain equi-join would silently drop the rows."""
    from camelot_spark.tdp.packing import pack_sequences_global

    docs = spark.createDataFrame(
        [(0, "a", "t t t"), (1, None, "t t"), (2, "b", "t t t t"),
         (3, None, "t t t")],
        "doc_id long, source string, text string",
    )
    rows = {r["doc_id"]: r for r in
            pack_sequences_global(docs, seq_len=4, shard_docs=2).collect()}
    assert len(rows) == 4                      # nothing dropped
    # serial order: a(3), b(4), NULLS LAST: doc1(2), doc3(3)
    assert (rows[0]["seq_id"], rows[0]["seq_offset"]) == (0, 0)
    assert (rows[2]["seq_id"], rows[2]["seq_offset"]) == (0, 3)
    assert (rows[1]["seq_id"], rows[1]["seq_offset"]) == (1, 3)
    assert (rows[3]["seq_id"], rows[3]["seq_offset"]) == (2, 1)
    assert rows[1]["source"] is None
