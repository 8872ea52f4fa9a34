#!/usr/bin/env python
"""sf1 scaling tier: one more decade on the slowest registry queries.

Runs the slow-tier queries (every one reads only documents/embeddings)
at benchdata/sf0.1twin (5k docs / 2k vecs — sf0.1-shaped) and
benchdata/sf1 (50k / 20k — 10x), both from tools/gen_benchdata.py's
single generator, and reports the per-query decade ratio. Linear cost
== ~10x; the verdict's flag line is >12x (superlinear drift).

Timing protocol matches bench.py: two runs per query per tier, min
(steady-state; first run pays plan compile + JIT), noop-write force.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SLOW_TIER = [
    "dedup_incremental",
    "decontaminate_bloom",
    "embedding_neardup_pairs",
    "simhash_near_dups",
    "minhash_lsh_pairs_portable",
    "ivf_refine",
    "bpe_train",
    "bpe_token_counts",
    "semantic_dedup",
    "feature_hash_embed",
    "ann_recall",
    "hashed_topk",
    "hashed_ivf_topk",
    "dup_substring_spans",
    "mine_hard_negatives",
]


def main() -> int:
    from bench import _force, build_spark

    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    tiers = {
        "sf0.1twin": os.path.join(REPO, "benchdata", "sf0.1twin"),
        "sf1": os.path.join(REPO, "benchdata", "sf1"),
    }
    results: dict[str, dict[str, float]] = {t: {} for t in tiers}
    try:
        # warm-up: JVM + Arrow + python worker pool on the small tier
        _force(qs["feature_hash_embed"](spark, tiers["sf0.1twin"]))
        for tier, d in tiers.items():
            for name in SLOW_TIER:
                best = float("inf")
                for _ in range(2):
                    t0 = time.monotonic()
                    _force(qs[name](spark, d))
                    best = min(best, time.monotonic() - t0)
                results[tier][name] = round(best, 3)
                print(f"  {tier:10s} {name:28s} {best:7.2f} s",
                      file=sys.stderr)
    finally:
        spark.stop()

    print("\n| query | sf0.1twin s | sf1 s | ratio (linear=10x) | flag |")
    print("|---|---|---|---|---|")
    for name in SLOW_TIER:
        a, b = results["sf0.1twin"][name], results["sf1"][name]
        ratio = b / a if a > 0 else float("inf")
        flag = "**>12x superlinear**" if ratio > 12 else ""
        print(f"| {name} | {a:.2f} | {b:.2f} | {ratio:.1f}x | {flag} |")
    print(json.dumps({"sf0.1twin": results["sf0.1twin"],
                      "sf1": results["sf1"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
