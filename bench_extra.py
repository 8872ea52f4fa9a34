#!/usr/bin/env python
"""Targeted query benchmarks + plan capture (guide §1.4/§1.5).

bench.py is FROZEN for the driver's measurement; this harness exists
for optimization work: time a subset of registry queries in isolation
(noop sink, min of N runs, labeled jobs) and/or dump their
.explain('formatted') plans to plans/r07/.

Usage:
  python bench_extra.py time  q1 q2 ...   [--runs 3] [--sf DIR]
  python bench_extra.py plan  q1 q2 ...   [--tag before|after]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "plan"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from bench import _force, build_spark

    import __spark_entry__ as entrymod

    spark = build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    try:
        if args.mode == "plan":
            outdir = os.path.join(REPO, "plans", "r07")
            os.makedirs(outdir, exist_ok=True)
            for name in args.queries:
                df = qs[name](spark, args.sf)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted"))
                path = os.path.join(outdir, f"{name}_{args.tag}.txt")
                with open(path, "w") as f:
                    f.write(plan)
                n_ex = plan.count("Exchange")
                print(f"{name}: {path}  (Exchange x{n_ex})")
            return

        # warm-up pass (JVM, Arrow, worker pool) on the first query
        spark.sparkContext.setJobDescription("bench_extra warmup")
        _force(qs[args.queries[0]](spark, args.sf))
        for name in args.queries:
            best, samples = float("inf"), []
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(f"{name} run {i}")
                t0 = time.monotonic()
                _force(qs[name](spark, args.sf))
                dt = time.monotonic() - t0
                samples.append(round(dt, 3))
                best = min(best, dt)
            print(f"{name:32s} min {best:6.2f}s  runs {samples}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
