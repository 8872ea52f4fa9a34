#!/usr/bin/env python
"""Local (no-Spark) kernel profiler for the full-corpus extraction pass.

Mirrors bench.py's full-corpus tiling exactly: keys route to
families_by_config() groups by pmod(xxhash64) over the family count,
then extract_document runs under each group's config. cProfile output
shows where the per-doc time goes (guide §1: measure first).

Usage: python tools/profile_kernels.py [n_keys] [--family FAM]
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _xxhash64_str(s: str) -> int:
    # mirror Spark's xxhash64(string, seed=42) via the repo's pyhash
    from camelot_spark.tdp.pyhash import to_signed, xxh64_bytes
    return to_signed(xxh64_bytes(s.encode("utf-8"), 42))


def main() -> None:
    n_keys = 300
    only_family = None
    args = [a for a in sys.argv[1:]]
    while args:
        a = args.pop(0)
        if a == "--family":
            only_family = args.pop(0)
        else:
            n_keys = int(a)

    from camelot_spark import extract_document, fixtures as fx, make_config

    groups = fx.families_by_config()
    total_fams = sum(len(fams) for _, _, fams in groups)

    # same key shape as bench.py replicated_keys at repl=1: "<doc_id>-0"
    keys = [f"{i}-0" for i in range(n_keys)]
    work = []  # (key, flavor, kwargs, families)
    for k in keys:
        h = _xxhash64_str(k) % total_fams
        if h < 0:
            h += total_fams
        lo = 0
        for flavor, kw, fams in groups:
            hi = lo + len(fams)
            if lo <= h < hi:
                work.append((k, flavor, kw, fams))
                break
            lo = hi

    cfgs = {}
    per_family: dict[str, float] = {}
    per_family_n: dict[str, int] = {}

    def run_all():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for k, flavor, kw, fams in work:
                b = fx.builder_for(k, families=fams, raw=True)
                fam = b.doc_id.rsplit("-", 2)[0]
                if only_family and fam != only_family:
                    continue
                import json as _json
                ck = (flavor, _json.dumps(kw, sort_keys=True))
                if ck not in cfgs:
                    cfgs[ck] = make_config(flavor, **kw)
                t0 = time.monotonic()
                extract_document(b.raw_spans(), cfgs[ck])
                dt = time.monotonic() - t0
                per_family[fam] = per_family.get(fam, 0.0) + dt
                per_family_n[fam] = per_family_n.get(fam, 0) + 1

    # warm-up pass (numpy/jit caches), then profiled pass
    run_all()
    per_family.clear()
    per_family_n.clear()
    t0 = time.monotonic()
    prof = cProfile.Profile()
    prof.enable()
    run_all()
    prof.disable()
    wall = time.monotonic() - t0

    print(f"== {len(work)} docs in {wall:.2f}s "
          f"({len(work) / wall:.0f} docs/s single-core) ==")
    print("\n== per-family totals ==")
    for fam, tot in sorted(per_family.items(), key=lambda kv: -kv[1]):
        n = per_family_n[fam]
        print(f"  {fam:16s} {tot:7.3f}s total  {1e3 * tot / n:8.2f} ms/doc  (n={n})")

    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("tottime")
    ps.print_stats(35)
    print("\n== cProfile (tottime) ==")
    print(s.getvalue())


if __name__ == "__main__":
    main()
