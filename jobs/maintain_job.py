#!/usr/bin/env python
"""spark-submit entrypoint: snapshot-table maintenance.

The operational counterpart of Iceberg's table-maintenance actions
(rewrite_data_files / expire_snapshots / remove_orphan_files) for
SnapshotLog tables — the background job a production deployment runs
on a schedule against every checkpointed output of extract_job /
curate_job, so long append chains stay readable fast and bounded in
metadata::

    spark-submit --py-files dist/camelot_spark.zip jobs/maintain_job.py \
        --table /data/curated \
        --steps compact,expire,orphans \
        --keep-last 5 --target-partitions 8

Steps (each optional, composed left-to-right):

- ``compact``  rewrite the live data into ``--target-partitions``
               files as ONE replacing snapshot (readers never see a
               torn table; time travel to pre-compaction versions
               keeps working until they are expired);
- ``expire``   drop manifests older than the newest ``--keep-last``
               (bounds metadata; current reads unaffected);
- ``orphans``  delete data dirs no committed manifest references
               (crashed writers, commit-race losers). ``--dry-run``
               lists instead of deleting — run wet only when no
               writer is in flight (the same operational rule as
               Iceberg's remove_orphan_files).

Prints one JSON line: versions before/after, rows, expired versions,
orphans found/removed — the audit record a scheduler keeps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--table", required=True,
                    help="snapshot-logged parquet dir (SnapshotLog root)")
    ap.add_argument("--steps", default="compact,expire,orphans")
    ap.add_argument("--keep-last", type=int, default=5)
    ap.add_argument("--target-partitions", type=int, default=8)
    ap.add_argument("--dry-run", action="store_true",
                    help="orphans step lists instead of deleting")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from camelot_spark.snapshots import SnapshotLog

    spark = SparkSession.builder.appName("camelot-spark-maintain").config(
        "spark.sql.adaptive.enabled", "true").getOrCreate()
    log = SnapshotLog(args.table)
    latest = log.latest()
    if latest is None:
        print(json.dumps({"status": "empty", "table": args.table}))
        return 0

    report: dict = {"status": "ok", "table": args.table,
                    "version_before": latest["version"]}
    for step in args.steps.split(","):
        if step == "compact":
            m = log.compact(spark,
                            target_partitions=args.target_partitions)
            report["compacted_snapshot"] = m["snapshot_id"]
            report["compacted_version"] = m["version"]
        elif step == "expire":
            report["expired_versions"] = log.expire_snapshots(
                keep_last=args.keep_last)
        elif step == "orphans":
            if args.dry_run:
                report["orphans_found"] = log.orphan_dirs()
            else:
                report["orphans_removed"] = log.remove_orphans()
        else:
            raise SystemExit(f"unknown step {step!r}")
    report["version_after"] = log.latest()["version"]
    report["rows"] = log.read(spark).count()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
