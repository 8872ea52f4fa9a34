"""Snapshot-log checkpointing for parquet outputs (north_rule: "snapshot
checkpoints").

The reference has no checkpoint concept at all — its resume unit is the
per-page temp file (`camelot/handlers.py:163-174`). The production
target here is an Iceberg catalog, where ``writeTo(...).append()``
commits one real Iceberg snapshot per run (``pipeline.run_extraction``
table-identifier branch, unchanged). This module gives PATH outputs the
same commit semantics without an Iceberg runtime, modeled on the
publicly documented Iceberg metadata-log design:

- the table root holds immutable data files plus an ordered metadata
  log ``_snapshots/v{N}.json``;
- a commit = write data files into a fresh unique directory, then
  atomically publish manifest v{N} (hard-link of a temp file — fails if
  v{N} already exists, never overwrites);
- concurrent committers race on N; the loser re-reads the latest
  manifest and retries on top of it (optimistic concurrency). Data
  files are written before the manifest, so a crashed/losing writer
  leaves only unreferenced files, never a torn table;
- readers resolve the highest committed manifest and see exactly the
  data directories it lists — snapshot isolation: an in-flight append
  is invisible until its manifest lands;
- every manifest records ``snapshot_id``, ``parent_id``, and the run's
  observed metrics, so the checkpoint chain is auditable
  (``SnapshotLog.history()``).

What is and is not verified in this sandbox: these semantics are
asserted by ``tests/test_pipeline_spark.py`` for the path branch, and
since round 3 the CATALOG branch is exercised for real too — the
``snap`` DSv2 catalog (``java/``, an offline stand-in for Iceberg with
the same manifest format as this module) lets
``tests/test_snapshot_catalog.py`` assert one committed snapshot id
per ``writeTo().append()`` through Spark's V2 write exec. The actual
iceberg-spark-runtime jar is unobtainable offline (BASELINE.md).

Scale note: the driver-side work per commit is one manifest read +
one file link — O(1) regardless of data size. Data files are written by
executors through the normal distributed parquet writer; nothing here
ever moves data through the driver.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class CommitConflict(Exception):
    """Another writer published this version first (caller retries)."""


class SnapshotLog:
    """Versioned-manifest table layout over a plain directory."""

    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "_snapshots")

    # -- read side -----------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.meta_dir):
            return []
        out = []
        for name in os.listdir(self.meta_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.json")

    def manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def latest(self) -> dict | None:
        """Highest committed manifest, or None for an empty table."""
        versions = self._versions()
        return self.manifest(versions[-1]) if versions else None

    def history(self) -> list[dict]:
        """All manifests oldest→newest (the auditable checkpoint chain)."""
        return [self.manifest(v) for v in self._versions()]

    def data_paths(self, manifest: dict | None = None) -> list[str]:
        m = manifest if manifest is not None else self.latest()
        if m is None:
            return []
        dirs = [os.path.join(self.root, d) for d in m["data_dirs"]]
        # legacy_files: plain-parquet outputs that predate the snapshot
        # log, folded into manifest v1 so they stay visible (see commit)
        return dirs + [os.path.join(self.root, f) for f in m.get("legacy_files", [])]

    def read(self, spark, version: int | None = None, merge_schema: bool = False):
        """DataFrame of the latest snapshot (snapshot-isolated: files
        not referenced by a committed manifest are never read).

        ``version`` time-travels to a specific committed manifest.
        ``merge_schema=True`` reconciles appends made with EVOLVED
        schemas (added columns read as NULL for older files) — Iceberg
        resolves this from table metadata for free; plain parquet needs
        the footer-merging scan, so it stays opt-in: at 100 TB you only
        pay it on tables that actually evolved."""
        m = self.manifest(version) if version is not None else None
        paths = self.data_paths(m)
        if not paths:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    # -- write side ------------------------------------------------------

    def new_data_dir(self) -> str:
        """Unique directory for one commit's data files (absolute)."""
        return os.path.join(self.root, "data", f"snap-{uuid.uuid4().hex}")

    def _publish(self, version: int, manifest: dict) -> None:
        os.makedirs(self.meta_dir, exist_ok=True)
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        try:
            # link(2) fails with EEXIST instead of overwriting: the
            # atomic publish primitive (rename would clobber a racing
            # winner's manifest)
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as exc:
            raise CommitConflict(f"v{version} already committed") from exc
        finally:
            os.unlink(tmp)

    def _legacy_files(self) -> list[str]:
        """Parquet part files sitting directly in the table root — a
        pre-snapshot-log (plain ``df.write.parquet``) output. Folded into
        manifest v1 so migrating a legacy directory never makes existing
        rows invisible (which would also re-extract their docs on
        resume)."""
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if name.startswith((".", "_")):
                continue  # _SUCCESS, .crc, _snapshots
            p = os.path.join(self.root, name)
            if os.path.isfile(p) and (name.endswith(".parquet") or name.startswith("part-")):
                out.append(name)
        return sorted(out)

    def commit(self, data_dir: str, metrics: dict | None = None,
               max_retries: int = 20) -> dict:
        """Publish ONE new snapshot whose data = parent's data + the new
        directory. Returns the committed manifest."""
        rel = os.path.relpath(data_dir, self.root)
        for _ in range(max_retries):
            parent = self.latest()
            version = (parent["version"] + 1) if parent else 1
            manifest = {
                "version": version,
                "snapshot_id": uuid.uuid4().hex,
                "parent_id": parent["snapshot_id"] if parent else None,
                "data_dirs": (parent["data_dirs"] if parent else []) + [rel],
                "operation": "append",
                "metrics": metrics or {},
                "committed_at_ms": int(time.time() * 1000),
            }
            if parent is None:
                legacy = self._legacy_files()
                if legacy:
                    manifest["legacy_files"] = legacy
            else:
                if parent.get("legacy_files"):
                    manifest["legacy_files"] = parent["legacy_files"]
            try:
                self._publish(version, manifest)
                return manifest
            except CommitConflict:
                continue  # re-read the new latest and retry on top
        raise CommitConflict(f"gave up after {max_retries} conflicts under {self.root}")

    def append(self, df, metrics: dict | None = None) -> dict:
        """Write ``df`` as data files + commit exactly one snapshot."""
        data_dir = self.new_data_dir()
        # mode("error"): the directory is uuid-fresh; failing loudly on a
        # collision beats silently merging two commits' files
        df.write.mode("error").parquet(data_dir)
        return self.commit(data_dir, metrics=metrics)

    def compact(self, spark, target_partitions: int = 1,
                metrics: dict | None = None) -> dict:
        """Rewrite the table's accumulated small data files into
        ``target_partitions`` files and commit ONE replacing snapshot —
        Iceberg's ``rewrite_data_files`` maintenance action. Long
        checkpoint chains append one directory per run; scan planning
        and open-file cost grow with file count, so periodic compaction
        is what keeps a 10^12-doc table readable.

        Unlike ``commit``, a replace must NOT retry past a concurrent
        append (retrying would silently drop the appended rows — the
        rewrite read never saw them). The commit validates that the
        parent observed at read time is still the latest and raises
        ``CommitConflict`` otherwise; the caller re-runs the compaction
        on the new state (same serializable-rewrite rule as Iceberg's
        action). Old snapshots still reference the old dirs for time
        travel until ``expire_snapshots`` + ``remove_orphans``.
        """
        parent = self.latest()
        if parent is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        df = spark.read.parquet(*self.data_paths(parent))
        data_dir = self.new_data_dir()
        df.repartition(target_partitions).write.mode("error").parquet(data_dir)
        return self._replace_commit(parent, data_dir, metrics, "compaction")

    def _replace_commit(self, parent: dict, data_dir: str,
                        metrics: dict | None, what: str) -> dict:
        """Shared serializable-replace tail for compact/merge: publish a
        snapshot whose data is ONLY ``data_dir``, at exactly
        parent+1 — a concurrent commit makes the publish fail (version
        taken / parent moved) instead of its rows being dropped. Legacy
        files are deliberately not carried: the rewrite read folded
        them into the new files."""
        manifest = {
            "version": parent["version"] + 1,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"],
            "data_dirs": [os.path.relpath(data_dir, self.root)],
            "operation": "replace",
            "metrics": metrics or {},
            "committed_at_ms": int(time.time() * 1000),
        }
        latest = self.latest()
        if latest["snapshot_id"] != parent["snapshot_id"]:
            raise CommitConflict(
                f"concurrent commit during {what}; re-run on the new state")
        self._publish(manifest["version"], manifest)
        return manifest

    def merge(self, spark, updates, key: str = "doc_id",
              metrics: dict | None = None) -> dict:
        """Copy-on-write MERGE (Iceberg ``MERGE INTO`` upsert): rows in
        ``updates`` replace current rows with the same ``key``; new keys
        append. One replacing snapshot — the resumable-correction shape
        (re-extract a batch of poisoned docs and publish atomically,
        readers never see a mix of old and new rows for one key).

        Same serializable rule as ``compact``: the rewrite read saw the
        parent snapshot, so the publish targets exactly parent+1 and a
        concurrent commit makes it fail with ``CommitConflict`` rather
        than silently dropping that commit's rows. An empty table just
        appends."""
        parent = self.latest()
        if parent is None:
            return self.append(updates, metrics=metrics)
        current = spark.read.parquet(*self.data_paths(parent))
        kept = current.join(updates.select(key).distinct(), key, "left_anti")
        merged = kept.unionByName(updates)
        data_dir = self.new_data_dir()
        merged.write.mode("error").parquet(data_dir)
        return self._replace_commit(parent, data_dir, metrics, "merge")

    # -- maintenance (Iceberg expire_snapshots / remove_orphan_files) ----

    def expire_snapshots(self, keep_last: int) -> list[int]:
        """Drop manifest versions older than the newest ``keep_last``
        (time travel to them ends; readers always resolve the latest
        manifest, so current reads are unaffected). Data stays: dirs are
        cumulative, every live dir is still listed by newer manifests.
        Bounds metadata growth on long checkpoint chains — the
        Iceberg ``expire_snapshots`` maintenance action. Returns the
        expired version numbers."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = self._versions()
        expired = versions[:-keep_last]
        for v in expired:
            os.unlink(self._manifest_path(v))
        return expired

    def orphan_dirs(self) -> list[str]:
        """Data directories not referenced by ANY committed manifest —
        crashed/aborted writers and losers of commit races leave these
        (never torn tables). Absolute paths, for inspection."""
        data_root = os.path.join(self.root, "data")
        if not os.path.isdir(data_root):
            return []
        live: set[str] = set()
        for m in self.history():
            for d in m["data_dirs"]:
                # normalize both top-level dirs and streaming epoch dirs
                live.add(os.path.normpath(os.path.join(self.root, d)))
        out = []
        for name in sorted(os.listdir(data_root)):
            p = os.path.normpath(os.path.join(data_root, name))
            if p in live:
                continue
            # a streaming run base dir is live if ANY of its epoch
            # subdirs is referenced
            if any(l.startswith(p + os.sep) for l in live):
                continue
            out.append(p)
        return out

    def remove_orphans(self) -> list[str]:
        """Delete unreferenced data dirs (Iceberg ``remove_orphan_files``).
        Safe by construction: a concurrent writer's dir only becomes
        referenced AFTER its manifest lands, so only run this when no
        write is in flight (same operational rule as Iceberg's action).
        Returns the removed paths."""
        import shutil

        removed = self.orphan_dirs()
        for p in removed:
            shutil.rmtree(p)
        return removed
