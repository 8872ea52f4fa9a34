"""Spark orchestration: documents DataFrame → extracted DataFrame.

Design (SURVEY.md §3.4, revised): the input is already one row per
document, so no ``groupBy`` is needed at all — the per-doc kernel runs
under ``mapInArrow`` directly over the scan partitions, avoiding the
group-exchange shuffle the reference-shaped ``applyInPandas`` plan
would pay. The only optional shuffle is an explicit salted
``repartition`` to spread pathological multi-table documents
(north_rule skew requirement); AQE handles the rest.

Scale posture:
- Catalyst prunes to (doc_id, spans) at the parquet/Iceberg scan.
- One Arrow batch carries many docs; all JVM↔Python traffic is
  Arrow-batched. No per-row Python at the Spark API level.
- Per-doc failures are captured into ``lineage.error`` instead of
  failing the task — at 10^12 docs, a poison document must not kill
  the job (``fail_fast=True`` restores strictness for tests).
"""

from __future__ import annotations

import time
import traceback
from collections.abc import Iterator

import pandas as pd

from .config import LatticeConfig, StreamConfig, make_config
from .extract_doc import extract_document
from .schema import EXTRACTED_SCHEMA, KERNEL_VERSION


def synthesize_documents(source_df, key_col: str = "doc_id", families: list[str] | None = None):
    """Distributed fixture-corpus synthesis: one span-document per input
    row, deterministically derived from the row's key (FIXTURES.md §4).
    Generation happens on executors inside Arrow batches — no
    driver-side corpus materialization at any scale."""
    from .schema import DOCUMENTS_SCHEMA

    ensure_shipped(source_df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from camelot_spark import fixtures as fx

        for pdf in batches:
            out = {"doc_id": [], "spans": []}
            for k in pdf[key_col].astype(str):
                b = fx.builder_for(k, families=families)
                out["doc_id"].append(b.doc_id)
                out["spans"].append(
                    [{"kind": s["kind"], "text": s["text"],
                      "media_ref": s["media_ref"], "offset": s["offset"]}
                     for s in b.spans]
                )
            yield pd.DataFrame(out)

    return source_df.select(key_col).mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def _results_to_arrow(results: list[tuple], flavor: str, partition_id: int, attempt: int):
    """Build the output RecordBatch columnar-ly: flat value arrays +
    offsets → ListArray(StructArray), skipping the pandas object path
    (which re-boxes every span dict — measured ~2x per-doc overhead)."""
    import pyarrow as pa

    doc_ids, n_tables, accs, wss = [], [], [], []
    sp_kind, sp_text, sp_media, sp_order = [], [], [], []
    sp_offsets = [0]
    tb_order, tb_acc, tb_ws, tb_nr, tb_nc = [], [], [], [], []
    tb_x0, tb_y0, tb_x1, tb_y1 = [], [], [], []
    tb_offsets = [0]
    ln_elapsed, ln_nspans, ln_err = [], [], []

    for doc_id, res, n_in, elapsed, err in results:
        doc_ids.append(doc_id)
        n_tables.append(res["n_tables"])
        accs.append(res["accuracy"])
        wss.append(res["whitespace"])
        for k, t, m, o in res["spans"]:
            sp_kind.append(k)
            sp_text.append(t)
            sp_media.append(m)
            sp_order.append(o)
        sp_offsets.append(len(sp_kind))
        for t in res["tables"]:
            tb_order.append(t.order)
            tb_acc.append(t.accuracy)
            tb_ws.append(t.whitespace)
            tb_nr.append(t.nrows)
            tb_nc.append(t.ncols)
            tb_x0.append(t.bbox[0])
            tb_y0.append(t.bbox[1])
            tb_x1.append(t.bbox[2])
            tb_y1.append(t.bbox[3])
        tb_offsets.append(len(tb_order))
        ln_elapsed.append(elapsed)
        ln_nspans.append(n_in)
        ln_err.append(err)

    n = len(doc_ids)
    spans = pa.ListArray.from_arrays(
        pa.array(sp_offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(sp_kind, pa.string()),
                pa.array(sp_text, pa.string()),
                pa.array(sp_media, pa.string()),
                pa.array(sp_order, pa.int32()),
            ],
            names=["kind", "text", "media_ref", "order"],
        ),
    )
    tables = pa.ListArray.from_arrays(
        pa.array(tb_offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(tb_order, pa.int32()),
                pa.array(tb_acc, pa.float64()),
                pa.array(tb_ws, pa.float64()),
                pa.array(tb_nr, pa.int32()),
                pa.array(tb_nc, pa.int32()),
                pa.array(tb_x0, pa.float64()),
                pa.array(tb_y0, pa.float64()),
                pa.array(tb_x1, pa.float64()),
                pa.array(tb_y1, pa.float64()),
            ],
            names=["order", "accuracy", "whitespace", "nrows", "ncols",
                   "x0", "y0", "x1", "y1"],
        ),
    )
    lineage = pa.StructArray.from_arrays(
        [
            pa.array([partition_id] * n, pa.int32()),
            pa.array([KERNEL_VERSION] * n, pa.string()),
            pa.array([flavor] * n, pa.string()),
            pa.array([attempt] * n, pa.int32()),
            pa.array(ln_nspans, pa.int32()),
            pa.array(ln_elapsed, pa.int64()),
            pa.array(ln_err, pa.string()),
        ],
        names=["partition_id", "kernel_version", "flavor", "attempt",
               "n_input_spans", "elapsed_us", "error"],
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array(doc_ids, pa.string()),
            spans,
            pa.array(n_tables, pa.int32()),
            pa.array(accs, pa.float64()),
            pa.array(wss, pa.float64()),
            tables,
            lineage,
        ],
        names=["doc_id", "spans", "n_tables", "accuracy", "whitespace",
               "tables", "lineage"],
    )


def _run_docs(docs_iter, cfg, fail_fast) -> list[tuple]:
    """Execute the kernel over (doc_id, span-list) pairs, capturing
    per-doc errors unless fail_fast (poison docs must not kill the job)."""
    import warnings

    out = []
    for doc_id, spans in docs_iter:
        t0 = time.monotonic_ns()
        err = None
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                res = extract_document(spans, cfg)
        except Exception:
            if fail_fast:
                raise
            err = traceback.format_exc(limit=3)
            res = {"spans": [], "tables": [], "n_tables": 0,
                   "accuracy": None, "whitespace": None}
        elapsed = (time.monotonic_ns() - t0) // 1000
        out.append((doc_id, res, len(spans), elapsed, err))
    return out


def _extract_arrow_iter(batches, cfg, fail_fast, docs_of=None):
    """mapInArrow kernel: RecordBatch in → RecordBatch out, columnar on
    both sides. ``docs_of(batch)`` yields (doc_id, span-list); default
    reads (doc_id, spans) columns."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    partition_id = ctx.partitionId() if ctx else -1
    attempt = ctx.attemptNumber() if ctx else 0
    flavor = "stream" if isinstance(cfg, StreamConfig) else "lattice"

    def default_docs(batch):
        ids = batch.column("doc_id").to_pylist()
        spans = batch.column("spans").to_pylist()
        return zip(ids, spans)

    docs_of = docs_of or default_docs
    for batch in batches:
        results = _run_docs(docs_of(batch), cfg, fail_fast)
        yield _results_to_arrow(results, flavor, partition_id, attempt)


def synthesize_and_extract(
    keys_df,
    flavor: str,
    families: list[str] | None = None,
    key_col: str = "doc_id",
    fail_fast: bool = False,
    **kwargs,
):
    """Fused corpus path: fixture synthesis + extraction in ONE
    mapInArrow stage.

    The two-stage form (synthesize_documents → extract) pays a full
    Arrow round-trip of the span structs through the JVM between the
    stages; for the synthetic bench/test corpus that intermediate is
    never needed, and fusing halves the JVM↔Python traffic. The
    production path (real documents scanned from Iceberg/parquet)
    still uses ``extract`` directly.
    """
    ensure_shipped(keys_df.sparkSession)
    cfg = make_config(flavor, **kwargs)

    def gen(batches):
        from camelot_spark import fixtures as fx

        def docs(batch):
            for k in batch.column(0).to_pylist():
                b = fx.builder_for(str(k), families=families, raw=True)
                yield b.doc_id, b.raw_spans()

        yield from _extract_arrow_iter(batches, cfg, fail_fast, docs_of=docs)

    return keys_df.select(key_col).mapInArrow(gen, schema=EXTRACTED_SCHEMA)


_SHIPPED_SESSIONS: set[int] = set()


def ensure_shipped(spark) -> None:
    """Ship the ``camelot_spark`` package to executors via addPyFile.

    The production deployment is ``spark-submit --py-files
    camelot_spark.zip`` (north_rule); this makes ad-hoc sessions
    (notebooks, tests launched from any cwd) behave the same way.
    """
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    import os
    import shutil
    import tempfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isdir(pkg_root):
        # already imported from a --py-files zip: shipped by spark-submit
        _SHIPPED_SESSIONS.add(key)
        return
    base = os.path.join(tempfile.mkdtemp(prefix="camelot_spark_ship_"), "camelot_spark")
    zip_path = shutil.make_archive(base, "zip", root_dir=pkg_root, base_dir="camelot_spark")
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)


def extract(
    documents,
    flavor: str = "lattice",
    salt_partitions: int | None = None,
    salt: int = 0,
    fail_fast: bool = False,
    **kwargs,
):
    """documents(doc_id, spans) → extracted DataFrame (EXTRACTED_SCHEMA).

    ``salt_partitions``: explicit salted repartition width; None keeps
    the scan partitioning (no shuffle at all — preferred when the
    source is already well-sized). Docs are atomic units, so salting
    only balances doc *count/size* across partitions.
    """
    from pyspark.sql import functions as F

    ensure_shipped(documents.sparkSession)
    cfg = make_config(flavor, **kwargs)
    df = documents.select("doc_id", "spans")
    if salt_partitions:
        df = df.repartition(
            salt_partitions, F.pmod(F.xxhash64("doc_id", F.lit(salt)), F.lit(salt_partitions))
        )
    return df.mapInArrow(
        lambda it: _extract_arrow_iter(it, cfg, fail_fast), schema=EXTRACTED_SCHEMA
    )


def is_table_identifier(target: str) -> bool:
    """One rule for the table-vs-path decision, shared by every reader
    and writer: a target with no path separator is a catalog table
    identifier (Iceberg when the catalog is configured, the session
    catalog otherwise); anything containing '/' is a filesystem path.
    Use './name' for a relative parquet directory."""
    return "/" not in target


def read_extracted(spark, target: str):
    """Read an extraction output written by ``run_extraction``: catalog
    table, snapshot-log dir, or plain parquet dir (legacy outputs)."""
    if is_table_identifier(target):
        return spark.read.table(target)
    from .snapshots import SnapshotLog

    log = SnapshotLog(target)
    if log.latest() is not None:
        return log.read(spark)
    return spark.read.parquet(target)


def run_extraction(
    spark,
    documents,
    output_path: str,
    flavor: str = "lattice",
    resume: bool = True,
    salt_partitions: int | None = None,
    fail_fast: bool = False,
    **kwargs,
):
    """Checkpointed job: extract → append ONE snapshot to
    ``output_path`` — an Iceberg/DSv2 ``writeTo(...).append()`` commit
    for catalog tables, a ``SnapshotLog`` commit (atomic versioned
    manifest over parquet, same semantics — see ``snapshots.py``) for
    filesystem paths — with anti-join resume against the last committed
    snapshot and observed per-run metrics.

    Returns the observation metrics dict for the run (doc/table counts,
    error count) — the per-partition lineage rides on every row, and
    the path branch also records the metrics in the snapshot manifest.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    is_table = is_table_identifier(output_path)

    docs = documents
    if resume:
        try:
            done = read_extracted(spark, output_path).select("doc_id")
            # plain left_anti: AQE picks broadcast when `done` is small;
            # at 10^12 docs a forced broadcast would be wrong.
            docs = documents.join(done, "doc_id", "left_anti")
        except Exception:
            pass  # first run: nothing to resume from

    result = extract(docs, flavor=flavor, salt_partitions=salt_partitions,
                     fail_fast=fail_fast, **kwargs)
    obs = Observation("extract_metrics")
    observed = result.observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tables").alias("tables"),
        F.avg("accuracy").alias("avg_accuracy"),
        F.sum(F.when(F.col("lineage.error").isNotNull(), 1).otherwise(0)).alias("errors"),
    )
    if is_table:
        # DataSource V2: each append commits one snapshot (the Iceberg
        # checkpoint unit of the north_rule). Verified for real against
        # the `snap` DSv2 catalog (java/SnapshotCatalog, the offline
        # Iceberg stand-in) in tests/test_snapshot_catalog.py. The
        # plain session catalog registers v1 tables, which DSv2 refuses
        # at analysis time — fall back to the v1 writer there.
        from pyspark.errors import AnalysisException

        if spark.catalog.tableExists(output_path):
            try:
                observed.writeTo(output_path).append()
            except AnalysisException:
                observed.write.mode("append").saveAsTable(output_path)
        else:
            try:
                observed.writeTo(output_path).create()
            except AnalysisException:
                observed.write.saveAsTable(output_path)
        return obs.get
    from .snapshots import SnapshotLog

    log = SnapshotLog(output_path)
    data_dir = log.new_data_dir()
    observed.write.mode("error").parquet(data_dir)
    metrics = {k: (float(v) if v is not None else None) for k, v in dict(obs.get).items()}
    log.commit(data_dir, metrics=metrics)
    return obs.get
