"""Structured Streaming front-end for the extraction pipeline.

The reference has no streaming surface (SURVEY.md §2.9); this is the
Spark-native continuous-ingest shape for the same kernel: new document
files landing in a directory (or an Iceberg/Kafka source in
production) flow through the identical ``mapInArrow`` extraction and
append to the output sink, with the streaming checkpoint providing
exactly-once resumability — a stronger form of the batch path's
anti-join resume (`pipeline.run_extraction`).

The extraction kernel is stateless per document, so no watermarks or
stateful operators are needed: one doc in → one extracted row out,
regardless of arrival order.
"""

from __future__ import annotations

from .pipeline import extract
from .schema import DOCUMENTS_SCHEMA


def read_document_stream(spark, input_path: str, max_files_per_trigger: int | None = None):
    """File-source stream of documents rows (parquet dirs; an Iceberg
    streaming read drops in behind the same schema)."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def dedup_stream(docs, watermark_delay: str = "1 hour"):
    """Cross-micro-batch exact dedup for continuous ingest: at-least-once
    sources (file re-delivery, Kafka replays) re-ship documents, and a
    re-extracted doc_id would double rows in the sink. State is keyed on
    doc_id and bounded by the watermark (``dropDuplicatesWithinWatermark``):
    a duplicate arriving within ``watermark_delay`` of first sight is
    dropped; state older than the watermark is evicted, so the state
    store never grows with the corpus — the 100 TB-stream shape (an
    unbounded ``dropDuplicates`` would hold every key forever).
    """
    from pyspark.sql import functions as F

    return (
        docs.withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["doc_id"])
        .drop("ingest_ts")
    )


def windowed_ingest_metrics(df, event_ts_col: str = "event_ts",
                            window_size: str = "1 minute",
                            watermark_delay: str = "2 minutes"):
    """Event-time windowed ingest metrics with bounded late-data state —
    the watermark + windowed-agg shape for continuous monitoring of a
    document stream: per tumbling window, arriving docs and span
    volume. In append output mode a window emits exactly once, when the
    watermark passes its end; rows later than ``watermark_delay`` are
    dropped (the state store stays bounded: open windows only, never
    the stream's history). Feed any streaming DataFrame carrying an
    event-time column and a ``n_spans`` count column."""
    from pyspark.sql import functions as F

    return (
        df.withWatermark(event_ts_col, watermark_delay)
        .groupBy(F.window(F.col(event_ts_col), window_size))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_spans").cast("bigint").alias("n_spans"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_docs", "n_spans",
        )
    )


def start_extraction_stream(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    flavor: str = "lattice",
    available_now: bool = True,
    salt_partitions: int | None = None,
    fail_fast: bool = False,
    dedup_within: str | None = None,
    **kwargs,
):
    """documents files → (optional cross-batch dedup) → extract →
    sink append, checkpointed.

    Sink: a catalog TABLE identifier streams through the DSv2 streaming
    write (the `snap` snapshot catalog commits ONE idempotent snapshot
    per micro-batch epoch — the Iceberg streaming-sink shape; see
    java/SnapshotCatalog); a PATH appends parquet files. Both get
    exactly-once from the streaming checkpoint.

    ``available_now=True`` drains the current backlog and stops (batch
    catch-up semantics); ``False`` runs continuously per micro-batch.
    ``dedup_within``: watermark delay for cross-batch doc_id dedup
    (None = off). Returns the StreamingQuery.
    """
    from .pipeline import is_table_identifier

    docs = read_document_stream(spark, input_path)
    if dedup_within is not None:
        docs = dedup_stream(docs, watermark_delay=dedup_within)
    extracted = extract(
        docs, flavor=flavor, salt_partitions=salt_partitions, fail_fast=fail_fast, **kwargs
    )
    writer = extracted.writeStream.option(
        "checkpointLocation", checkpoint_path
    ).outputMode("append")
    if available_now:
        writer = writer.trigger(availableNow=True)
    if is_table_identifier(output_path):
        return writer.toTable(output_path)
    return writer.format("parquet").option("path", output_path).start()
