"""Benchmark decontamination: flag corpus documents whose word-n-gram
overlap with a benchmark/eval set exceeds a threshold — the standard
train/test-leak guard in large-scale training-data pipelines.

Scale shape (why this survives 100 TB): the benchmark side is small by
definition, so its distinct n-grams are aggregated into ONE array row
and broadcast; every corpus document then computes
``size(array_intersect(doc_ngrams, bench_ngrams))`` inside whole-stage
codegen on the scan — ZERO shuffle on the corpus, no explode of corpus
n-grams, no join. The only shuffle is the benchmark-side distinct
(bounded by the benchmark's vocabulary).

The synthetic "benchmark" is a deterministic slice of the corpus itself
(doc_id % 50 == 0) so the DuckDB oracle reproduces it exactly; a real
deployment passes an actual eval-set DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame | None = None,
    n: int = 3,
    threshold: int = 5,
) -> DataFrame:
    """(doc_id, overlap, contaminated) per corpus doc.

    ``overlap`` = number of distinct word-``n``-grams shared with the
    benchmark set; ``contaminated`` = 1 when overlap ≥ threshold.
    Benchmark docs themselves are excluded from the output (they would
    trivially self-match).
    """
    # The %50 slice is ONLY the synthetic default benchmark; a caller's
    # real eval set shares no doc_ids with the corpus by construction,
    # so filtering the corpus there would silently drop 2% of real docs
    # from decontamination (round-2 advice).
    use_default = benchmark is None
    if use_default:
        benchmark = documents.where(F.col("doc_id") % 50 == 0)
    corpus = documents.where(F.col("doc_id") % 50 != 0) if use_default else documents
    # broadcast-hash shape, not per-row array_intersect: the semi-join
    # builds ONE hash of the benchmark n-grams per task, where an
    # intersect against a broadcast ARRAY re-hashes ~|bench| entries on
    # every row (measured 2.3x at sf0.1; also the only shape that holds
    # when the benchmark outgrows a single array). The corpus-side
    # explode is a Generate on the scan — the only shuffle carries
    # (doc_id, partial count).
    bench_grams = benchmark.select(
        F.explode(_shingles(F.col("text"), n)).alias("g")
    ).distinct()
    grams = corpus.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(_shingles(F.col("text"), n)).alias("g"),
    )
    hits = (
        grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap"))
    )
    base = corpus.select(F.col("doc_id").cast("bigint").alias("doc_id"))
    return (
        base.join(hits, "doc_id", "left")
        .select("doc_id", F.coalesce("overlap", F.lit(0)).cast("bigint").alias("overlap"))
        .select(
            "doc_id",
            "overlap",
            F.when(F.col("overlap") >= threshold, 1).otherwise(0).cast("int").alias("contaminated"),
        )
    )


DECONTAMINATE_SQL = """
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)])
         ELSE [] END AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
bench AS (
  SELECT list(DISTINCT g) AS barr
  FROM (SELECT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0))
SELECT doc_id,
       CAST(len(list_intersect(s, barr)) AS BIGINT) AS overlap,
       CAST(CASE WHEN len(list_intersect(s, barr)) >= 5 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
FROM sh, bench
WHERE doc_id % 50 <> 0
"""
