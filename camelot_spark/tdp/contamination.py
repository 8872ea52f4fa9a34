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


def _default_split(documents: DataFrame, benchmark: DataFrame | None):
    """(benchmark, corpus) for both decontamination variants. The %50
    slice is ONLY the synthetic default benchmark; a caller's real eval
    set shares no doc_ids with the corpus by construction, so filtering
    the corpus there would silently drop 2% of real docs from
    decontamination (round-2 advice). One definition so the exact and
    Bloom operators can never decontaminate different corpora."""
    if benchmark is None:
        return (documents.where(F.col("doc_id") % 50 == 0),
                documents.where(F.col("doc_id") % 50 != 0))
    return benchmark, documents


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
    benchmark, corpus = _default_split(documents, benchmark)
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


_BLOOM_M = 65536  # filter bits
_BLOOM_K = 3      # hashes per gram
_POLY_M = 1_000_000_007


def _gram_hash(col):
    # portable polynomial fold over the FULL gram (the minhash twin's
    # 8-char prefix fold is fine for banding, where collisions only
    # inflate candidates — here a prefix fold collapsed this corpus's
    # shared-prefix grams to one hash and made the filter useless)
    from .hashing import char_fold

    return char_fold(col)


def _bloom_positions(h):
    # k positions per gram: ((h·(A+j) + B·(j+1)) mod P) mod m with P a
    # large prime FIRST — reducing mod m directly would make every
    # position an affine function of (h mod m), i.e. one m-ary
    # fingerprint shared by all k hashes (measured 20x the theoretical
    # FP rate); the prime mix decorrelates them
    return F.transform(
        F.sequence(F.lit(0), F.lit(_BLOOM_K - 1)),
        lambda j: ((h * (F.lit(2654435761) + j.cast("long"))
                    + F.lit(40503) * (j.cast("long") + 1))
                   % _POLY_M) % _BLOOM_M,
    )


def decontaminate_bloom(
    documents: DataFrame,
    benchmark: DataFrame | None = None,
    n: int = 3,
    threshold: int = 5,
) -> DataFrame:
    """Bloom-filter decontamination — the broadcast-SCALE variant of
    ``decontaminate``: instead of broadcasting the benchmark's distinct
    n-gram STRINGS (which grows with the eval suite), aggregate them
    into a fixed m-bit Bloom filter (m=65536, k=3 — ~2700 set bits for the
    sf0.01 benchmark, fill 0.04, per-gram FP ~7e-5) and flag corpus docs
    whose count of filter-passing distinct grams reaches the threshold.

    Scale shape: the filter build is a bounded distinct over k·|bench
    grams| positions; the corpus side is scan-local codegen against the
    ONE broadcast filter row — the only corpus shuffle carries (doc_id,
    partial count). False positives are a DETERMINISTIC function of the
    integer hash family, so the DuckDB twin reproduces the exact same
    approximate decisions — the approximation is cross-engine-pinned,
    not fuzzed.

    Output: (doc_id, overlap_bloom, contaminated) over the
    non-benchmark corpus, like ``decontaminate``."""
    benchmark, corpus = _default_split(documents, benchmark)

    set_bits = (
        benchmark.select(F.explode(_shingles(F.col("text"), n)).alias("g"))
        .distinct()
        .select(F.explode(_bloom_positions(_gram_hash(F.col("g")))).alias("pos"))
        .distinct()
    )
    # ONE row: m booleans (the filter), assembled by a numpy scatter in
    # a single-partition mapInPandas — input is <= m position rows by
    # construction. (The first cut built this with
    # transform(sequence(0, m-1), i -> element_at(position_map, i));
    # Spark maps are scanned LINEARLY per lookup, so that was
    # m x |positions| ≈ 8e8 comparisons in one task — 80 s at sf0.1.
    # The scatter is O(m).)
    def _build_filter(batches):
        import numpy as np
        import pandas as pd

        bf = np.zeros(_BLOOM_M, dtype=bool)
        for pdf in batches:
            bf[pdf["pos"].to_numpy()] = True
        yield pd.DataFrame({"bf": [bf.tolist()]})

    filter_row = set_bits.coalesce(1).mapInPandas(
        _build_filter, "bf array<boolean>")

    grams = corpus.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(_shingles(F.col("text"), n)).alias("g"),
    ).crossJoin(F.broadcast(filter_row))
    passes = F.aggregate(
        _bloom_positions(_gram_hash(F.col("g"))),
        F.lit(True),
        lambda acc, pos: acc & F.element_at(F.col("bf"), pos.cast("int") + 1),
    )
    hits = (
        grams.where(passes)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap_bloom"))
    )
    base = corpus.select(F.col("doc_id").cast("bigint").alias("doc_id"))
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("overlap_bloom", F.lit(0)).cast("bigint")
            .alias("overlap_bloom"),
            F.when(F.coalesce("overlap_bloom", F.lit(0)) >= threshold, 1)
            .otherwise(0).cast("int").alias("contaminated"),
        )
    )


DECONTAMINATE_BLOOM_SQL = f"""
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)])
         ELSE [] END AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
gh AS (
  SELECT doc_id, g,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(g, ''), c -> CAST(ord(c) AS BIGINT))),
           (a, b) -> (a * 31 + b) % {_POLY_M}) AS h
  FROM (SELECT doc_id, unnest(s) AS g FROM sh)),
bset AS (
  SELECT list(DISTINCT (h * (2654435761 + j.j) + 40503 * (j.j + 1)) % {_POLY_M} % {_BLOOM_M}) AS bits
  FROM gh, range(0, {_BLOOM_K}) j(j) WHERE doc_id % 50 = 0),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS overlap_bloom
  FROM gh, bset
  WHERE doc_id % 50 <> 0
    AND list_has_all(bits,
          [(h * (2654435761 + jj) + 40503 * (jj + 1)) % {_POLY_M} % {_BLOOM_M}
           FOR jj IN range(0, {_BLOOM_K})])
  GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(h.overlap_bloom, 0) AS BIGINT) AS overlap_bloom,
       CAST(CASE WHEN COALESCE(h.overlap_bloom, 0) >= 5 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
LEFT JOIN hits h USING (doc_id)
"""
