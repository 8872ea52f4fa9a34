"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — the at-scale companions to the extraction engine.

Each operator is a DataFrame→DataFrame function built from built-in
``pyspark.sql.functions`` (JVM-side, codegen-friendly); Python appears
only in Arrow-batched ``mapInPandas`` where semantics require it
(multimodal decode). Deterministic outputs, integer-typed where a
DuckDB oracle must hash-match.
"""

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition when the scan is under-partitioned.

    Small local parquet files arrive as a single input split, which
    serializes CPU-heavy expression work (shingling, minhashing) onto
    one core before the first shuffle. On a real cluster the scan is
    already split by ``spark.sql.files.maxPartitionBytes``, so this is
    a no-op there — the guard keeps us from paying a gratuitous
    full-width shuffle at 100 TB.

    The under-partitioned check counts scan input files (a FileIndex
    listing, no job/RDD materialization) rather than
    ``df.rdd.getNumPartitions()``, which forced a plan-to-RDD
    conversion on every query.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file-backed plans: nothing to spread
        n_files = 0
    if 0 < n_files < target:
        return df.repartition(target)
    return df
