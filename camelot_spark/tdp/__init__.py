"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — the at-scale companions to the extraction engine.

Each operator is a DataFrame→DataFrame function built from built-in
``pyspark.sql.functions`` (JVM-side, codegen-friendly); Python appears
only in Arrow-batched ``mapInPandas`` where semantics require it
(multimodal decode). Deterministic outputs, integer-typed where a
DuckDB oracle must hash-match.
"""
