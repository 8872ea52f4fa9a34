"""Per-document parser kernels (pure pandas/numpy, no pyspark)."""
