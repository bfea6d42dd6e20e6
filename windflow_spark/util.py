"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    arrives in fewer partitions. CPU-heavy per-row expressions (hashing,
    shingling, decoding) otherwise run single-task on small files; at real
    scale the scan already yields ≥n partitions and this is a no-op."""
    n = n or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
