"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    arrives in fewer partitions. CPU-heavy per-row expressions (hashing,
    shingling, decoding) otherwise run single-task on small files; at real
    scale the scan already yields >= n input splits and this is a no-op.

    Gated on the scan's input-file count (cheap, plan-side) instead of
    ``df.rdd.getNumPartitions()`` — touching ``.rdd`` forces a plan->RDD
    conversion at plan time and is invalid on streaming frames. One file can
    still split into many scan partitions (maxPartitionBytes), so this gate
    only ever errs toward an extra round-robin shuffle ahead of a CPU-bound
    stage, where the shuffle is cheap relative to the per-row work.
    """
    spark = df.sparkSession
    n = n or spark.sparkContext.defaultParallelism
    if df.isStreaming:
        return df
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) >= n:
        return df
    return df.repartition(n)
