"""Bucketed (pre-partitioned) tables — co-located joins with NO shuffle.

The reference co-locates work by hashing keys across replicas at every
KEYBY edge (`wf/keyby_emitter.hpp:~150-170`) — partitioning is transient,
rebuilt per run. At rest, Spark can PERSIST that partitioning: writing both
sides of a recurring join bucketed by the join key lets every future join
read co-located buckets and skip the exchange entirely. At 100 TB the
shuffle is usually the join's dominant cost; for fact tables joined on the
same key daily (orders ⋈ lineitem on orderkey), bucketing amortizes one
write-time shuffle across every subsequent query.

Works through the session catalog (`saveAsTable` — bucket metadata lives in
the metastore; plain parquet paths cannot carry it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_cols`` into ``n_buckets``
    (optionally sorted within buckets — enables shuffle-free sort-merge).
    One shuffle now, zero on every subsequent co-bucketed join/agg."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables. With matching bucket specs the
    physical plan contains no Exchange on either side (verified by
    tests/test_plans-style assertions); Spark zips bucket i with bucket i."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
