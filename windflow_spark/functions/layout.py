"""Z-order (Morton) data layout: interleave the bits of two clustering
dimensions so that sorting by the interleaved value co-locates rows that
are close in BOTH dimensions — the multi-dimensional clustering behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``. A table laid out this way gives
parquet row-group min/max pruning on 2-D predicates (key range AND time
range) where a single-column sort can only prune one dimension.

The z-value is pure JVM bit arithmetic (an unrolled OR chain inside
whole-stage codegen — no UDF), and the layout step is
``repartitionByRange + sortWithinPartitions`` on it: one range exchange,
the same cost as any global sort, paid once at write time. The payoff is
read-side: tests/test_layout.py measures row-group pruning on the same
data written date-sorted vs z-sorted.

No reference analog (WindFlow has no storage layer); this is the
write-path sibling of the scan-side pruning the repo already pins
(PushedFilters / partition pruning in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 18) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: x's bit i lands at 2i, y's at 2i+1. Callers map
    their dimensions onto a bounded non-negative integer domain first
    (day index, id, bucketed value); values ≥ 2^bits simply alias into
    the top cells, which degrades locality but never correctness."""
    xl = x.cast("long")
    yl = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(xl.bitwiseAND(F.lit(1 << i)), i))
            .bitwiseOR(F.shiftleft(yl.bitwiseAND(F.lit(1 << i)), i + 1))
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = 18) -> str:
    """The identical Morton interleave as engine-portable SQL text (both
    Spark SQL and DuckDB parse it) — used by oracles and by engines that
    take expression strings."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} & {1 << i}) << {i})")
        terms.append(f"(({y} & {1 << i}) << {i + 1})")
    return " | ".join(terms)


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, bits: int = 18, n_files: int | None = None
) -> DataFrame:
    """Return ``df`` physically ordered by the z-value of
    (``x_col``, ``y_col``): one range repartition (``n_files`` output
    partitions — at a real warehouse this is the target file count) plus
    a within-partition sort, ready for ``write.parquet``. The helper
    column is dropped; only the ordering survives — which is the point."""
    z = zvalue(F.col(x_col), F.col(y_col), bits).alias("_z")
    with_z = df.withColumn("_z", z)
    parted = (
        with_z.repartitionByRange(n_files, "_z")
        if n_files
        else with_z.repartitionByRange("_z")
    )
    return parted.sortWithinPartitions("_z").drop("_z")
