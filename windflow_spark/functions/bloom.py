"""Bloom-filter semi-join reduction: build a fixed-size bit-array filter
over a selective build side's join keys, broadcast it, and pre-filter the
probe (fact) side BEFORE its shuffle — the dynamic-filtering technique
Trino/Snowflake apply to every selective join, and what Spark's own
runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter.*) injects
when statistics justify it. This module is the EXPLICIT form for when the
optimizer can't see the selectivity (derived build sides, UDF filters,
thresholds tuned by hand).

Everything is JVM column arithmetic — no UDFs, no driver collection: the
filter is built by one aggregation over the build side's hash positions
(≤ m_bits/64 longs), carried as a ONE-ROW broadcast, and probed with O(k)
bit tests per row. False positives only widen the pre-filter; the real
join behind it keeps the result exact, so correctness is independent of
m_bits/k while the shuffle volume shrinks by roughly the join
selectivity. At 100 TB the win is the difference between shuffling the
whole fact table into a sort-merge join and shuffling only the ~matching
fraction (measured on the skewed 10× probe in SCALE.md).

Semantics reference: same contract as WindFlow's filter-before-exchange
chaining (operators compose ahead of the shipper, wf/builders.hpp) — the
Spark-native expression is a pushed predicate that happens to be a
membership sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Aggregate ``df[key_col]`` into a one-row bloom filter frame with a
    single ``bloom`` column: array<long> of ``m_bits/64`` words. The k
    hash positions per key come from seeded xxhash64; distinct positions
    are OR-folded into words by one bounded aggregation (≤ m_bits rows),
    and the dense word array is assembled with transform(sequence) — no
    driver round-trip."""
    assert m_bits % 64 == 0, "m_bits must be a multiple of 64"
    n_words = m_bits // 64
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("_pos")
    ).distinct()
    words = pos.groupBy(F.expr("cast(_pos div 64 as int)").alias("_w")).agg(
        F.expr("bit_or(shiftleft(1L, cast(_pos % 64 as int)))").alias("_bits")
    )
    one = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_w"), F.col("_bits")))
        ).alias("_m")
    )
    return one.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Filter ``probe`` to rows whose ``key_col`` MIGHT be in the filter
    (false positives possible, false negatives impossible — same m_bits/k
    as the build is the caller's contract). The one-row ``bloom`` frame
    rides a broadcast nested loop (1×N, O(N) — the right plan for
    attaching a scalar); each row then runs k O(1) word-index + bit-test
    expressions, all inside codegen. Follow with the real join for exact
    results."""
    probed = probe.crossJoin(F.broadcast(bloom)).withColumn(
        "_bf_key", F.col(key_col)
    )
    tests = []
    for i in range(k):
        p = f"pmod(xxhash64(_bf_key, {i}), {m_bits}L)"
        tests.append(
            f"(element_at(bloom, cast(({p}) div 64 as int) + 1)"
            f" & shiftleft(1L, cast(({p}) % 64 as int))) != 0"
        )
    return probed.filter(F.expr(" AND ".join(tests))).drop("bloom", "_bf_key")
