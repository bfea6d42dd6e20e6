"""Skew-mitigation utilities — the 100 TB insurance policy.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these explicit rewrites cover the two patterns AQE can't fix:
a single hot KEY inside one aggregation task, and a hot build-side key in
a shuffle join.

Both rewrites preserve results exactly (proved by the oracle-checked
``skew_salted_agg`` query) — salting is a physical transformation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random salt: phase 1 aggregates
    (key, salt) — spreading one hot key over ``salt_buckets`` tasks — and
    phase 2 combines the partials per key.

    ``partial_aggs`` must be combinable by ``final_aggs`` (sum→sum,
    count→sum, min→min, max→max; avg = sum+count then divide).
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed shuffle join: salt the big side randomly, replicate the small
    side across all salt values (explode), join on (key..., salt).

    Shuffle volume of the small side grows ×salt_buckets — use only when the
    small side is modest but too large to broadcast outright.
    """
    keys = list(on)
    b = big.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    # explode is a generator expression — no post-cast allowed; sequence of
    # int literals already yields array<int>
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = b.join(s, keys + ["_salt"], how)
    return out.drop("_salt")
