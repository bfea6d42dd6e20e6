"""Change-data-capture merge: latest-wins upsert of a change stream into a
base snapshot (the MERGE INTO / SCD type-1 primitive).

No reference analog — WindFlow stops at stream operators; this is the
warehouse-side sibling of operators/timeseries.scd2_intervals: SCD2 keeps
every version as a validity interval, the CDC upsert keeps only the FINAL
state after folding a batch of changes (inserts, updates, deletes) into a
snapshot.

Scale shape: one window pass picks the latest change per key (row_number
over the change table only — the small side), then ONE full-outer
co-partitioned equi-join applies it to the base; the window's hash exchange
on the key is reused by the join, so the base snapshot is shuffled exactly
once and never sorted globally. Deletes drop in the same pass (no second
scan). At 100 TB the base side stays partition-pruned if the snapshot is
stored partitioned by key-hash, which is exactly the layout this operator
preserves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def upsert_latest(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Fold ``changes`` into ``base`` with latest-wins semantics.

    ``changes`` carries the key, an op column (``delete_op`` means delete,
    anything else upserts), and the new values for every non-key column it
    shares with ``base``. The winning change per key is the LAST one by
    ``order_cols`` (ties must be broken by a unique column — pass it last).

    Result columns: ``base``'s columns (shared columns take the change's
    value where a change won) plus ``_merge_src`` in
    {'base','updated','inserted'}. Deleted keys are absent.
    """
    w = W.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", *[c for c in order_cols if c != key])
    )
    shared = [c for c in latest.columns if c in base.columns and c != key]
    lat = latest.select(
        F.col(key).alias("_k"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in shared],
    )
    merged = base.join(lat, base[key] == lat["_k"], "full_outer").filter(
        # a winning delete removes the key whether or not it exists in base
        (F.col("_op").isNull()) | (F.col("_op") != F.lit(delete_op))
    )
    out_cols = []
    for c in base.columns:
        if c == key:
            out_cols.append(F.coalesce(F.col(key), F.col("_k")).alias(key))
        elif c in shared:
            out_cols.append(F.coalesce(F.col(f"_c_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    src = (
        F.when(F.col("_op").isNull(), F.lit("base"))
        .when(F.col(key).isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
    )
    return merged.select(*out_cols, src.alias("_merge_src"))
