"""Behavioral analytics over event streams: ordered-funnel conversion and
cohort retention — the classic product-analytics queries a stream engine's
users run downstream of windows/sessions (no reference counterpart; the
reference's §2.11 UDF surface stops at per-window functors).

Scale shape: both operators stay on (user, bucket/stage) aggregates.
The funnel chain joins stage frames on the user key only — every stage
reuses the same hash partitioning, so K stages cost K filtered scans +
K co-partitioned joins, never a cross product; per-stage scans push the
event-type filter to the source. Cohort retention is two aggregations and
one co-partitioned join on user.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    us_col: Column | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel conversion: a user converts to stage i only with an
    event of ``stages[i]`` STRICTLY AFTER their stage i−1 conversion time
    (first-touch semantics: each stage binds to the earliest qualifying
    event). Events of a later stage occurring before the earlier stage do
    not count — the ordering constraint is what separates a funnel from a
    per-type distinct count.

    Output: (stage_idx, stage, n_users, pct_of_first) — one row per stage;
    the pct window runs over the K-row summary, not the event stream.
    """
    from windflow_spark.operators.timeutil import event_micros

    us = us_col if us_col is not None else event_micros(df, ts_col)
    ev = df.select(F.col(user_col), F.col(type_col).alias("_ty"), us.alias("_us"))
    frames = []
    cur = None
    for stage in stages:
        s = ev.filter(F.col("_ty") == stage)
        if cur is None:
            cur = s.groupBy(user_col).agg(F.min("_us").alias("_t"))
        else:
            cur = (
                s.join(cur.select(user_col, F.col("_t").alias("_pt")), user_col)
                .filter(F.col("_us") > F.col("_pt"))
                .groupBy(user_col)
                .agg(F.min("_us").alias("_t"))
            )
        frames.append(cur)
    counts = None
    for i, (stage, fr) in enumerate(zip(stages, frames)):
        row = fr.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("long").alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)
    n0 = F.max(F.when(F.col("stage_idx") == 0, F.col("n_users"))).over(
        W.partitionBy()
    )
    return counts.withColumn(
        "pct_of_first", F.round(F.col("n_users").cast("double") / n0, 6)
    )


def cohort_retention(
    df: DataFrame,
    bucket_us: int,
    user_col: str = "user_id",
    us_col: Column | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users bucketed by their FIRST-activity
    period (the cohort), counted in every later period they return.
    Output: (cohort_bucket, bucket_offset, n_users) with offset 0 = the
    cohort size itself. Two aggregations (first activity per user,
    distinct active buckets per user) joined on the user key.
    """
    from windflow_spark.operators.timeutil import event_micros

    us = us_col if us_col is not None else event_micros(df, ts_col)
    ev = df.select(
        F.col(user_col), F.floor(us / F.lit(bucket_us)).cast("long").alias("_wk")
    )
    first = ev.groupBy(user_col).agg(F.min("_wk").alias("_cohort"))
    act = ev.distinct()
    return (
        act.join(first, user_col)
        .groupBy(
            F.col("_cohort").alias("cohort_bucket"),
            (F.col("_wk") - F.col("_cohort")).alias("bucket_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
