"""Behavioral analytics over event streams: ordered-funnel conversion and
cohort retention — the classic product-analytics queries a stream engine's
users run downstream of windows/sessions (no reference counterpart; the
reference's §2.11 UDF surface stops at per-window functors).

Scale shape: both operators stay on (user, bucket/stage) aggregates.
The funnel is ONE pass: a single groupBy(user) collects each user's
funnel-relevant events (the event-type filter pushes to the source, so
per-user state is bounded by that user's funnel events, not their full
history), a JVM-side sorted fold computes the K first-touch stage times,
and one global partial-aggregated count yields the K-row summary — one
keyed exchange for a K-stage funnel, never a cross product. Cohort
retention is two aggregations and one co-partitioned join on user.
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

    Output: (stage_idx, stage, n_users, pct_of_first) — one row per stage.

    ONE-PASS plan (VERDICT r5 #2): groupBy(user) collects that user's
    stage events as sort_array(collect_list(struct(us, stage_idx))) — the
    single keyed exchange — then a JVM ``F.aggregate`` fold walks the
    sorted list once, binding stage i to the FIRST stage-i event strictly
    after stage i−1's bound time. (Equivalent to the chained min-agg form:
    any qualifying stage-i event sorts strictly after the event that set
    t_{i−1}, so the first qualifying one in scan order IS the min.) The
    K stage counts then reduce in one partially-aggregated global pass and
    unpivot via ``inline`` — K stages cost one job, not 2K.
    """
    from windflow_spark.operators.timeutil import event_micros

    n_stages = len(stages)
    us = us_col if us_col is not None else event_micros(df, ts_col)
    # Map event type -> ALL matching stage indices (a stage name may repeat
    # in the spec; each occurrence is its own funnel step, as in the
    # chained form). Pure JVM: K-literal array per row, matches exploded.
    stage_lits = F.array(*[F.lit(s) for s in stages])
    match_idx = F.filter(
        F.transform(
            stage_lits,
            lambda s, i: F.when(s == F.col("_ty"), i),  # int index
        ),
        lambda x: x.isNotNull(),
    )
    ev = (
        df.select(F.col(user_col), F.col(type_col).alias("_ty"), us.alias("_us"))
        .filter(F.col("_ty").isin(list(stages)))
        .select(user_col, "_us", F.explode(match_idx).alias("_s"))
    )

    def _step(acc, e):
        s, t = e["_s"], e["_us"]  # s: INT stage index (element_at needs int)
        # element_at is 1-based; guard the s==0 read (ANSI: index 0 errors)
        prev_t = F.element_at(acc, F.when(s > 0, s).otherwise(F.lit(1)))
        prev_ok = (s == 0) | (prev_t.isNotNull() & (t > prev_t))
        cond = F.element_at(acc, s + 1).isNull() & prev_ok
        return F.when(
            cond, F.transform(acc, lambda x, i: F.when(i == s, t).otherwise(x))
        ).otherwise(acc)

    times = (
        ev.groupBy(user_col)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("_us", "_s"))),
                F.array_repeat(F.lit(None).cast("long"), n_stages),
                _step,
            ).alias("_t")
        )
    )
    counts = times.agg(
        *[
            F.count(F.element_at("_t", i + 1)).cast("long").alias(f"_c{i}")
            for i in range(n_stages)
        ]
    )
    summary = counts.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("stage_idx"),
                        F.lit(stage).alias("stage"),
                        F.col(f"_c{i}").alias("n_users"),
                    )
                    for i, stage in enumerate(stages)
                ]
            )
        ),
        F.col("_c0").alias("_n0"),
    )
    return summary.select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(F.col("n_users").cast("double") / F.col("_n0"), 6).alias(
            "pct_of_first"
        ),
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


def trending_counts(
    df: DataFrame,
    key_col: str,
    bucket_us: int,
    us_col: Column | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Trend detection: per key, activity counts per time bucket with the
    previous bucket's count and the growth ratio — the
    "what's trending week-over-week" query of a product/corpus analytics
    stack (downstream sibling of funnel/cohort; no reference counterpart).

    Scale shape: one (key, bucket) aggregation, then a lag() window over
    the aggregated frame — the window input is |keys| × |buckets| rows,
    already reduced, so the sort is over the summary, never the events.
    ``growth`` is NULL for a key's first bucket and for prev = 0 (a
    from-zero jump has no ratio; the count columns carry the signal).

    Output: (bucket (long µs), key, cnt, prev_cnt, growth 6dp).
    """
    from windflow_spark.operators.timeutil import event_micros

    us = us_col if us_col is not None else event_micros(df, ts_col)
    counts = (
        df.select(F.col(key_col).alias("key"), (us - us % F.lit(bucket_us)).alias("bucket"))
        .groupBy("key", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = W.partitionBy("key").orderBy("bucket")
    prev = F.lag("cnt").over(w)
    return counts.select(
        "bucket",
        "key",
        "cnt",
        prev.alias("prev_cnt"),
        F.when(
            prev.isNotNull() & (prev > 0),
            F.round(F.col("cnt").cast("double") / prev, 6),
        ).alias("growth"),
    )
