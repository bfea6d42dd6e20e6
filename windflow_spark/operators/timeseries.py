"""Time-series gap-fill + linear interpolation.

Not in the reference (WindFlow has no notion of a dense time grid — empty
TB windows fire with empty content, wf/window_replica.hpp:306-317, which is
the spine half of this; see operators/windows.window_spine_tb). This adds
the other half every metrics/sensor pipeline needs: resample observations
onto a regular grid and linearly interpolate interior gaps.

Scale shape: the spine is generated per key with sequence+explode (no
driver loop), the observation join is a co-partitioned left join on
(key, bucket), and the prev/next lookups are two window passes — everything
distributed, state bounded by one key's span.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    grid_us: int,
    out_ts: str = "ts",
    out_val: str = "value",
) -> DataFrame:
    """Resample to a ``grid_us`` grid per key (observation = MIN of the
    bucket's values — order-independent, so cross-engine exact) and fill
    every interior gap by linear interpolation between the nearest
    observations; leading/trailing gaps take the nearest single value.
    Output: key cols + ``out_ts`` (grid timestamp) + ``out_val`` — RAW
    double: the lerp lands on systematic decimal midpoints (.xxxx5) where
    HALF_UP and float-round disagree, so rounding here breaks cross-engine
    parity; identical IEEE expressions are bit-identical unrounded."""
    keys = list(key_cols)
    from windflow_spark.operators.timeutil import event_micros

    us = event_micros(df, ts_col)
    obs = (
        df.select(*keys, (us - us % F.lit(grid_us)).alias("_t"), F.col(value_col))
        .groupBy(*keys, "_t")
        .agg(F.min(value_col).alias("_v"))
    )
    # Segment form: lead() pairs consecutive observations (a window over the
    # SMALL observation table), then each segment explodes straight to its
    # grid points with the lerp — the dense spine is never sorted or joined,
    # so the cost is O(observations log observations + output rows).
    w = W.partitionBy(*keys).orderBy("_t")
    seg = obs.withColumn("_nt", F.lead("_t").over(w)).withColumn(
        "_nv", F.lead("_v").over(w)
    )
    pts = seg.withColumn(
        "_p",
        F.explode(
            F.when(
                F.col("_nt").isNotNull(),
                F.sequence("_t", F.col("_nt") - F.lit(grid_us), F.lit(grid_us)),
            ).otherwise(F.array(F.col("_t")))
        ),
    )
    lerp = F.col("_v") + (F.col("_nv") - F.col("_v")) * (F.col("_p") - F.col("_t")) / (
        F.col("_nt") - F.col("_t")
    )
    filled = F.when(F.col("_p") == F.col("_t"), F.col("_v")).otherwise(lerp)
    return pts.select(
        *keys,
        F.timestamp_micros(F.col("_p")).alias(out_ts),
        filled.alias(out_val),
    )


def rolling_zscore(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_us: int = 3_600_000_000,
    lookback: int = 24,
    min_periods: int = 12,
) -> DataFrame:
    """Trailing-window z-score per key on a bucketed series — the standard
    streaming-metrics anomaly signal (no reference analog; WindFlow would
    express it as a keyed incremental window, wf/keyed_windows.hpp:65).

    Buckets ``ts_col`` to ``bucket_us``, aggregates ``value_col`` per
    (key, bucket), then scores each bucket against the mean/stddev of the
    trailing ``lookback`` buckets (RANGE frame on the integer bucket index,
    so calendar gaps shrink the sample rather than stretching the window).
    Buckets with fewer than ``min_periods`` trailing observations or zero
    variance get a NULL score.

    Scale shape: one keyed exchange for the bucket agg; the window pass
    reuses the same (key) partitioning with a bounded frame — state per key
    is ``lookback`` rows regardless of history length.
    """
    from windflow_spark.operators.timeutil import event_micros

    bkt_us = (F.floor(event_micros(df, ts_col) / F.lit(bucket_us)) * bucket_us).cast(
        "long"
    )
    hourly = (
        df.withColumn("_bkt_us", bkt_us)
        .groupBy(*key_cols, "_bkt_us")
        .agg(F.count(value_col).alias("cnt"))
        .withColumn("_bidx", (F.col("_bkt_us") / F.lit(bucket_us)).cast("long"))
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy("_bidx")
        .rangeBetween(-lookback, -1)
    )
    m = F.avg("cnt").over(w)
    sd = F.stddev_samp("cnt").over(w)
    n = F.count("cnt").over(w)
    z = F.when((n >= min_periods) & (sd > 0), F.round((F.col("cnt") - m) / sd, 2))
    return hourly.select(
        *key_cols,
        F.timestamp_micros(F.col("_bkt_us")).alias("bucket_start"),
        "cnt",
        z.alias("zscore"),
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history: per key, ordered
    by event time, consecutive rows whose tracked attributes are UNCHANGED
    collapse into one version, and each version gets
    ``valid_from`` / ``valid_to`` (exclusive; NULL = open) +
    ``is_current`` — the standard warehouse snapshot-interval build a
    100 TB ingest runs to turn change events into point-in-time-joinable
    dimensions (pairs with operators/asof_join for the lookup side).

    Not in the reference (no batch history notion there); semantics are the
    ANSI gaps-and-islands idiom. Scale shape: two window passes over the
    SAME (key, time) ordering — one lag() for change detection, one lead()
    for interval close — so the key exchange happens once and everything
    else is narrow. ``tiebreak_cols`` breaks equal-timestamp ordering for
    determinism.

    Output: key_cols + attr_cols + (valid_from ts, valid_to ts,
    version_seq long, is_current boolean).
    """
    keys, attrs = list(key_cols), list(attr_cols)
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = W.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(a).over(w)
        # null-safe inequality: a change to/from NULL is a new version
        changed = changed | ~F.col(a).eqNullSafe(prev)
    versions = (
        df.withColumn("_chg", F.coalesce(F.lag(ts_col).over(w).isNull(), F.lit(True)) | changed)
        .filter(F.col("_chg"))
        .drop("_chg")
    )
    w2 = W.partitionBy(*keys).orderBy(*order)
    return versions.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version_seq"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def resample_ohlc(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """Downsample a value stream to OHLC bars (open/high/low/close +
    count) per key and time bucket — the classic tick→candle resample of
    any metrics/market pipeline. ONE aggregation pass: open/close are
    min/max over (ts, value) structs (lexicographic struct ordering gives
    the value at the earliest/latest timestamp with a deterministic
    min-value/max-value tie-break — order-independent, so cross-engine
    exact, unlike first()/last()).

    Output: key_cols + bucket_start (timestamp) + o/h/l/c + cnt.
    """
    keys = list(key_cols)
    from windflow_spark.operators.timeutil import event_micros

    us = event_micros(df, ts_col)
    b = (us - us % F.lit(bucket_us)).alias("_bkt")
    d = df.select(*keys, b, us.alias("_us"), F.col(value_col).alias("_v"))
    return (
        d.groupBy(*keys, "_bkt")
        .agg(
            F.min(F.struct("_us", "_v")).alias("_o"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max(F.struct("_us", "_v")).alias("_c"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        .select(
            *keys,
            F.timestamp_micros(F.col("_bkt")).alias("bucket_start"),
            F.col("_o._v").alias("open"),
            "high",
            "low",
            F.col("_c._v").alias("close"),
            "cnt",
        )
    )


def ewma_smooth(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    alpha: float = 0.25,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Exponentially weighted moving average of per-bucket event counts —
    the standard metrics-smoothing pass (no reference analog; WindFlow
    would express it as a keyed rolling Reduce, wf/basic_operators.hpp).

    ``y_t = alpha*x_t + (1-alpha)*y_{t-1}`` over the key's OBSERVED
    buckets in time order (calendar gaps advance to the next observation,
    they do not decay through empties — resample first via
    gap_fill_interpolate if empty-bucket decay is wanted).

    Scale shape: one keyed exchange for the bucket aggregation, then the
    recurrence folds JVM-side (``F.aggregate``) over each key's sorted
    bucket series — per-key state is the TIMELINE length (buckets, e.g.
    days), bounded and tiny regardless of event volume; the fold is a
    strict left-to-right sequential product, so the result is independent
    of partitioning and bit-reproducible cross-engine (oracle: the
    equivalent recursive CTE). Prefer a dyadic ``alpha`` (0.25, 0.5): both
    alpha and 1-alpha are then exact doubles on every engine.
    """
    from windflow_spark.operators.timeutil import event_micros

    bidx = F.floor(event_micros(df, ts_col) / F.lit(bucket_us)).cast("long")
    bucketed = (
        df.withColumn("_bidx", bidx)
        .groupBy(*key_cols, "_bidx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    lst = F.sort_array(
        F.collect_list(F.struct(F.col("_bidx").alias("b"), F.col("cnt").alias("c")))
    )
    zero = F.struct(
        F.expr("CAST(array() AS array<struct<b:bigint,c:bigint,e:double>>)").alias(
            "arr"
        ),
        F.lit(None).cast("double").alias("last"),
    )

    def _step(acc, x):
        new_e = F.when(acc["last"].isNull(), x["c"].cast("double")).otherwise(
            F.lit(alpha) * x["c"] + F.lit(1.0 - alpha) * acc["last"]
        )
        return F.struct(
            F.concat(
                acc["arr"],
                F.array(
                    F.struct(
                        x["b"].alias("b"), x["c"].alias("c"), new_e.alias("e")
                    )
                ),
            ).alias("arr"),
            new_e.alias("last"),
        )

    folded = bucketed.groupBy(*key_cols).agg(
        F.aggregate(lst, zero, _step).alias("_r")
    )
    return folded.select(
        *key_cols, F.explode(F.col("_r.arr")).alias("_x")
    ).select(
        *key_cols,
        F.timestamp_micros(F.col("_x.b") * F.lit(bucket_us)).alias("bucket_start"),
        F.col("_x.c").alias("cnt"),
        F.round(F.col("_x.e"), 6).alias("ewma"),
    )


def mad_anomaly(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    bucket_us: int = 86_400_000_000,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier detection on bucketed counts via the modified
    z-score (Iglewicz–Hoaglin): ``0.6745*(x - median)/MAD``, flagged above
    ``threshold``. Median/MAD resist the very outliers a mean/stddev
    z-score (rolling_zscore) gets dragged by — the batch-monitoring
    sibling for spiky series.

    Scale shape: one keyed exchange for the bucket agg, then the two
    exact percentiles (median, then median absolute deviation) are
    WHOLE-PARTITION WINDOW aggregates over the key — both window passes
    reuse one repartition-by-key, no joins back to re-derived aggregate
    frames (2 keyed exchanges total vs 7 for the agg+broadcast-join
    form). Per-key sorted-buffer state is the timeline length (buckets),
    not event volume. Spark ``percentile`` ≡ DuckDB ``quantile_cont``
    bit-exact, so med/MAD/score all value-match cross-engine.

    Output: key_cols + (bucket_start, cnt, med, mad, mod_z 6dp,
    is_anomaly); zero-MAD series yield NULL scores and FALSE flags.
    """
    from windflow_spark.operators.timeutil import event_micros

    keys = list(key_cols)
    bidx = F.floor(event_micros(df, ts_col) / F.lit(bucket_us)).cast("long")
    bucketed = (
        df.withColumn("_bidx", bidx)
        .groupBy(*keys, "_bidx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wk = W.partitionBy(*keys)
    scored = bucketed.withColumn(
        "med", F.percentile(F.col("cnt"), F.lit(0.5)).over(wk)
    ).withColumn(
        "mad",
        F.percentile(F.abs(F.col("cnt") - F.col("med")), F.lit(0.5)).over(wk),
    )
    mz = F.when(
        F.col("mad") > 0,
        F.round(
            F.lit(0.6745) * (F.col("cnt") - F.col("med")) / F.col("mad"), 6
        ),
    )
    return scored.select(
        *keys,
        F.timestamp_micros(F.col("_bidx") * F.lit(bucket_us)).alias("bucket_start"),
        "cnt",
        "med",
        "mad",
        mz.alias("mod_z"),
        F.coalesce(F.abs(mz) > F.lit(threshold), F.lit(False)).alias("is_anomaly"),
    )


def holt_smooth(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Holt double-exponential (level + trend) smoothing of per-bucket
    event counts, with the one-step-ahead forecast — EWMA's sibling for
    trending series (no reference analog; WindFlow would express it as a
    keyed rolling Reduce, wf/basic_operators.hpp).

    Recurrence (t >= 2, init l_1 = x_1, b_1 = 0):
      ``l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})``
      ``b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}``
      ``forecast_t = l_t + b_t``  (next-bucket prediction)

    Scale shape: identical to ewma_smooth — one keyed exchange for the
    bucket aggregation, then a strict left-to-right JVM-side fold
    (``F.aggregate``) over each key's sorted bucket series; per-key state
    is the timeline length in buckets. Dyadic alpha/beta keep every
    coefficient an exact double on both engines, so the recursive-CTE
    oracle reproduces the float sequence bit-exactly.
    """
    from windflow_spark.operators.timeutil import event_micros

    keys = list(key_cols)
    bidx = F.floor(event_micros(df, ts_col) / F.lit(bucket_us)).cast("long")
    bucketed = (
        df.withColumn("_bidx", bidx)
        .groupBy(*keys, "_bidx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    lst = F.sort_array(
        F.collect_list(F.struct(F.col("_bidx").alias("b"), F.col("cnt").alias("c")))
    )
    zero = F.struct(
        F.expr(
            "CAST(array() AS array<struct<b:bigint,c:bigint,l:double,t:double>>)"
        ).alias("arr"),
        F.lit(None).cast("double").alias("lvl"),
        F.lit(None).cast("double").alias("trd"),
    )

    def _step(acc, x):
        first = acc["lvl"].isNull()
        new_l = F.when(first, x["c"].cast("double")).otherwise(
            F.lit(alpha) * x["c"]
            + F.lit(1.0 - alpha) * (acc["lvl"] + acc["trd"])
        )
        new_t = F.when(first, F.lit(0.0)).otherwise(
            F.lit(beta) * (new_l - acc["lvl"]) + F.lit(1.0 - beta) * acc["trd"]
        )
        return F.struct(
            F.concat(
                acc["arr"],
                F.array(
                    F.struct(
                        x["b"].alias("b"),
                        x["c"].alias("c"),
                        new_l.alias("l"),
                        new_t.alias("t"),
                    )
                ),
            ).alias("arr"),
            new_l.alias("lvl"),
            new_t.alias("trd"),
        )

    folded = bucketed.groupBy(*keys).agg(F.aggregate(lst, zero, _step).alias("_r"))
    return folded.select(*keys, F.explode(F.col("_r.arr")).alias("_x")).select(
        *keys,
        F.timestamp_micros(F.col("_x.b") * F.lit(bucket_us)).alias("bucket_start"),
        F.col("_x.c").alias("cnt"),
        F.round(F.col("_x.l"), 6).alias("level"),
        F.round(F.col("_x.t"), 6).alias("trend"),
        F.round(F.col("_x.l") + F.col("_x.t"), 6).alias("forecast_next"),
    )


def macd_smooth(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """MACD (moving-average convergence/divergence) over per-bucket event
    counts: fast/slow EMAs of the series, their difference (the MACD
    line), an EMA of that difference (the signal line), and the histogram
    — the canonical momentum indicator, and the composition test for the
    EWMA fold (three coupled recurrences in ONE pass; no reference
    analog, WindFlow would chain keyed rolling Reduces,
    wf/basic_operators.hpp).

    Recurrence (standard alphas 2/(p+1); every EMA initializes to its
    first input, signal to the first MACD value):
      ``ef_t = af*x_t + (1-af)*ef_{t-1}``  (af = 2/(fast+1))
      ``es_t = as*x_t + (1-as)*es_{t-1}``  (as = 2/(slow+1))
      ``macd_t = ef_t - es_t``
      ``sig_t = ag*macd_t + (1-ag)*sig_{t-1}``  (ag = 2/(signal+1))

    Cross-engine exactness: the alphas are single IEEE divisions of small
    integers — both engines produce the identical correctly-rounded
    double from the same literal — and the fold is a strict left-to-right
    sequential recurrence (same shape as ewma_smooth/holt_smooth), so the
    float sequence is bit-identical to the recursive-CTE oracle at any
    partitioning. Per-key state is the timeline length in buckets.
    """
    from windflow_spark.operators.timeutil import event_micros

    keys = list(key_cols)
    af, asl, ag = 2.0 / (fast + 1), 2.0 / (slow + 1), 2.0 / (signal + 1)
    bidx = F.floor(event_micros(df, ts_col) / F.lit(bucket_us)).cast("long")
    bucketed = (
        df.withColumn("_bidx", bidx)
        .groupBy(*keys, "_bidx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    lst = F.sort_array(
        F.collect_list(F.struct(F.col("_bidx").alias("b"), F.col("cnt").alias("c")))
    )
    zero = F.struct(
        F.expr(
            "CAST(array() AS array<struct<b:bigint,c:bigint,"
            "f:double,s:double,m:double,g:double>>)"
        ).alias("arr"),
        F.lit(None).cast("double").alias("ef"),
        F.lit(None).cast("double").alias("es"),
        F.lit(None).cast("double").alias("sg"),
    )

    def _step(acc, x):
        first = acc["ef"].isNull()
        xd = x["c"].cast("double")
        new_f = F.when(first, xd).otherwise(
            F.lit(af) * xd + F.lit(1.0 - af) * acc["ef"]
        )
        new_s = F.when(first, xd).otherwise(
            F.lit(asl) * xd + F.lit(1.0 - asl) * acc["es"]
        )
        new_m = new_f - new_s
        new_g = F.when(first, new_m).otherwise(
            F.lit(ag) * new_m + F.lit(1.0 - ag) * acc["sg"]
        )
        return F.struct(
            F.concat(
                acc["arr"],
                F.array(
                    F.struct(
                        x["b"].alias("b"),
                        x["c"].alias("c"),
                        new_f.alias("f"),
                        new_s.alias("s"),
                        new_m.alias("m"),
                        new_g.alias("g"),
                    )
                ),
            ).alias("arr"),
            new_f.alias("ef"),
            new_s.alias("es"),
            new_g.alias("sg"),
        )

    folded = bucketed.groupBy(*keys).agg(F.aggregate(lst, zero, _step).alias("_r"))
    return folded.select(*keys, F.explode(F.col("_r.arr")).alias("_x")).select(
        *keys,
        F.timestamp_micros(F.col("_x.b") * F.lit(bucket_us)).alias("bucket_start"),
        F.col("_x.c").alias("cnt"),
        F.round(F.col("_x.f"), 6).alias("ema_fast"),
        F.round(F.col("_x.s"), 6).alias("ema_slow"),
        F.round(F.col("_x.m"), 6).alias("macd"),
        F.round(F.col("_x.g"), 6).alias("signal"),
        F.round(F.col("_x.m") - F.col("_x.g"), 6).alias("histogram"),
    )


def holt_winters_smooth(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.5,
    season: int = 7,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple-exponential smoothing (level + trend +
    day-of-week seasonal) of per-bucket event counts — holt_smooth with a
    seasonal state array, the full classical forecasting recurrence.

    Recurrence (init l_1 = x_1, b_1 = 0, s = zeros(season); idx = bucket
    index mod season, so the seasonal slot is the calendar day-of-week and
    missing days don't shift the season):
      ``l_t = alpha*(x_t - s[idx]) + (1-alpha)*(l_{t-1} + b_{t-1})``
      ``b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}``
      ``s[idx] <- gamma*(x_t - l_t) + (1-gamma)*s[idx]``
      ``forecast_next = l_t + b_t + s[(idx+1) mod season]``

    Zero-initialized seasonals ramp in over the first cycles (no
    first-season average pass — keeps init deterministic and the oracle's
    recursive CTE identical). Scale shape: one keyed exchange for the
    bucket aggregation, then a strict left-to-right JVM-side F.aggregate
    fold per key carrying (level, trend, season-array) — per-key state is
    the timeline length. Dyadic alpha/beta/gamma keep every coefficient
    an exact double, so the oracle's recursive CTE (seasonal state as a
    LIST column) reproduces the float sequence bit-exactly.
    """
    from windflow_spark.operators.timeutil import event_micros

    keys = list(key_cols)
    bidx = F.floor(event_micros(df, ts_col) / F.lit(bucket_us)).cast("long")
    bucketed = (
        df.withColumn("_bidx", bidx)
        .groupBy(*keys, "_bidx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    lst = F.sort_array(
        F.collect_list(F.struct(F.col("_bidx").alias("b"), F.col("cnt").alias("c")))
    )
    zero = F.struct(
        F.expr(
            "CAST(array() AS "
            "array<struct<b:bigint,c:bigint,l:double,t:double,f:double>>)"
        ).alias("arr"),
        F.lit(None).cast("double").alias("lvl"),
        F.lit(None).cast("double").alias("trd"),
        F.expr(f"array_repeat(0.0D, {int(season)})").alias("sea"),
    )

    def _step(acc, x):
        first = acc["lvl"].isNull()
        idx = (x["b"] % season).cast("int")
        s_cur = F.get(acc["sea"], idx)
        new_l = F.when(first, x["c"].cast("double")).otherwise(
            F.lit(alpha) * (x["c"] - s_cur)
            + F.lit(1.0 - alpha) * (acc["lvl"] + acc["trd"])
        )
        new_t = F.when(first, F.lit(0.0)).otherwise(
            F.lit(beta) * (new_l - acc["lvl"]) + F.lit(1.0 - beta) * acc["trd"]
        )
        s_upd = F.when(first, s_cur).otherwise(
            F.lit(gamma) * (x["c"] - new_l) + F.lit(1.0 - gamma) * s_cur
        )
        new_sea = F.transform(
            F.sequence(F.lit(0), F.lit(int(season) - 1)),
            lambda i: F.when(i == idx, s_upd).otherwise(F.get(acc["sea"], i)),
        )
        nxt = F.get(new_sea, ((x["b"] + 1) % season).cast("int"))
        return F.struct(
            F.concat(
                acc["arr"],
                F.array(
                    F.struct(
                        x["b"].alias("b"),
                        x["c"].alias("c"),
                        new_l.alias("l"),
                        new_t.alias("t"),
                        (new_l + new_t + nxt).alias("f"),
                    )
                ),
            ).alias("arr"),
            new_l.alias("lvl"),
            new_t.alias("trd"),
            new_sea.alias("sea"),
        )

    folded = bucketed.groupBy(*keys).agg(F.aggregate(lst, zero, _step).alias("_r"))
    return folded.select(*keys, F.explode(F.col("_r.arr")).alias("_x")).select(
        *keys,
        F.timestamp_micros(F.col("_x.b") * F.lit(bucket_us)).alias("bucket_start"),
        F.col("_x.c").alias("cnt"),
        F.round(F.col("_x.l"), 6).alias("level"),
        F.round(F.col("_x.t"), 6).alias("trend"),
        F.round(F.col("_x.f"), 6).alias("forecast_next"),
    )
