"""Streaming operator forms.

Watermark note (SURVEY.md §7 hard part 2): WindFlow watermarks are in-band
punctuations min-merged per input channel (reference
wf/watermark_collector.hpp:64-79); Spark's is global max(event_time) − delay
per trigger. For keyed windowed aggregates the observable difference is only
WHEN results fire, not WHAT fires — withWatermark(delay) plays the role of
withLateness(µs) (reference wf/builders.hpp:743-781).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _dur(us: int) -> str:
    return f"{us} microseconds"


def streaming_tumbling_window_tb(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    length_us: int,
    aggs: Sequence[Column],
    lateness_us: int = 0,
    window_col: str = "w_start",
) -> DataFrame:
    """Keyed_Windows TB tumbling, streaming form: watermark + window().
    Epoch-aligned like the batch form (F.window aligns to epoch)."""
    return (
        df.withWatermark(ts_col, _dur(max(lateness_us, 1)))
        .groupBy(*key_cols, F.window(ts_col, _dur(length_us)))
        .agg(*aggs)
        .withColumn(window_col, F.col("window.start"))
        .drop("window")
    )


def streaming_sliding_window_tb(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    length_us: int,
    slide_us: int,
    aggs: Sequence[Column],
    lateness_us: int = 0,
    window_col: str = "w_start",
) -> DataFrame:
    """Sliding/hopping TB windows via window(ts, len, slide)."""
    return (
        df.withWatermark(ts_col, _dur(max(lateness_us, 1)))
        .groupBy(*key_cols, F.window(ts_col, _dur(length_us), _dur(slide_us)))
        .agg(*aggs)
        .withColumn(window_col, F.col("window.start"))
        .drop("window")
    )


def streaming_session_window(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_us: int,
    aggs: Sequence[Column],
    lateness_us: int = 0,
) -> DataFrame:
    """Session windows (gap-merged) — native session_window; batch sibling
    is operators.windows.session_window_agg."""
    return (
        df.withWatermark(ts_col, _dur(max(lateness_us, 1)))
        .groupBy(*key_cols, F.session_window(ts_col, _dur(gap_us)))
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


def streaming_interval_join(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    a_ts: str,
    b_ts: str,
    lower_us: int,
    upper_us: int,
    watermark_us: int = 1,
) -> DataFrame:
    """Stream-stream interval join. Spark derives state retention from the
    time-bound condition exactly as the reference purges archives by
    watermark (A kept while ts >= wm − upper, B while ts >= wm + lower;
    reference wf/interval_join.hpp:109-117,153-159)."""
    aa = a.withWatermark(a_ts, _dur(watermark_us)).alias("a")
    bb = b.withWatermark(b_ts, _dur(watermark_us)).alias("b")
    cond = None
    for k in key_cols:
        c = F.col(f"a.{k}") == F.col(f"b.{k}")
        cond = c if cond is None else (cond & c)
    a_us = F.unix_micros(F.col(f"a.{a_ts}"))
    b_us = F.unix_micros(F.col(f"b.{b_ts}"))
    cond = cond & (b_us >= a_us + F.lit(lower_us)) & (b_us <= a_us + F.lit(upper_us))
    return aa.join(bb, cond, "inner")


def streaming_rolling_reduce(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    output_schema: str | None = None,
) -> DataFrame:
    """Reduce operator, streaming form: per-key running (count, sum) state
    emitting ONE ROW PER INPUT (the reference's per-input state emission,
    wf/reduce.hpp:~135-142) via applyInPandasWithState.

    Rows within a micro-batch are processed in event-time order per key;
    cross-batch order follows trigger arrival — the same per-key-only
    ordering guarantee the reference provides.
    """
    key_list = list(key_cols)
    output_schema = output_schema or (
        ", ".join(f"{k} long" for k in key_list)
        + f", {ts_col} timestamp, {value_col} double, running_cnt long, running_sum double"
    )
    state_schema = "cnt long, s double"

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (cnt, s) = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            out_cnt, out_sum = [], []
            for v in pdf[value_col]:
                cnt += 1
                s += float(v)
                out_cnt.append(cnt)
                out_sum.append(s)
            res = pdf[key_list + [ts_col, value_col]].copy()
            res["running_cnt"] = out_cnt
            res["running_sum"] = out_sum
            yield res
        state.update((cnt, s))

    return df.groupBy(*key_list).applyInPandasWithState(
        fold, output_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_tumbling_window_cb(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    length: int,
) -> DataFrame:
    """Count-based tumbling windows, streaming form (SURVEY.md §7 hard part
    1 — no native support): per-key progressive counter + per-window partial
    aggregates in GroupState; a window fires when its count reaches
    ``length``. Trailing partials stay in state until query stop (the
    reference flushes them at EOS; use availableNow + final batch flush or
    read partials from state on teardown).

    Output: (key..., wid, cnt, sum_value) per FIRED window.
    """
    key_list = list(key_cols)
    output_schema = (
        ", ".join(f"{k} long" for k in key_list) + ", wid long, cnt long, sum_value double"
    )
    state_schema = "next_id long, wid long, wcnt long, wsum double"

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        next_id, wid, wcnt, wsum = state.get if state.exists else (0, 0, 0, 0.0)
        fired: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for v in pdf[value_col]:
                cur_wid = next_id // length
                if cur_wid != wid and wcnt > 0:
                    fired.append(key + (wid, wcnt, wsum))
                    wcnt, wsum = 0, 0.0
                wid = cur_wid
                wcnt += 1
                wsum += float(v)
                next_id += 1
                if wcnt == length:
                    fired.append(key + (wid, wcnt, wsum))
                    wcnt, wsum = 0, 0.0
                    wid = next_id // length
        state.update((next_id, wid, wcnt, wsum))
        cols = key_list + ["wid", "cnt", "sum_value"]
        yield pd.DataFrame(fired, columns=cols) if fired else pd.DataFrame(
            {c: [] for c in cols}
        )

    return df.groupBy(*key_list).applyInPandasWithState(
        fold, output_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_exact_dedup(
    df: DataFrame,
    dedup_cols: Sequence[str],
    ts_col: str,
    watermark_us: int,
) -> DataFrame:
    """Streaming exact deduplication: first occurrence of ``dedup_cols``
    wins; duplicates arriving within the watermark horizon are dropped and
    state for a key is evicted once the watermark passes it
    (dropDuplicatesWithinWatermark — bounded state, unlike dropDuplicates'
    forever-growing set). The batch sibling is functions.dedup.exact_dedup;
    at 100 TB the watermark bound is what keeps dedup state finite."""
    return df.withWatermark(ts_col, _dur(max(watermark_us, 1))).dropDuplicatesWithinWatermark(
        list(dedup_cols)
    )
