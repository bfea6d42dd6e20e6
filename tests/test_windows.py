"""Window-operator unit tests on tiny inline frames (FIXTURES.md §2 shapes):
CB/TB × tumbling/sliding/hopping, empty-window spine, partial trailing
windows — plus the metamorphic invariance the reference tests demand
(SURVEY.md §5): results invariant to partitioning."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from windflow_spark.operators.windows import (
    paned_window_tb,
    sliding_window_cb,
    sliding_window_tb,
    tumbling_window_cb,
    tumbling_window_tb,
    window_spine_tb,
)

US = 1  # µs
SEC = 1_000_000


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, v, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=ts)) for k, v, ts in rows],
        "key long, value long, ts timestamp",
    )


BASE_US = 1704067200000000  # 2024-01-01 in µs (epoch-aligned windows)


def test_tumbling_tb_basic(spark):
    # 2-second windows; 2024-01-01 is second-aligned so offsets are exact
    df = _mk(spark, [(1, 10, 0), (1, 20, 1 * SEC), (1, 30, 2 * SEC), (2, 5, 3 * SEC)])
    out = tumbling_window_tb(df, ["key"], "ts", 2 * SEC, [F.sum("value").alias("s")])
    got = {(r.key, r.w_start.second % 10, r.s) for r in out.collect()}
    assert got == {(1, 0, 30), (1, 2, 30), (2, 2, 5)}


def test_sliding_tb_counts(spark):
    # len 4s slide 2s: row at t=2s belongs to windows starting at 0s and 2s
    df = _mk(spark, [(1, 1, 2 * SEC)])
    out = sliding_window_tb(df, ["key"], "ts", 4 * SEC, 2 * SEC, [F.count(F.lit(1)).alias("c")])
    starts = sorted(r.w_start.second for r in out.collect())
    assert starts == [0, 2]


def test_hopping_with_gaps(spark):
    # len 1s slide 3s: only rows with ts%3 < 1 s land in a window
    df = _mk(spark, [(1, 1, 0), (1, 1, 1 * SEC), (1, 1, 3 * SEC), (1, 1, 5 * SEC)])
    out = sliding_window_tb(df, ["key"], "ts", 1 * SEC, 3 * SEC, [F.count(F.lit(1)).alias("c")])
    rows = {(r.w_start.second, r.c) for r in out.collect()}
    assert rows == {(0, 1), (3, 1)}


def test_cb_tumbling_partial_trailing_window_fires(spark):
    # 5 rows, len 2 → windows of 2,2 and a trailing partial of 1 (EOS flush
    # parity: reference wf/window_replica.hpp:356-400)
    rows = [(1, i, i * SEC) for i in range(5)]
    df = _mk(spark, rows)
    out = tumbling_window_cb(df, ["key"], ["ts"], 2, [F.count(F.lit(1)).alias("c")])
    got = sorted((r.wid, r.c) for r in out.collect())
    assert got == [(0, 2), (1, 2), (2, 1)]


def test_cb_sliding_window_membership(spark):
    # len 4 slide 2 over 6 rows: window w covers rids [2w, 2w+3]
    rows = [(1, i, i * SEC) for i in range(6)]
    df = _mk(spark, rows)
    out = sliding_window_cb(df, ["key"], ["ts"], 4, 2, [F.count(F.lit(1)).alias("c")])
    got = dict((r.wid, r.c) for r in out.collect())
    assert got == {0: 4, 1: 4, 2: 2}


def test_paned_equals_naive_sliding(spark):
    rows = [(k, v, t * SEC) for k in (1, 2) for v, t in enumerate(range(0, 20, 3))]
    df = _mk(spark, rows)
    naive = sliding_window_tb(
        df, ["key"], "ts", 6 * SEC, 2 * SEC,
        [F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv")],
    )
    paned = paned_window_tb(
        df, ["key"], "ts", 6 * SEC, 2 * SEC,
        pane_aggs=[F.count(F.lit(1)).alias("_c"), F.sum("value").alias("_s")],
        final_aggs=[F.sum("_c").alias("cnt"), F.sum("_s").alias("sv")],
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, paned.collect()))


def test_auto_sliding_routes_dense_to_panes(spark):
    # cost gate (r5): dense config (len/slide >= 8) plans the two-exchange
    # pane form; sparse config keeps the one-exchange direct form; a
    # non-decomposable spec falls back to direct even when dense
    from windflow_spark.operators.windows import sliding_window_tb_auto
    from windflow_spark.plans.explain import keyed_shuffle_count

    df = _mk(spark, [(1, 1, 0)])
    spec = [("count", "*", "c"), ("sum", "value", "s")]
    dense = sliding_window_tb_auto(df, ["key"], "ts", 16 * SEC, 2 * SEC, spec)
    sparse = sliding_window_tb_auto(df, ["key"], "ts", 4 * SEC, 2 * SEC, spec)
    assert keyed_shuffle_count(dense) == 2  # pane agg + window agg
    assert keyed_shuffle_count(sparse) == 1  # direct explode + agg
    import pytest as _pytest

    from windflow_spark.operators.windows import decompose_pane_aggs

    with _pytest.raises(ValueError):
        decompose_pane_aggs([("median", "value", "m")])
    fallback = sliding_window_tb_auto(
        df, ["key"], "ts", 16 * SEC, 2 * SEC, spec,
        aggs=[F.count(F.lit(1)).alias("c"), F.sum("value").alias("s")],
        dense_threshold=100,
    )
    assert keyed_shuffle_count(fallback) == 1  # gate not met → direct


def test_auto_dense_equals_direct_property(spark):
    # pane≡direct equality across seeded random configs — the property the
    # auto-rewrite must preserve (all five decomposable ops at once)
    import random

    from windflow_spark.operators.windows import sliding_window_tb, sliding_window_tb_auto, spec_aggs

    spec = [
        ("count", "*", "cnt"),
        ("sum", "value", "sv"),
        ("min", "value", "mn"),
        ("max", "value", "mx"),
        ("avg", "value", "av"),
    ]
    for seed in (3, 17, 101):
        rng = random.Random(seed)
        rows = [
            (rng.randint(0, 3), rng.randint(-50, 50), rng.randint(0, 40) * SEC)
            for _ in range(120)
        ]
        df = _mk(spark, rows)
        length, slide = rng.choice([(12, 1), (10, 1), (16, 2)])
        direct = sliding_window_tb(
            df, ["key"], "ts", length * SEC, slide * SEC, spec_aggs(spec)
        )
        auto = sliding_window_tb_auto(
            df, ["key"], "ts", length * SEC, slide * SEC, spec
        )
        a = sorted(
            (r.key, r.w_start, r.cnt, r.sv, r.mn, r.mx, round(r.av, 9))
            for r in direct.collect()
        )
        b = sorted(
            (r.key, r.w_start, r.cnt, r.sv, r.mn, r.mx, round(r.av, 9))
            for r in auto.collect()
        )
        assert a == b


def test_window_spine_includes_empty(spark):
    # key 1 has events in windows 0 and 3 (2s windows) → spine must contain
    # the empty windows 1 and 2 (reference fires empty TB windows,
    # wf/window_replica.hpp:306-317)
    df = _mk(spark, [(1, 1, 0), (1, 1, 7 * SEC)])
    spine = window_spine_tb(df, ["key"], "ts", 2 * SEC)
    assert spine.count() == 4


def test_partition_invariance(spark):
    # metamorphic check from the reference's test strategy: same result for
    # any physical partitioning (SURVEY.md §5)
    rows = [(k % 3, v, v * 777_777) for k, v in enumerate(range(50))]
    df = _mk(spark, rows)
    a = tumbling_window_tb(df, ["key"], "ts", 7 * SEC, [F.sum("value").alias("s")])
    b = tumbling_window_tb(
        df.repartition(7, "value"), ["key"], "ts", 7 * SEC, [F.sum("value").alias("s")]
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_batched_non_incremental_equals_per_group(spark):
    import pandas as pd

    from windflow_spark.operators.windows import (
        non_incremental_window_tb,
        non_incremental_window_tb_batched,
    )

    rows = [(k % 4, v, v * 900_000) for k, v in enumerate(range(80))]
    df = _mk(spark, rows)

    def per_group(pdf):
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "_wid": [pdf["_wid"].iloc[0]],
             "sv": [float(pdf["value"].sum())]}
        )

    def batched(pdf, group_cols):
        out = pdf.groupby(group_cols, as_index=False)["value"].sum()
        out["sv"] = out["value"].astype(float)
        return out[["key", "_wid", "sv"]]

    schema = "key long, _wid long, sv double"
    a = non_incremental_window_tb(df, ["key"], "ts", 5 * SEC, per_group, schema)
    b = non_incremental_window_tb_batched(df, ["key"], "ts", 5 * SEC, batched, schema)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tumbling_tb_offset_alignment(spark):
    """offset_us shifts the window grid; a row BEFORE the offset lands in
    the preceding (negative-indexed) window via floor-mod, never a
    zero-length or misaligned one."""
    # 10s windows opening at +3s: grid ... [-7, 3), [3, 13), [13, 23) ...
    df = _mk(spark, [(1, 1, 0), (1, 2, 4 * SEC), (1, 4, 12 * SEC), (1, 8, 13 * SEC)])
    out = tumbling_window_tb(
        df, ["key"], "ts", 10 * SEC, [F.sum("value").alias("s")],
        offset_us=BASE_US + 3 * SEC,
    )
    got = {
        ((r.w_start - dt.datetime(2024, 1, 1)).total_seconds(), r.s)
        for r in out.collect()
    }
    # ts=0 → window [-7, 3); ts=4,12 → [3, 13); ts=13 → [13, 23)
    assert got == {(-7.0, 1), (3.0, 6), (13.0, 8)}


def test_tumbling_tb_offset_zero_matches_default(spark):
    df = _mk(spark, [(1, 10, 0), (1, 20, 1 * SEC), (2, 5, 3 * SEC)])
    a = tumbling_window_tb(df, ["key"], "ts", 2 * SEC, [F.sum("value").alias("s")])
    b = tumbling_window_tb(
        df, ["key"], "ts", 2 * SEC, [F.sum("value").alias("s")], offset_us=0
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
