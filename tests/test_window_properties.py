"""Property-based window-assignment parity (hypothesis): for random
(length, slide) configs and random per-key event streams, the DataFrame
window operators must agree with a direct Python simulation of the
reference's assignment rules (wf/window_replica.hpp:267-284 — a tuple with
index i, where index = per-key progressive id for CB and timestamp for TB,
belongs to every window w with w*slide <= i < w*slide + len).

This is the reference's own test philosophy (SURVEY.md §5) upgraded from
fixed DAG shapes to randomized configs."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from windflow_spark.operators.windows import (
    sliding_window_cb,
    sliding_window_tb,
    tumbling_window_cb,
    tumbling_window_tb,
)

EPOCH = dt.datetime(1970, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, v, EPOCH + dt.timedelta(microseconds=ts)) for k, v, ts in rows],
        "key long, value long, ts timestamp",
    )


def _model_tb(rows, length, slide):
    """Reference TB assignment: row at ts joins every w with
    w*slide <= ts < w*slide + length, w >= 0."""
    out = defaultdict(lambda: [0, 0])  # (key, w) -> [cnt, sum]
    for k, v, ts in rows:
        w_hi = ts // slide
        w_lo = max(0, (ts - length) // slide + 1)
        for w in range(w_lo, w_hi + 1):
            if w * slide <= ts < w * slide + length:
                out[(k, w * slide)][0] += 1
                out[(k, w * slide)][1] += v
    return {kw: tuple(cs) for kw, cs in out.items()}


def _model_cb(rows, length, slide):
    """Reference CB assignment over per-key progressive ids (arrival order
    = the deterministic (ts, value) order used by the operator)."""
    out = defaultdict(lambda: [0, 0])
    per_key = defaultdict(list)
    for k, v, ts in rows:
        per_key[k].append((ts, v))
    for k, evs in per_key.items():
        for i, (_, v) in enumerate(sorted(evs)):
            w_hi = i // slide
            w_lo = max(0, (i - length) // slide + 1)
            for w in range(w_lo, w_hi + 1):
                if w * slide <= i < w * slide + length:
                    out[(k, w)][0] += 1
                    out[(k, w)][1] += v
    return {kw: tuple(cs) for kw, cs in out.items()}


events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # key
        st.integers(min_value=-50, max_value=50),     # value
        st.integers(min_value=0, max_value=400),      # ts (µs)
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: (r[0], r[2]),  # unique (key, ts): total order per key
)
cfg = st.tuples(
    st.integers(min_value=1, max_value=12),  # length
    st.integers(min_value=1, max_value=12),  # slide (len<slide = gaps)
)


@given(rows=events, cfg=cfg)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_tb_windows_match_reference_model(spark, rows, cfg):
    length, slide = cfg
    aggs = [F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv")]
    fn = (
        tumbling_window_tb(_df(spark, rows), ["key"], "ts", length, aggs)
        if length == slide
        else sliding_window_tb(_df(spark, rows), ["key"], "ts", length, slide, aggs)
    )
    # Exact integer µs extraction — a float .timestamp() round-trip truncates
    # e.g. 249 µs to 248 and reports phantom off-by-ones (VERDICT r1 §wrong-1).
    got = {
        (r.key, (r.w_start - EPOCH) // dt.timedelta(microseconds=1)): (r.cnt, r.sv)
        for r in fn.collect()
    }
    assert got == _model_tb(rows, length, slide)


@given(rows=events, cfg=cfg)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_cb_windows_match_reference_model(spark, rows, cfg):
    length, slide = cfg
    aggs = [F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv")]
    fn = (
        tumbling_window_cb(_df(spark, rows), ["key"], ["ts", "value"], length, aggs)
        if length == slide
        else sliding_window_cb(_df(spark, rows), ["key"], ["ts", "value"], length, slide, aggs)
    )
    got = {(r.key, r.wid): (r.cnt, r.sv) for r in fn.collect()}
    assert got == _model_cb(rows, length, slide)


@given(rows=events, cfg=cfg)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_paned_windows_match_reference_model(spark, rows, cfg):
    """Paned_Windows (PLQ/WLQ two-level aggregation) must agree with the
    direct TB assignment model for RANDOM (length, slide) configs —
    including hopping (length < slide), where a pane can belong to zero
    windows (the r1 ADVICE descending-sequence bug class)."""
    from windflow_spark.operators.windows import paned_window_tb

    length, slide = cfg
    got = {
        (r.key, (r.w_start - EPOCH) // dt.timedelta(microseconds=1)): (r.cnt, r.sv)
        for r in paned_window_tb(
            _df(spark, rows),
            ["key"],
            "ts",
            length,
            slide,
            pane_aggs=[F.count(F.lit(1)).alias("c"), F.sum("value").alias("s")],
            final_aggs=[F.sum("c").alias("cnt"), F.sum("s").alias("sv")],
        ).collect()
    }
    assert got == _model_tb(rows, length, slide)


session_cfg = st.integers(min_value=1, max_value=20)  # gap µs


@given(rows=events, gap=session_cfg)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_session_windows_match_model(spark, rows, gap):
    """Gaps-and-islands session assignment vs a direct model: consecutive
    per-key events merge while the inter-event gap is <= gap_us; a larger
    gap opens a new session. Checks per-session (start, cnt, sum)."""
    from windflow_spark.operators.windows import session_window_agg

    got = {
        (r.key, (r.s_start - EPOCH) // dt.timedelta(microseconds=1)): (r.cnt, r.sv)
        for r in session_window_agg(
            _df(spark, rows), ["key"], "ts", ["ts"], gap,
            [F.min("ts").alias("s_start"), F.count(F.lit(1)).alias("cnt"),
             F.sum("value").alias("sv")],
        ).collect()
    }
    expect = {}
    per_key = defaultdict(list)
    for k, v, ts in rows:
        per_key[k].append((ts, v))
    for k, evs in per_key.items():
        evs.sort()
        start, cnt, sv, prev = None, 0, 0, None
        for ts, v in evs:
            if prev is None or ts - prev > gap:
                if start is not None:
                    expect[(k, start)] = (cnt, sv)
                start, cnt, sv = ts, 0, 0
            cnt += 1
            sv += v
            prev = ts
        expect[(k, start)] = (cnt, sv)
    assert got == expect


asof_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # key
        st.integers(min_value=0, max_value=60),    # ts
        st.integers(min_value=-9, max_value=9),    # payload value (may repeat)
    ),
    min_size=1,
    max_size=25,
)


@given(a_rows=asof_events, b_rows=asof_events, how=st.sampled_from(["left", "inner"]))
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_model(spark, a_rows, b_rows, how):
    """asof_join_backward vs a direct model: per a-row, the b-row of the
    same key with the largest ts <= a.ts; ties on b_ts resolve to the
    greatest payload struct (documented contract). Exercises duplicate
    timestamps on both sides and null-free/inner drop behavior."""
    from windflow_spark.operators.asof_join import asof_join_backward

    a = spark.createDataFrame(
        [(k, i, t) for i, (k, t, _) in enumerate(a_rows)], "key long, aid long, ts long"
    )
    b = spark.createDataFrame(
        [(k, t, v) for k, t, v in b_rows], "key long, ts long, bval long"
    )
    out = asof_join_backward(a, b, ["key"], "ts", "ts", ["ts", "bval"], how=how)
    got = sorted(
        (r.key, r.aid, r.b_ts, r.b_bval) for r in out.collect()
    )
    expect = []
    for i, (k, t, _) in enumerate(a_rows):
        cands = [(bt, bv) for bk, bt, bv in b_rows if bk == k and bt <= t]
        if cands:
            bt, bv = max(cands)  # latest ts, then greatest payload (ts first)
            expect.append((k, i, bt, bv))
        elif how == "left":
            expect.append((k, i, None, None))
    assert got == sorted(expect)


join_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=100),    # value (id)
        st.integers(min_value=0, max_value=200),    # ts µs
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: (r[0], r[1]),
)
bounds = st.tuples(
    st.integers(min_value=-30, max_value=30),
    st.integers(min_value=-30, max_value=30),
).map(lambda t: (min(t), max(t)))


@given(a_rows=join_events, b_rows=join_events, bounds=bounds, dp=st.booleans())
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_interval_join_matches_reference_model(spark, a_rows, b_rows, bounds, dp):
    from windflow_spark.operators.interval_join import interval_join

    lower, upper = bounds
    j = interval_join(
        _df(spark, a_rows), _df(spark, b_rows), ["key"], "ts", "ts",
        lower, upper, broadcast_side="b" if dp else None,
    )
    got = sorted((r[0], r[1]) for r in j.select("a.value", "b.value").collect())
    # reference semantics (wf/builders.hpp:1480-1493): same key, inclusive
    # bounds — ts(b) in [ts(a)+lower, ts(a)+upper]
    expect = sorted(
        (av, bv)
        for ak, av, ats in a_rows
        for bk, bv, bts in b_rows
        if ak == bk and ats + lower <= bts <= ats + upper
    )
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),                      # key
            st.integers(0, 99),                     # value
            st.integers(0, 40_000_000),             # ts µs
        ),
        min_size=1,
        max_size=60,
    ),
    lower=st.integers(-5_000_000, 5_000_000),
    span=st.integers(0, 10_000_000),
    width=st.one_of(st.none(), st.integers(500_000, 20_000_000)),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_interval_join_bucketed_matches_model(spark, rows, lower, span, width):
    """Reference interval-join semantics (wf/interval_join.hpp:279-295:
    match when ts(b) ∈ [ts(a)+lower, ts(a)+upper], inclusive) — the
    time-bucket-blocked form must match a direct Python model for random
    bounds, bucket widths (including widths smaller than the span), and
    streams, with no duplicate pairs from the A-side replication."""
    from windflow_spark.operators.interval_join import interval_join_bucketed

    upper = lower + span
    a_rows = [(k, v, ts) for k, v, ts in rows if v % 2 == 0]
    b_rows = [(k, v, ts) for k, v, ts in rows if v % 2 == 1]
    model = sorted(
        (ka, va, vb)
        for ka, va, ta in a_rows
        for kb, vb, tb in b_rows
        if ka == kb and ta + lower <= tb <= ta + upper
    )
    if not a_rows or not b_rows:
        return
    got_df = interval_join_bucketed(
        _df(spark, a_rows), _df(spark, b_rows), ["key"], "ts", "ts",
        lower, upper, bucket_us=width,
    )
    got = sorted(
        (r[0], r[1], r[2])
        for r in got_df.select(
            F.col("a.key"), F.col("a.value"), F.col("b.value")
        ).collect()
    )
    assert got == model


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=20),
        min_size=1,
        max_size=12,
    ),
    seg=st.integers(1, 5),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_dedup_segments_matches_model(spark, docs, seg):
    """Segment dedup vs a direct model: cut each doc into seg-token chunks,
    first (doc_id, seg_idx) occurrence of each distinct chunk survives,
    docs rebuild from survivors in order; all-dup docs vanish."""
    from windflow_spark.functions.dedup import dedup_segments

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    seen, model = set(), {}
    for i, toks in enumerate(docs):
        kept = []
        chunks = [toks[j : j + seg] for j in range(0, len(toks), seg)]
        for ch in chunks:
            key = " ".join(ch)
            if key and key not in seen:
                seen.add(key)
                kept.append(key)
        if kept:
            model[i] = (" ".join(kept), len(kept))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept)
        for r in dedup_segments(df, seg_tokens=seg).collect()
    }
    assert got == model


# ---- full-outer bucketed interval join vs a direct model (r8) ----

ij_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=300),    # ts (µs)
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),
)
ij_cfg = st.tuples(
    st.integers(min_value=-8, max_value=8),   # lower
    st.integers(min_value=0, max_value=12),   # upper-lower span
    st.integers(min_value=1, max_value=20),   # bucket width
)


def _model_full_join(a_rows, b_rows, lower, upper):
    """Direct full-outer interval-join model: all (a, b) pairs with equal
    key and ts_b in [ts_a+lower, ts_a+upper], plus null-extended unmatched
    rows from BOTH sides — each exactly once."""
    pairs = []
    a_matched, b_matched = set(), set()
    for ia, (ka, ta) in enumerate(a_rows):
        for ib, (kb, tb) in enumerate(b_rows):
            if ka == kb and ta + lower <= tb <= ta + upper:
                pairs.append((ka, ta, tb))
                a_matched.add(ia)
                b_matched.add(ib)
    for ia, (ka, ta) in enumerate(a_rows):
        if ia not in a_matched:
            pairs.append((ka, ta, None))
    for ib, (kb, tb) in enumerate(b_rows):
        if ib not in b_matched:
            pairs.append((kb, None, tb))
    return sorted(pairs, key=repr)


@given(a_rows=ij_rows, b_rows=ij_rows, cfg=ij_cfg)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_full_outer_bucketed_interval_join_matches_model(spark, a_rows, b_rows, cfg):
    """r8 union-of-two-outer decomposition: for random inputs, bounds, and
    bucket widths (including widths smaller than the span, i.e. >2
    replicas), the full-outer bucketed join must emit every matching pair
    exactly once and every unmatched row of BOTH sides exactly once —
    never once per replica."""
    from windflow_spark.operators.interval_join import interval_join_full_bucketed

    lower, span, width = cfg
    upper = lower + span
    a = _df(spark, [(k, 0, ts) for k, ts in a_rows]).drop("value")
    b = _df(spark, [(k, 0, ts) for k, ts in b_rows]).drop("value")
    out = interval_join_full_bucketed(
        a, b, ["key"], "ts", "ts", lower, upper, bucket_us=width
    )
    def _us(t):
        if t is None:
            return None
        td = t - EPOCH  # exact integer micros — total_seconds()*1e6 truncates
        return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds

    got = sorted(
        ((r["key"], _us(r["a_ts"]), _us(r["b_ts"])) for r in out.collect()),
        key=repr,
    )
    assert got == _model_full_join(a_rows, b_rows, lower, upper)


# ---- as-of joins vs a direct model (r8) ----

asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=200),    # ts
    ),
    min_size=0,
    max_size=20,
)


@given(a_rows=asof_rows, b_rows=asof_rows)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_backward_and_forward_match_model(spark, a_rows, b_rows):
    """For random inputs INCLUDING duplicate (key, ts) rows on both sides,
    backward picks the latest b at-or-before (greatest payload on ties),
    forward the earliest b at-or-after (least payload on ties) — the
    documented struct tie-breaks, checked against a direct model."""
    from windflow_spark.operators.asof_join import (
        asof_join_backward,
        asof_join_forward,
    )

    # payload id = arrival index → duplicates on (key, ts) are real rows
    a = spark.createDataFrame(
        [(k, i, EPOCH + dt.timedelta(microseconds=ts)) for i, (k, ts) in enumerate(a_rows)],
        "key long, aid long, ts timestamp",
    )
    b = spark.createDataFrame(
        [(k, i, EPOCH + dt.timedelta(microseconds=ts)) for i, (k, ts) in enumerate(b_rows)],
        "key long, bid long, ts timestamp",
    )

    def model(direction):
        out = []
        for ia, (ka, ta) in enumerate(a_rows):
            cands = [
                (tb, ib)
                for ib, (kb, tb) in enumerate(b_rows)
                if kb == ka and (tb <= ta if direction == "backward" else tb >= ta)
            ]
            if not cands:
                out.append((ka, ia, None))
            elif direction == "backward":
                # latest ts; ties → GREATEST (bid) payload
                tb, ib = max(cands)
                out.append((ka, ia, ib))
            else:
                # earliest ts; ties → LEAST (bid) payload
                tb, ib = min(cands)
                out.append((ka, ia, ib))
        return sorted(out, key=repr)

    got_b = sorted(
        ((r["key"], r["aid"], r["b_bid"]) for r in
         asof_join_backward(a, b, ["key"], "ts", "ts", ["bid"]).collect()),
        key=repr,
    )
    assert got_b == model("backward")
    got_f = sorted(
        ((r["key"], r["aid"], r["b_bid"]) for r in
         asof_join_forward(a, b, ["key"], "ts", "ts", ["bid"]).collect()),
        key=repr,
    )
    assert got_f == model("forward")
