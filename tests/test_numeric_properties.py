"""Property-based parity for the r6 numeric operators (hypothesis):
random per-key series must agree with direct Python models — the
reference's randomized-parity test philosophy (SURVEY.md §5) applied to
the EWMA fold, TWAP duration weighting, and PageRank invariants."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal


def _r6(x: float) -> float:
    # Spark F.round semantics: decimal HALF_UP on the exact binary value
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

US_DAY = 86_400_000_000

series_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),            # key
        st.integers(min_value=0, max_value=20), # day bucket
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=series_strategy)
def test_ewma_fold_matches_python_exactly(spark, rows):
    df = spark.createDataFrame(
        [(k, d * US_DAY + 7) for k, d in rows], "k string, us long"
    ).select("k", F.timestamp_micros("us").alias("ts"))
    from windflow_spark.operators.timeseries import ewma_smooth

    got = {
        (r.k, int(r.bucket_start.timestamp() * 1_000_000) // US_DAY): (r.cnt, r.ewma)
        for r in ewma_smooth(df, ["k"], "ts", alpha=0.25).collect()
    }
    counts = defaultdict(int)
    for k, d in rows:
        counts[(k, d)] += 1
    series = defaultdict(list)
    for (k, d), c in sorted(counts.items()):
        series[k].append((d, c))
    expect = {}
    for k, pts in series.items():
        e = None
        for d, c in pts:
            e = float(c) if e is None else 0.25 * c + 0.75 * e
            expect[(k, d)] = (c, _r6(e))
    assert got == expect


twap_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2 * US_DAY - 1),  # us within 2 days
        st.integers(min_value=-50, max_value=50),            # value
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=twap_strategy)
def test_twap_duration_weighting_matches_python(spark, rows):
    from windflow_spark.operators.timeutil import event_micros  # noqa: F401

    df = spark.createDataFrame(
        [("x", us, float(v)) for us, v in rows],
        "event_type string, us long, value double",
    ).select("event_type", F.timestamp_micros("us").alias("ts"), "value")
    from windflow_spark.queries import US_DAY as QUS_DAY, ts_twap_daily  # noqa: F401

    # inline the same op the query uses, on this frame
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type", "day").orderBy("us", "value")
    d0 = df.select(
        "event_type", F.unix_micros("ts").alias("us"), "value"
    ).withColumn("day", (F.col("us") / F.lit(US_DAY)).cast("long"))
    dur = (
        F.coalesce(F.lead("us").over(w), (F.col("day") + 1) * F.lit(US_DAY))
        - F.col("us")
    )
    a = (
        d0.withColumn("dur", dur)
        .groupBy("event_type", "day")
        .agg(
            (F.sum(F.col("value") * F.col("dur")) / F.sum("dur")).alias("twap"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    got = {r.day: (r.n, round(r.twap, 6)) for r in a.collect()}

    by_day = defaultdict(list)
    for us, v in rows:
        by_day[us // US_DAY].append((us, float(v)))
    expect = {}
    for day, pts in by_day.items():
        pts.sort()
        vw = wsum = 0.0
        for i, (us, v) in enumerate(pts):
            nxt = pts[i + 1][0] if i + 1 < len(pts) else (day + 1) * US_DAY
            vw += v * (nxt - us)
            wsum += nxt - us
        expect[day] = (len(pts), _r6(vw / wsum))
    assert set(got) == set(expect)
    for day in got:
        assert got[day][0] == expect[day][0]
        assert math.isclose(got[day][1], expect[day][1], rel_tol=1e-9, abs_tol=1e-6)


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=15,
    unique=True,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_pagerank_matches_python_model_random_graphs(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    from windflow_spark.operators.graph import pagerank

    got = {r.node: r.pr for r in pagerank(df, iters=2, damping=0.85).collect()}

    outdeg, inc = defaultdict(int), defaultdict(list)
    nodes = set()
    for s, d in edges:
        outdeg[s] += 1
        inc[d].append(s)
        nodes |= {s, d}
    r = {n: 1.0 for n in nodes}
    for _ in range(2):
        r = {
            n: (1.0 - 0.85)
            + 0.85 * sum(r[s] / outdeg[s] for s in inc.get(n, []))
            for n in nodes
        }
    assert set(got) == nodes
    for n in nodes:
        assert math.isclose(got[n], _r6(r[n]), abs_tol=2e-6), n
        assert got[n] >= round(1.0 - 0.85, 6) - 1e-9  # base mass floor


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=series_strategy)
def test_holt_fold_matches_python_exactly(spark, rows):
    """Random per-key series: the JVM Holt fold must equal the direct
    Python recurrence bit-for-bit (same IEEE sequence, HALF_UP emission
    rounding) — the EWMA property test's shape, which caught the real
    half-even rounding drift in r6, applied to the two-state fold."""
    df = spark.createDataFrame(
        [(k, d * US_DAY + 7) for k, d in rows], "k string, us long"
    ).select("k", F.timestamp_micros("us").alias("ts"))
    from windflow_spark.operators.timeseries import holt_smooth

    got = {
        (r.k, int(r.bucket_start.timestamp() * 1_000_000) // US_DAY): (
            r.cnt,
            r.level,
            r.trend,
            r.forecast_next,
        )
        for r in holt_smooth(df, ["k"], "ts", alpha=0.5, beta=0.25).collect()
    }
    counts = defaultdict(int)
    for k, d in rows:
        counts[(k, d)] += 1
    series = defaultdict(list)
    for (k, d), c in sorted(counts.items()):
        series[k].append((d, c))
    expect = {}
    for k, pts in series.items():
        lvl = trd = None
        for d, c in pts:
            if lvl is None:
                lvl, trd = float(c), 0.0
            else:
                new_l = 0.5 * c + 0.5 * (lvl + trd)
                trd = 0.25 * (new_l - lvl) + 0.75 * trd
                lvl = new_l
            expect[(k, d)] = (c, _r6(lvl), _r6(trd), _r6(lvl + trd))
    assert got == expect
