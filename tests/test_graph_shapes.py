"""DAG-topology tests mirroring the reference's graph_tests family
(tests/graph_tests/test_graph_*.cpp: 15 DAG shapes combining merge+split
with per-row ops and windows, validated by run-invariant checksums under
randomized parallelism — SURVEY.md §5).

Here each shape is built twice through the PipeGraph facade at different
shuffle widths; the result set must be identical, and match a directly
computed expectation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from windflow_spark import PipeGraph

SEC = 1_000_000


def _events(spark, n=60):
    return spark.createDataFrame(
        [
            (i % 4, i, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=i * 300_000))
            for i in range(n)
        ],
        "key long, value long, ts timestamp",
    )


def _run_shape(spark, build, widths=("3", "5")):
    outs = []
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for w in widths:
            spark.conf.set("spark.sql.shuffle.partitions", w)
            outs.append(sorted(map(tuple, build().collect())))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert outs[0] == outs[1]
    return outs[0]


def test_shape_split_transform_merge_window(spark):
    """source → split(even/odd value) → distinct maps → merge → TB window
    (the reference's split+merge+win composite, e.g. test_graph_7)."""
    df = _events(spark)

    def build():
        g = PipeGraph(spark, "shape1")
        src = g.add_source(df)
        even, odd = src.split([F.col("value") % 2 == 0, F.col("value") % 2 == 1])
        even = even.with_column("value", F.col("value") * 10)
        odd = odd.with_column("value", F.col("value") * -1)
        merged = even.merge(odd)
        return (
            merged.keyed_windows_tb(
                ["key"], "ts", 3 * SEC, None,
                [F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv")],
            )
            .add(lambda d: d.select("key", "w_start", "cnt", "sv"))
            .add_sink()
        )

    rows = _run_shape(spark, build)
    # checksum equivalent: totals must match a direct computation
    total = sum(r[3] for r in rows)
    expect = sum(v * 10 if v % 2 == 0 else -v for v in range(60))
    assert total == expect


def test_shape_two_sources_merge_reduce(spark):
    """two sources → merge → filter → rolling reduce (merge_tests shape)."""
    a = _events(spark, 30)
    b = _events(spark, 30).withColumn("value", F.col("value") + 100)

    def build():
        g = PipeGraph(spark, "shape2")
        pa = g.add_source(a)
        pb = g.add_source(b)
        merged = pa.merge(pb).filter(F.col("value") % 3 != 0)
        return merged.reduce(
            ["key"], ["ts", "value"], {"running_sum": F.sum("value")}
        ).add_sink()

    rows = _run_shape(spark, build)
    # per-input emission: one output row per surviving input
    survivors = [v for v in range(30) if v % 3 != 0] + [
        v + 100 for v in range(30) if (v + 100) % 3 != 0
    ]
    assert len(rows) == len(survivors)
    # the final running sum per key across both sources must equal the
    # key's total — order-insensitive checksum like the reference sinks
    per_key_final = {}
    for r in rows:
        per_key_final[r[0]] = max(per_key_final.get(r[0], 0), r[-1])
    total_from_reduce = sum(per_key_final.values())
    assert total_from_reduce == sum(survivors)


def test_shape_multi_sink_graph(spark):
    """The reference's test_graph_5 topology: two sources → per-source maps
    → merge → filter → split into TWO SINKS, plus an independent third
    source → flatmap → its own sink — one PipeGraph, three sinks, all
    validated in the same run (multi-sink DAGs are first-class in the
    reference; here each add_sink returns its branch's frame)."""
    a = _events(spark, 30)
    b = _events(spark, 30).withColumn("value", F.col("value") + 1000)
    c = spark.createDataFrame(
        [(1, "x y"), (2, "z w q")], "id long, text string"
    )

    def build():
        g = PipeGraph(spark, "shape4")
        pa = g.add_source(a).with_column("value", F.col("value") * 2)
        pb = g.add_source(b).with_column("value", F.col("value") + 1)
        merged = pa.merge(pb).filter(F.col("value") % 5 != 0)
        lo, hi = merged.split([F.col("value") < 1000, F.col("value") >= 1000])
        s1 = lo.add(lambda d: d.groupBy("key").agg(F.sum("value").alias("sv"))).add_sink()
        s2 = hi.add(lambda d: d.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))).add_sink()
        s3 = (
            g.add_source(c)
            .flat_map(F.split("text", " "), "tok", keep=["id"])
            .add_sink()
        )
        return s1, s2, s3

    s1, s2, s3 = build()
    lo_vals = [v * 2 for v in range(30) if (v * 2) % 5 != 0 and v * 2 < 1000]
    hi_vals = [v + 1001 for v in range(30) if (v + 1001) % 5 != 0]
    assert sum(r.sv for r in s1.collect()) == sum(lo_vals)
    assert sum(r.cnt for r in s2.collect()) == len(hi_vals)
    assert sorted(r.tok for r in s3.collect()) == ["q", "w", "x", "y", "z"]


def test_shape_nested_split(spark):
    """Split of a split branch (nested content-based routing — the
    reference allows arbitrary re-splitting of MultiPipes)."""
    df = _events(spark, 40)

    def build():
        g = PipeGraph(spark, "shape5")
        src = g.add_source(df)
        even, odd = src.split([F.col("value") % 2 == 0, F.col("value") % 2 == 1])
        small_even, big_even = even.split(
            [F.col("value") < 20, F.col("value") >= 20]
        )
        return (
            small_even.merge(big_even, odd)
            .add(lambda d: d.groupBy("key").agg(F.sum("value").alias("sv")))
            .add_sink()
        )

    rows = _run_shape(spark, build)
    assert sum(r[1] for r in rows) == sum(range(40))


def test_shape_window_then_merge(spark):
    """Windowed aggregate of one pipe merged with a mapped second pipe,
    then filtered — merge after a window operator (the reference merges
    arbitrary pipes as long as output types match)."""
    a = _events(spark, 36)
    b = _events(spark, 12)

    def build():
        g = PipeGraph(spark, "shape6")
        wa = (
            g.add_source(a)
            .keyed_windows_tb(
                ["key"], "ts", 3 * SEC, None, [F.sum("value").alias("sv")]
            )
            .add(lambda d: d.select("key", F.col("sv").alias("value")))
        )
        mb = g.add_source(b).map("key", (F.col("value") * 100).alias("value"))
        return wa.merge(mb).filter(F.col("value") > 0).add_sink()

    rows = _run_shape(spark, build)
    # checksum: window sums partition the 36 values; mapped side adds 100×v
    assert sum(r[1] for r in rows) == sum(range(36)) + sum(
        v * 100 for v in range(12) if v > 0
    )


def test_shape_multicast_split(spark):
    """split with overlapping predicates = multicast (vector<int> routing,
    wf/splitting_emitter.hpp:49-62): a row may reach several branches."""
    df = _events(spark, 40)

    def build():
        g = PipeGraph(spark, "shape3")
        src = g.add_source(df)
        small, big, all_ = src.split(
            [F.col("value") < 30, F.col("value") >= 10, F.lit(True)]
        )
        return (
            small.merge(big, all_)
            .add(lambda d: d.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")))
            .add_sink()
        )

    rows = _run_shape(spark, build)
    # each value v: (v<30) + (v>=10) + 1 copies — 40 rows → 30+30+40 = 100
    assert sum(r[1] for r in rows) == 100


def test_facade_session_asof_kslack(spark):
    """The r4 facade additions must route to the proven operators: session
    windows, backward as-of join, and the K-slack reorder replay."""
    df = _events(spark, 24)
    g = PipeGraph(spark, "shape_r4")
    src = g.add_source(df)

    sess = src.session_windows(
        ["key"], "ts", ["ts", "value"], 2 * SEC,
        [F.count(F.lit(1)).alias("cnt")],
    ).add_sink()
    assert sess.count() > 0 and "sid" in sess.columns

    quotes = g.add_source(
        df.select("key", F.col("ts").alias("qts"), F.col("value").alias("qv"))
    )
    asof = src.asof_join(quotes, ["key"], "ts", "qts", ["qv"]).add_sink()
    assert asof.count() == 24 and "b_qv" in asof.columns

    ks = src.kslack(["key"], "ts", "value").add_sink()
    assert "emit_seq" in ks.columns and ks.count() <= 24  # horizon may drop


def test_flat_map_py_udtf_imperative_emit(spark):
    # the UDTF escape hatch must support genuinely imperative emission —
    # here: variable fan-out with early stop, state across yields within a
    # row — and pass keep-columns through the lateral join
    from pyspark.sql import functions as F  # noqa: F401

    from windflow_spark.core.graph import MultiPipe, PipeGraph

    df = spark.createDataFrame(
        [(1, "a bb ccc dddd"), (2, "zz"), (3, "")], "id long, text string"
    )
    mp = MultiPipe(PipeGraph(spark), df)

    def running_prefix(text):
        # emit tokens until the running char total would exceed 6
        total = 0
        for w in (text or "").split():
            total += len(w)
            if total > 6:
                return
            yield w, total

    out = mp.flat_map_py(
        running_prefix, "tok: string, run_len: int", ["text"], keep=["id"]
    ).df
    got = sorted((r.id, r.tok, r.run_len) for r in out.collect())
    assert got == [(1, "a", 1), (1, "bb", 3), (1, "ccc", 6), (2, "zz", 2)]
