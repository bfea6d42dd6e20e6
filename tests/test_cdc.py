"""CDC upsert (operators/cdc.upsert_latest) and Welch t-test unit tests."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F


def _merge(spark, base_rows, change_rows):
    from windflow_spark.operators.cdc import upsert_latest

    base = spark.createDataFrame(base_rows, "k long, val double, tag string")
    ch = spark.createDataFrame(
        change_rows, "k long, ts long, seq long, val double, op string"
    )
    out = upsert_latest(base, ch, "k", ["ts", "seq"], op_col="op")
    return {r["k"]: r for r in out.collect()}


def test_upsert_paths(spark):
    base = [Row(k=1, val=10.0, tag="a"), Row(k=2, val=20.0, tag="b"),
            Row(k=3, val=30.0, tag="c")]
    ch = [
        # k=1: two updates — later (ts=5) wins
        Row(k=1, ts=1, seq=1, val=11.0, op="U"),
        Row(k=1, ts=5, seq=2, val=12.0, op="U"),
        # k=2: update then delete — delete wins
        Row(k=2, ts=1, seq=3, val=21.0, op="U"),
        Row(k=2, ts=9, seq=4, val=0.0, op="D"),
        # k=4: insert of a change-only key
        Row(k=4, ts=2, seq=5, val=40.0, op="U"),
        # k=5: delete of a key absent from base — stays absent
        Row(k=5, ts=2, seq=6, val=0.0, op="D"),
    ]
    got = _merge(spark, base, ch)
    assert set(got) == {1, 3, 4}
    assert got[1]["val"] == 12.0 and got[1]["_merge_src"] == "updated"
    assert got[1]["tag"] == "a"  # non-shared base column survives updates
    assert got[3]["val"] == 30.0 and got[3]["_merge_src"] == "base"
    assert got[4]["val"] == 40.0 and got[4]["_merge_src"] == "inserted"
    assert got[4]["tag"] is None


def test_upsert_tiebreak_by_seq(spark):
    # equal ts: the higher seq is the later change in the feed and wins
    base = [Row(k=7, val=1.0, tag="x")]
    ch = [
        Row(k=7, ts=3, seq=10, val=100.0, op="U"),
        Row(k=7, ts=3, seq=11, val=200.0, op="U"),
    ]
    got = _merge(spark, base, ch)
    assert got[7]["val"] == 200.0


def test_welch_ttest_matches_closed_form(spark):
    from windflow_spark.functions.pipeline import welch_ttest

    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.0, 2.5, 3.5]
    rows = [Row(g="A", v=x) for x in a] + [Row(g="B", v=x) for x in b]
    df = spark.createDataFrame(rows)
    r = welch_ttest(df, "g", "v", "A", "B").collect()[0]

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, v

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dfw = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert r["n_a"] == na and r["n_b"] == nb
    assert abs(r["t_stat"] - t) < 1e-6
    assert abs(r["df_welch"] - dfw) < 1e-6
    assert abs(r["mean_a"] - ma) < 1e-6 and abs(r["var_b"] - vb) < 1e-6


def test_ab_split_is_balanced_and_null(spark):
    # the md5 A/B split of a random user population should be ~50/50 and
    # the t statistic should read as a null effect at thousands of df
    from windflow_spark.queries import ab_test_welch

    r = ab_test_welch(spark, "/root/testdata/sf0.001").collect()[0]
    tot = r["n_a"] + r["n_b"]
    assert 0.4 < r["n_a"] / tot < 0.6
    assert abs(r["t_stat"]) < 4.0


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    # the merged base+delta partials must equal a direct full aggregation
    from windflow_spark.queries import incremental_agg_merge
    from windflow_spark.tables import load_table

    e = load_table(spark, "events", sf_dir)
    full = (
        e.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    got = {(r["day"], r["event_type"]): r for r in
           incremental_agg_merge(spark, sf_dir).collect()}
    want = {(r["day"], r["event_type"]): r for r in full.collect()}
    assert set(got) == set(want)
    for key, r in want.items():
        assert got[key]["n_events"] == r["n_events"]
        assert abs(got[key]["sum_value"] - r["sum_value"]) < 1e-9
