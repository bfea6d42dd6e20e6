"""Focused tests for the round-12 OPTIMIZATION changes to operator
internals (OPTIMIZATION_r12.md): the rewrites must keep their structural
properties (shared exchanges, in-plan scalars, grouped-bucket pair
expansion) — the full oracle gate separately proves the results are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from windflow_spark.plans.explain import physical_plan


def test_assoc_rules_lift_no_window_no_eager_count(spark, sf_dir):
    """r12: the pair miner derives per-item counts via a guarded
    broadcast join (no full-frame pk window) and attaches the basket
    total as an in-plan one-row cross join (no eager driver count job).
    """
    from windflow_spark.queries import assoc_rules_lift

    df = assoc_rules_lift(spark, sf_dir)
    plan = physical_plan(df)
    # the old shape had a count() window partitioned by pk
    assert "windowspecdefinition" not in plan
    # the one-row basket total rides a broadcast nested loop cross join
    assert "BroadcastNestedLoopJoin" in plan


def test_recsys_eval_shared_base_single_join(spark, sf_dir):
    """r12: the temporal-holdout eval queries derive BOTH halves from one
    persisted join frame — the plan must scan lineitem exactly once and
    contain no driver-side cut (the midpoint rides a broadcast one-row
    aggregate, so the plan includes the orders min/max agg subtree)."""
    from windflow_spark.queries import recsys_hitrate_at3

    df = recsys_hitrate_at3(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("lineitem.parquet") <= 1, (
        "train AND test halves must come from the single persisted "
        "lineitem join, not one scan per half"
    )


def test_knn_graph_lsh_grouped_bucket_pairs(spark, sf_dir):
    """r12: candidate pairs are expanded IN-ROW from grouped buckets —
    no bucket self-join (SortMergeJoin) and only the final top-3 window
    remains (the bucket-cap window is replaced by slice(sorted ids))."""
    from windflow_spark.queries import knn_graph_lsh

    df = knn_graph_lsh(spark, sf_dir)
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan
    # exactly one window spec: the final per-query rank
    assert plan.count("windowspecdefinition(qid#") == plan.count(
        "windowspecdefinition("
    )


def test_knn_graph_lsh_bucket_cap_slice_equivalence(spark):
    """slice(array_sort(collect_list(id)), 1, cap) keeps the same id set
    as row_number() over (partition by bucket order by id) <= cap — the
    truncation identity the r12 rewrite relies on."""
    rows = [(b, i) for b in range(3) for i in range(7, -1, -1)]
    df = spark.createDataFrame(rows, "bkt int, vec_id long")
    cap = 5
    grouped = df.groupBy("bkt").agg(
        F.slice(F.array_sort(F.collect_list("vec_id")), 1, cap).alias("ids")
    )
    got = {
        (r["bkt"], i) for r in grouped.collect() for i in r["ids"]
    }
    from pyspark.sql import Window as W

    w = W.partitionBy("bkt").orderBy("vec_id")
    ranked = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("bkt", "vec_id")
    )
    want = {(r["bkt"], r["vec_id"]) for r in ranked.collect()}
    assert got == want
