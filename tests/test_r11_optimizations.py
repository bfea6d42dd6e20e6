"""Focused tests for the round-11 OPTIMIZATION changes to operator
internals (OPTIMIZATION_r11.md): the changes must keep their structural
properties (one shared exchange, checkpoint fan-out, broadcast joins,
exact count folding) — the full oracle gate separately proves the
results are unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from windflow_spark.plans.explain import keyed_shuffle_count, physical_plan


def test_capped_baskets_partitioning_shared_downstream(spark, sf_dir):
    """capped_baskets establishes hash(ck) once; a downstream ck-keyed
    aggregation must introduce NO additional keyed exchange (the subset
    clustering rule the r11 recsys optimization relies on)."""
    from windflow_spark.operators.recsys import capped_baskets
    from windflow_spark.tables import load_table

    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    b = capped_baskets(li, o, basket_cap=10)
    base = keyed_shuffle_count(b)
    agged = b.groupBy("ck").agg(F.count(F.lit(1)).alias("n"))
    assert keyed_shuffle_count(agged) == base, (
        "groupBy(ck) after capped_baskets must reuse the internal hash(ck)"
        " exchange, not add one"
    )


def test_itemitem_topk_no_window_roundtrip(spark, sf_dir):
    """Per-item counts attach via a broadcast join, not a partitionBy(pk)
    window — the model plan must contain a broadcast join and no Window
    over pk (only the final per-item rank window remains)."""
    from windflow_spark.operators.recsys import capped_baskets, itemitem_topk
    from windflow_spark.tables import load_table

    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    model = itemitem_topk(capped_baskets(li, o, basket_cap=10))
    plan = physical_plan(model)
    assert "BroadcastHashJoin" in plan
    # no pk-partitioned window remains (the old per-item count window);
    # the surviving windows partition by ck (recency cap) and item_a
    # (final rank) only. (r12: fixed the vacuous RunningWindowFunction
    # disjunct flagged by the r11 advisor.)
    assert "windowspecdefinition(pk#" not in plan


def test_copurchase_adjacency_checkpoint_fanout(spark, sf_dir):
    """The shared neighbor frame is materialized (LogicalRDD — the chain
    runs once per query, not once per consumer branch) and spread across
    the session's parallelism so in-row wedge expansion fans out."""
    from windflow_spark.queries import copurchase_adjacency

    nbrs, edges = copurchase_adjacency(spark, sf_dir)
    assert "Scan ExistingRDD" in physical_plan(nbrs)
    assert nbrs.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # edge derivation stays in-row on top of the checkpoint: no exchange
    assert keyed_shuffle_count(edges) == 0


def test_kcore_stats_fold_exact(spark):
    """n_edges = sum(degree)/2 is EXACT on a u<v edge list — the r11
    k-core loops fold both convergence scalars into one job on this
    identity."""
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u long, v long"
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    row = deg.agg(F.count(F.lit(1)).alias("nn"), F.sum("d").alias("sd")).first()
    assert int(row["nn"]) == deg.count() == 4
    assert int(row["sd"]) // 2 == e.count() == 4


def test_exact_jaccard_prefix_checkpoints_shingle_frame(spark, sf_dir):
    """The prefix audit's plan reads materialized RDDs (shingle + prefix
    frames), so the tokenize/shingle chain cannot re-run per consumer."""
    from windflow_spark.functions.dedup import exact_jaccard_pairs_prefix
    from windflow_spark.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    pairs = exact_jaccard_pairs_prefix(docs, 4, 5)
    assert physical_plan(pairs).count("Scan ExistingRDD") >= 2
