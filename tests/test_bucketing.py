"""Bucketed-table co-located joins: the pay-the-shuffle-once storage
strategy (reference has no storage layer — this is the Spark-native answer
to its KeyBy emitter reusing a partitioning across stages,
wf/basic_emitter.hpp semantics at rest)."""

from pyspark.sql import functions as F

from windflow_spark.io import write_bucketed
from windflow_spark.plans.explain import keyed_shuffle_count, physical_plan
from windflow_spark.tables import load_table


def test_cobucketed_join_has_no_exchange(spark, sf_dir):
    """orders ⋈ customer on custkey, both bucketed by custkey with the
    same bucket count: the join plan must contain ZERO exchanges (each
    task zips bucket i of both sides), and results must equal the plain
    join exactly."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    write_bucketed(o, "t_orders_b", ["o_custkey"], 8, sort_cols=["o_custkey"])
    write_bucketed(c, "t_customer_b", ["c_custkey"], 8, sort_cols=["c_custkey"])
    try:
        ob = spark.table("t_orders_b")
        cb = spark.table("t_customer_b")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
                "o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice"
            )
            assert keyed_shuffle_count(j) == 0, physical_plan(j)
            got = sorted(map(tuple, j.collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        plain = sorted(
            map(
                tuple,
                o.join(c, o.o_custkey == c.c_custkey)
                .select("o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice")
                .collect(),
            )
        )
        assert got == plain and len(got) > 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_bucketed_groupby_skips_shuffle(spark, sf_dir):
    """An aggregation keyed on the bucket column reads the bucketed table
    with no exchange before the final agg (partial+final collapse to one
    stage per bucket)."""
    o = load_table(spark, "orders", sf_dir)
    write_bucketed(o, "t_orders_b2", ["o_custkey"], 8)
    try:
        g = (
            spark.table("t_orders_b2")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert keyed_shuffle_count(g) == 0, physical_plan(g)
        got = {(r.o_custkey, r.n) for r in g.collect()}
        exp = {
            (r.o_custkey, r.n)
            for r in o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == exp
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b2")


def test_publish_with_audit_blocks_bad_batch(spark, sf_dir, tmp_path):
    """WAP: a failing rule must leave the published path untouched (the
    previous good version stays readable); a passing batch replaces it
    atomically."""
    from pyspark.sql import functions as F

    from windflow_spark.io import publish_with_audit

    o = load_table(spark, "orders", sf_dir)
    path = str(tmp_path / "orders_published")

    good = publish_with_audit(
        o,
        path,
        [
            ("price_positive", F.col("o_totalprice") > 0),
            ("key_present", F.col("o_orderkey").isNotNull()),
        ],
    )
    assert good["published"] and good["n_rows"] == o.count()
    v1 = spark.read.parquet(path).count()

    bad = publish_with_audit(
        o.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 100 == 0, -1.0).otherwise(
                F.col("o_totalprice")
            ),
        ),
        path,
        [("price_positive", F.col("o_totalprice") > 0)],
    )
    assert not bad["published"] and bad["failed_rules"] == ["price_positive"]
    # previous good version still fully readable
    assert spark.read.parquet(path).count() == v1
    assert spark.read.parquet(path).filter(F.col("o_totalprice") <= 0).count() == 0
