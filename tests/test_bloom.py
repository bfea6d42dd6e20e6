"""Bloom-filter semi-join reduction (functions/bloom.py) unit tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def _fixture(spark, n_probe=2000, step=13):
    build = spark.createDataFrame([Row(k=i) for i in range(0, n_probe, step)])
    probe = spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(n_probe)]
    )
    return build, probe, set(range(0, n_probe, step))


def test_bloom_no_false_negatives(spark):
    from windflow_spark.functions.bloom import bloom_build, bloom_prefilter

    build, probe, members = _fixture(spark)
    bf = bloom_build(build, "k", m_bits=1 << 12, k=3)
    kept = {r["k"] for r in bloom_prefilter(probe, "k", bf, 1 << 12, 3).collect()}
    assert members.issubset(kept)  # a false negative breaks join exactness


def test_bloom_false_positive_rate_bounded(spark):
    from windflow_spark.functions.bloom import bloom_build, bloom_prefilter

    build, probe, members = _fixture(spark)
    # m=4096 bits for 154 keys at k=3: theoretical fp ~ (1-e^{-kn/m})^k ≈ 0.1%
    bf = bloom_build(build, "k", m_bits=1 << 12, k=3)
    kept = {r["k"] for r in bloom_prefilter(probe, "k", bf, 1 << 12, 3).collect()}
    fp = len(kept - members)
    assert fp <= len(probe.collect()) * 0.05  # generous ceiling over theory


def test_bloom_prefilter_preserves_probe_columns(spark):
    from windflow_spark.functions.bloom import bloom_build, bloom_prefilter

    build, probe, _ = _fixture(spark, n_probe=100, step=10)
    bf = bloom_build(build, "k", m_bits=1 << 10, k=2)
    out = bloom_prefilter(probe, "k", bf, 1 << 10, 2)
    assert out.columns == ["k", "v"]  # helper columns dropped


def test_bloom_join_is_exact_even_with_tiny_filter(spark):
    # a deliberately undersized filter (many false positives) must still
    # produce the exact join result — FPs only widen the pre-filter
    from windflow_spark.functions.bloom import bloom_build, bloom_prefilter

    build, probe, members = _fixture(spark, n_probe=500, step=7)
    bf = bloom_build(build, "k", m_bits=64, k=1)
    pre = bloom_prefilter(probe, "k", bf, 64, 1)
    got = pre.join(build.withColumnRenamed("k", "bk"),
                   F.col("k") == F.col("bk")).select("k").collect()
    assert {r["k"] for r in got} == members


def test_bloom_empty_build_side(spark):
    from windflow_spark.functions.bloom import bloom_build, bloom_prefilter

    build, probe, _ = _fixture(spark)
    bf = bloom_build(build.filter(F.col("k") < 0), "k", m_bits=1 << 10, k=3)
    # empty build: the word map is empty/null — the filter must drop all
    kept = bloom_prefilter(probe, "k", bf, 1 << 10, 3).collect()
    assert kept == []
