"""ensure_min_partitions contract (VERDICT r1 item 7): no plan→RDD
conversion, streaming-safe, and it still widens small local inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from windflow_spark.util import ensure_min_partitions


def test_small_input_widens(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    out = ensure_min_partitions(df, 8)
    assert out.rdd.getNumPartitions() == 8  # .rdd in the TEST only
    assert sorted(r.id for r in out.collect()) == list(range(10))


def test_many_input_files_skip_repartition(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("many_files"))
    spark.createDataFrame([(i,) for i in range(40)], "id long").repartition(
        8
    ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    out = ensure_min_partitions(df, 4)
    assert out is df  # >= n input files → untouched, no extra shuffle


def test_streaming_frame_untouched(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_src"))
    spark.createDataFrame([(1,)], "id long").write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    sdf = spark.readStream.format("parquet").schema(schema).load(path)
    out = ensure_min_partitions(sdf, 8)
    assert out is sdf and out.isStreaming
