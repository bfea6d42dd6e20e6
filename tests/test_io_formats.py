"""Multi-format I/O round-trips: the same rows survive parquet/ORC/CSV/JSON
write→read, and partitioned layouts prune on read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from windflow_spark.io import infer_format, read_table_any, write_table_any
from windflow_spark.plans import pushed_filters, scan_read_schema


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5, i % 3) for i in range(50)],
        "id long, name string, score double, bucket long",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, sample, fmt, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io")) + f"/t.{fmt}"
    write_table_any(sample, path)
    assert infer_format(path) == fmt
    back = read_table_any(spark, path, schema=sample.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))


def test_partitioned_write_prunes_on_read(spark, sample, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io")) + "/part.parquet"
    write_table_any(sample, path, partition_by=["bucket"])
    back = read_table_any(spark, path).filter(F.col("bucket") == 1)
    # partition pruning: only bucket=1 files are listed (check via count and
    # the absence of `bucket` from the on-disk read schema — it comes from
    # the directory layout, not the file bytes)
    assert back.count() == sample.filter(F.col("bucket") == 1).count()
    assert "bucket" not in scan_read_schema(back)


def test_columnar_scan_pushes_filters(spark, sample, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io")) + "/p.parquet"
    write_table_any(sample, path)
    df = read_table_any(spark, path).filter(F.col("id") > 40).select("id", "score")
    pf = " ".join(pushed_filters(df))
    assert "id" in pf
    assert set(scan_read_schema(df)) == {"id", "score"}


def test_infer_format_rejects_unknown():
    with pytest.raises(ValueError, match="cannot infer"):
        infer_format("/data/table.avro2")


def test_read_text_lines(spark, tmp_path_factory):
    from windflow_spark.io import read_text_lines

    p = tmp_path_factory.mktemp("txt")
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("third\n")
    lines = {r.value for r in read_text_lines(spark, str(p)).collect()}
    assert lines == {"line one", "line two", "third"}
    whole = {r.value for r in read_text_lines(spark, str(p), whole_file=True).collect()}
    assert "line one\nline two\n" in whole and len(whole) == 2


def test_read_binary_files_feeds_multimodal(spark, tmp_path_factory):
    """binaryFile source → the multimodal decode plumbing: opaque bytes in,
    typed metadata + (stubbed) decode out — the corpus on-ramp for
    image/audio columns."""
    from windflow_spark.functions.multimodal import decode_image_meta
    from windflow_spark.io import read_binary_files

    p = tmp_path_factory.mktemp("bin")
    (p / "x.png").write_bytes(b"\x89PNG fake bytes")
    (p / "y.png").write_bytes(b"\x89PNG other")
    (p / "skip.txt").write_bytes(b"not a png")
    files = read_binary_files(spark, str(p), glob="*.png")
    rows = files.select("path", "length", "content").collect()
    assert len(rows) == 2 and all(r.length > 0 for r in rows)
    decoded = decode_image_meta(
        files.selectExpr("xxhash64(path) AS media_id", "content AS payload")
    )
    assert decoded.count() == 2  # stubbed decode, real plumbing


def test_read_json_robust_captures_corrupt_records(spark, tmp_path_factory):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructType

    from windflow_spark.io import read_json_robust

    d = tmp_path_factory.mktemp("robust_json")
    p = str(d / "data.json")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "ok"}\n')
        f.write('{"id": 2, "name": "also ok"}\n')
        f.write('{"id": broken not json\n')          # malformed
        f.write('{"id": 3, "name": "fine"}\n')
    schema = StructType().add("id", LongType()).add("name", StringType())
    df = read_json_robust(spark, p, schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 2, 3]
    assert bad.count() == 1  # quarantined, job did not fail
    df.unpersist()


def test_write_sized_coalesces_small_output(spark, tmp_path_factory):
    import os

    from windflow_spark.io import estimated_file_count, write_sized

    # a tiny frame spread over many partitions must land as ONE file
    df = spark.range(0, 10_000, 1, 32).selectExpr("id", "id * 2 AS v")
    assert estimated_file_count(df, target_mb=256) == 1
    out = str(tmp_path_factory.mktemp("sized") / "t.parquet")
    used = write_sized(df, out, target_mb=256)
    assert used == 1
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1
    assert spark.read.parquet(out).count() == 10_000


def test_compact_files_reduces_count_preserves_rows(spark, tmp_path_factory):
    import os

    from windflow_spark.io import compact_files

    path = str(tmp_path_factory.mktemp("compact") / "t")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    df.repartition(24).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 24
    before, after = compact_files(spark, path, target_mb=256)
    assert before >= 24 and after < before
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).collect()[0][0] == 10_000 * 9_999 // 2


def test_read_parquet_evolving_merges_schemas(spark, tmp_path_factory):
    from windflow_spark.io import read_parquet_evolving

    path = str(tmp_path_factory.mktemp("evolve") / "t")
    spark.createDataFrame([(1, "a")], "id long, s string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "b", 3.5)], "id long, s string, score double"
    ).write.mode("append").parquet(path)
    got = read_parquet_evolving(spark, path)
    assert set(got.columns) == {"id", "s", "score"}
    rows = {r.id: (r.s, r.score) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 3.5)}


def test_partitioned_write_prunes_partitions(spark, tmp_path_factory):
    # partition pruning is the 100-TB table-layout contract: a filter on
    # the partition column must become a PartitionFilter (metadata-only
    # pruning), NOT a data filter evaluated per row
    from windflow_spark.plans import physical_plan

    path = str(tmp_path_factory.mktemp("parts") / "t")
    df = spark.createDataFrame(
        [(i, ["x", "y", "z"][i % 3]) for i in range(300)], "id long, part string"
    )
    df.write.partitionBy("part").parquet(path)
    scan = spark.read.parquet(path).filter(F.col("part") == "y")
    plan = physical_plan(scan)
    assert "PartitionFilters" in plan and "part" in plan.split("PartitionFilters", 1)[1][:120]
    assert scan.count() == 100


def test_overwrite_partitions_dynamic_touches_only_written_parts(
    spark, tmp_path_factory
):
    from windflow_spark.io import overwrite_partitions_dynamic

    path = str(tmp_path_factory.mktemp("dynpart") / "t")
    base = spark.createDataFrame(
        [(i, ["d1", "d2", "d3"][i % 3]) for i in range(90)], "id long, day string"
    )
    overwrite_partitions_dynamic(base, path, ["day"])
    # backfill ONLY d2 with corrected rows
    fix = spark.createDataFrame(
        [(1000 + i, "d2") for i in range(5)], "id long, day string"
    )
    overwrite_partitions_dynamic(fix, path, ["day"])
    got = spark.read.parquet(path)
    by_day = {r.day: r.n for r in got.groupBy("day").agg(F.count("*").alias("n")).collect()}
    # d1/d3 untouched (30 rows each), d2 replaced by the 5-row backfill
    assert by_day == {"d1": 30, "d2": 5, "d3": 30}
    assert got.filter("day = 'd2'").agg(F.min("id")).collect()[0][0] == 1000
    # the session conf was restored (scoped override)
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC"
    ).upper() == "STATIC"
