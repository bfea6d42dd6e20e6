"""Z-order layout (functions/layout.py): value correctness vs a python
mirror, disjoint range-partitioning of the writer path, and the actual
read-side payoff — parquet row-group min/max pruning measured on real
footers for a 2-D predicate, z-sorted vs single-column-sorted."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _pz(x: int, y: int, bits: int = 18) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_mirror(spark):
    from windflow_spark.functions.layout import zvalue

    rows = [Row(x=x, y=y) for x in (0, 1, 5, 255, 4097, 150000)
            for y in (0, 3, 64, 2400, 262143)]
    df = spark.createDataFrame(rows).withColumn(
        "z", zvalue(F.col("x"), F.col("y"), bits=18)
    )
    for r in df.collect():
        assert r["z"] == _pz(r["x"], r["y"]), (r["x"], r["y"])


def test_zvalue_sql_matches_column_form(spark):
    from windflow_spark.functions.layout import zvalue, zvalue_sql

    rows = [Row(x=i * 37 % 15000, y=i * 91 % 2400) for i in range(200)]
    df = spark.createDataFrame(rows)
    got = df.select(
        (
            zvalue(F.col("x"), F.col("y"), 18)
            == F.expr(zvalue_sql("x", "y", 18))
        ).alias("eq")
    )
    assert all(r["eq"] for r in got.collect())


def test_zorder_layout_files_have_disjoint_z_ranges(spark, tmp_path):
    from windflow_spark.functions.layout import zorder_layout, zvalue

    rows = [Row(ck=i * 7919 % 1500, dy=i * 104729 % 2400) for i in range(5000)]
    df = spark.createDataFrame(rows)
    out = os.path.join(str(tmp_path), "z")
    zorder_layout(df, "ck", "dy", bits=18, n_files=4).write.parquet(out)
    back = (
        spark.read.parquet(out)
        .withColumn("z", zvalue(F.col("ck"), F.col("dy"), 18))
        .withColumn("f", F.input_file_name())
    )
    ranges = (
        back.groupBy("f").agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
    ).collect()
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "range partitions must not overlap in z"


@pytest.fixture(scope="module")
def orders_arrays():
    t = pq.read_table("/root/testdata/sf0.01/orders.parquet",
                      columns=["o_custkey", "o_orderdate"])
    ck = t.column("o_custkey").to_pylist()
    import datetime as dt

    epoch = dt.datetime(1995, 1, 1)
    dy = [(d - epoch).days for d in t.column("o_orderdate").to_pylist()]
    return ck, dy


def _write_layout(path, ck, dy, order):
    idx = sorted(range(len(ck)), key=order)
    tbl = pa.table(
        {"ck": [ck[i] for i in idx], "dy": [dy[i] for i in idx]}
    )
    pq.write_table(tbl, path, row_group_size=250)


def _overlapping_row_groups(path, ck_lo, ck_hi, dy_lo, dy_hi):
    f = pq.ParquetFile(path)
    names = f.schema_arrow.names
    hit = 0
    for g in range(f.metadata.num_row_groups):
        rg = f.metadata.row_group(g)
        stats = {
            rg.column(c).path_in_schema: rg.column(c).statistics
            for c in range(rg.num_columns)
        }
        sck, sdy = stats["ck"], stats["dy"]
        if (
            sck.max >= ck_lo
            and sck.min < ck_hi
            and sdy.max >= dy_lo
            and sdy.min < dy_hi
        ):
            hit += 1
    assert set(names) == {"ck", "dy"}
    return hit, f.metadata.num_row_groups


def test_zorder_prunes_row_groups_on_both_dimensions(tmp_path, orders_arrays):
    # the actual warehouse payoff, measured on real parquet footers: the
    # same rows written date-sorted vs z-sorted (~60 row groups of 250).
    # A single-column sort prunes ONLY its own column — a key-range
    # predicate reads the ENTIRE date-sorted table — while the z layout
    # bounds both min/max spans per row group and prunes every predicate
    # shape. sf0.01 orders: ck in [0,1500), dy in [0,2400).
    ck, dy = orders_arrays
    p_date = os.path.join(str(tmp_path), "date_sorted.parquet")
    p_z = os.path.join(str(tmp_path), "z_sorted.parquet")
    _write_layout(p_date, ck, dy, order=lambda i: (dy[i], ck[i]))
    _write_layout(p_z, ck, dy, order=lambda i: _pz(ck[i], dy[i]))

    # key-only predicate (10% of keys, all dates): the date sort cannot
    # skip anything; z must skip more than half the groups
    hit_date, n = _overlapping_row_groups(p_date, 700, 850, 0, 2400)
    hit_z, n2 = _overlapping_row_groups(p_z, 700, 850, 0, 2400)
    assert n == n2 and n >= 40
    assert hit_date == n  # the 1-D layout reads the whole table
    assert hit_z <= n // 2, (hit_z, n)

    # balanced 2-D box (20% keys x 40% days): z strictly beats the 1-D sort
    hit_date2, _ = _overlapping_row_groups(p_date, 600, 900, 720, 1680)
    hit_z2, _ = _overlapping_row_groups(p_z, 600, 900, 720, 1680)
    assert hit_z2 < hit_date2, (hit_z2, hit_date2)

    # date-only predicate: the date sort is optimal (the documented
    # tradeoff) but the z layout must still skip a meaningful fraction
    hit_date3, _ = _overlapping_row_groups(p_date, 0, 1500, 720, 1680)
    hit_z3, _ = _overlapping_row_groups(p_z, 0, 1500, 720, 1680)
    assert hit_date3 <= hit_z3
    assert hit_z3 < n, (hit_z3, n)
