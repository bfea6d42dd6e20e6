"""Lift/combine UDAF surface, non-incremental window form, and streaming
late-data semantics (withLateness analog)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

SEC = 1_000_000


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, float(v), dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=ts)) for k, v, ts in rows],
        "key long, value double, ts timestamp",
    )


def test_lift_combine_equals_builtin(spark):
    from windflow_spark.functions.udaf import lift_combine_agg

    df = _mk(spark, [(1, 2, 0), (1, 3, SEC), (2, 5, 0)])
    out = lift_combine_agg(
        df, ["key"], lift=F.col("value") * F.col("value"), combine=F.sum, out_name="sumsq"
    )
    got = {(r.key, r.sumsq) for r in out.collect()}
    assert got == {(1, 13.0), (2, 25.0)}


def test_pandas_udaf_geometric_mean(spark):
    import numpy as np

    from windflow_spark.functions.udaf import pandas_udaf

    gmean = pandas_udaf(lambda s: float(np.exp(np.log(s).mean())), "double")
    df = _mk(spark, [(1, 2, 0), (1, 8, SEC)])
    got = df.groupBy("key").agg(gmean("value").alias("g")).collect()[0].g
    assert abs(got - 4.0) < 1e-9


def test_non_incremental_window_median(spark):
    import numpy as np
    import pandas as pd

    from windflow_spark.operators.windows import non_incremental_window_tb

    df = _mk(spark, [(1, 1, 0), (1, 9, SEC), (1, 5, 2 * SEC), (1, 100, 11 * SEC)])

    def med(pdf):
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "_wid": [pdf["_wid"].iloc[0]],
             "m": [float(np.median(pdf["value"]))]}
        )

    out = non_incremental_window_tb(
        df, ["key"], "ts", 10 * SEC, med, "key long, _wid long, m double"
    )
    got = {(r.key, r.m) for r in out.collect()}
    assert got == {(1, 5.0), (1, 100.0)}


def test_streaming_lateness_drops_late_rows(spark, tmp_path):
    """withLateness analog: rows later than watermark delay past the window
    end are dropped (reference wf/window_replica.hpp:256-265 counts+drops
    them). Two files processed in separate triggers: the second contains a
    row 20s older than the first's max ts; with a 5s watermark delay and 2s
    windows its window is already finalized in APPEND mode."""
    from windflow_spark.streaming import file_stream, streaming_tumbling_window_tb

    src = tmp_path / "src"
    base = dt.datetime(2024, 1, 1)
    # Spark's late-record filter uses the PREVIOUS batch's watermark
    # (two-watermark design: filter wm lags eviction wm by one batch), so
    # the late row arrives in trigger 3, two triggers after the wm advanced.
    files = [
        [(1, 1.0, 0), (1, 2.0, 30 * SEC)],           # sets wm → 25s
        [(1, 4.0, 31 * SEC)],                         # wm 25s now filters
        [(1, 99.0, SEC // 2), (1, 3.0, 32 * SEC)],   # 99.0 is 24.5s late → drop
    ]
    for rows in files:
        df = spark.createDataFrame(
            [(k, v, base + dt.timedelta(microseconds=ts)) for k, v, ts in rows],
            "key long, value double, ts timestamp",
        )
        df.coalesce(1).write.mode("append").parquet(str(src))
        time.sleep(1.1)  # file source orders triggers by modification time
    on_time = df

    stream = file_stream(spark, str(src), on_time.schema, max_files_per_trigger=1)
    win = streaming_tumbling_window_tb(
        stream, ["key"], "ts", 2 * SEC,
        [F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv")],
        lateness_us=5 * SEC,
    )
    q = (
        win.writeStream.format("memory").queryName("late_test").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()

    rows = {(r.w_start, r.cnt, float(r.sv)) for r in spark.table("late_test").collect()}
    # window [0s,2s) must have fired WITHOUT the late 99.0 row
    w0 = [r for r in rows if r[0] == base]
    assert w0 == [(base, 1, 1.0)], rows
