"""State-size EVIDENCE for bounded streaming operators (r9 VERDICT #5).

The bounded as-of join's docstring claims O(lookback + watermark-delay)
state and the bucketed interval join's claims watermark-purged retention —
the reference's purge invariant (wf/interval_join.hpp:109-117,153-159).
This file turns those claims into MEASUREMENTS: replay the same-rate
stream at 1× and 2× length, read the state operators' metrics via
StreamMonitor, and assert

  * the bounded as-of's state MEMORY plateaus (2× replay ≤ 1.5× the 1×
    memory) while the EOS-flush exact sibling — which archives full
    per-key history by design — GROWS (2× ≥ 1.5× its 1× memory);
  * the bucketed stream-stream interval join's buffered STATE ROWS
    plateau under the same doubling.

Memory (not numRowsTotal) is the bounded-as-of metric because
applyInPandasWithState keeps one state ROW per key holding arrays — row
count is the constant key count; the arrays are what the purge bounds.
The native stream-stream join buffers one state row per input row, so
numRowsTotal is the right metric there.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from windflow_spark.streaming import (
    file_stream,
    monitor_streams,
    streaming_asof_join_backward,
    streaming_asof_join_backward_bounded,
    streaming_interval_join_bucketed,
    to_memory_sink,
)

SEC = 1_000_000
CADENCE_US = 50_000  # one row per 50 ms of event time (both sides together)
ROWS_PER_FILE = 200  # → each file spans 10 s of event time
N_KEYS = 4
LOOKBACK_US = 4 * SEC
WM_US = 1 * SEC


def _write_files(spark, path: str, n_files: int, side: int) -> None:
    """n_files parquet files in event-time order; side 0 = a (even slots),
    side 1 = b (odd slots). Sequential writes with a short sleep keep the
    file-source processing order aligned with event time."""
    for f in range(n_files):
        rows = []
        for j in range(ROWS_PER_FILE):
            if j % 2 != side:
                continue
            us = (f * ROWS_PER_FILE + j) * CADENCE_US
            rows.append((j % N_KEYS, f * ROWS_PER_FILE + j, us, float(j), False))
        spark.createDataFrame(
            rows, "key long, id long, us long, val double, eos boolean"
        ).coalesce(1).write.mode("append").parquet(path)
        time.sleep(0.1)


def _peak_state(mon, qid: str, metric: str) -> int:
    """Max over retained progress snapshots of the summed state-operator
    metric; listener delivery is async, so poll until snapshots with
    state operators exist."""
    for _ in range(50):
        snaps = mon.history(qid)
        vals = [
            sum(op.get(metric, 0) or 0 for op in (s.get("stateOperators") or []))
            for s in snaps
        ]
        vals = [v for v in vals if v > 0]
        if vals:
            return max(vals)
        time.sleep(0.2)
    return 0


def _run_asof(spark, tmp_path_factory, n_files: int, bounded: bool) -> int:
    src_a = str(tmp_path_factory.mktemp(f"ssb_a{n_files}{int(bounded)}"))
    src_b = str(tmp_path_factory.mktemp(f"ssb_b{n_files}{int(bounded)}"))
    _write_files(spark, src_a, n_files, 0)
    _write_files(spark, src_b, n_files, 1)
    schema = "key long, id long, us long, val double, eos boolean"
    sa = file_stream(spark, src_a, schema, max_files_per_trigger=1)
    sb = file_stream(spark, src_b, schema, max_files_per_trigger=1)
    if bounded:
        j = streaming_asof_join_backward_bounded(
            sa, sb, "key", "us", "us", "id", "id", "val",
            lookback_us=LOOKBACK_US, watermark_us=WM_US,
        )
    else:
        j = streaming_asof_join_backward(
            sa, sb, "key", "us", "us", "id", "id", "val"
        )
    mon = monitor_streams(spark)
    try:
        _, q = to_memory_sink(j)
        return _peak_state(mon, str(q.id), "memoryUsedBytes")
    finally:
        mon.remove()


def test_bounded_asof_state_plateaus_but_eos_form_grows(
    spark, tmp_path_factory
):
    m1 = _run_asof(spark, tmp_path_factory, 4, bounded=True)
    m2 = _run_asof(spark, tmp_path_factory, 8, bounded=True)
    u1 = _run_asof(spark, tmp_path_factory, 4, bounded=False)
    u2 = _run_asof(spark, tmp_path_factory, 8, bounded=False)
    assert m1 > 0 and m2 > 0 and u1 > 0 and u2 > 0
    # bounded: watermark-purged arrays → same peak at any stream length
    assert m2 <= 1.5 * m1, f"bounded state grew: {m1} -> {m2} bytes"
    # EOS-flush exact form: full per-key archive → peak tracks length
    assert u2 >= 1.5 * u1, f"EOS-form state unexpectedly flat: {u1} -> {u2}"
    # and at the same length, the bounded peak sits well under the archive
    assert m2 < u2, f"bounded ({m2}) not below EOS archive ({u2})"


def _run_bucketed(spark, tmp_path_factory, n_files: int) -> int:
    src_a = str(tmp_path_factory.mktemp(f"ssbij_a{n_files}"))
    src_b = str(tmp_path_factory.mktemp(f"ssbij_b{n_files}"))
    _write_files(spark, src_a, n_files, 0)
    _write_files(spark, src_b, n_files, 1)
    schema = "key long, id long, us long, val double, eos boolean"

    def _ts(df):
        return df.withColumn("ts", F.timestamp_micros(F.col("us")))

    sa = _ts(file_stream(spark, src_a, schema, max_files_per_trigger=1)).alias("a")
    sb = _ts(file_stream(spark, src_b, schema, max_files_per_trigger=1)).alias("b")
    j = streaming_interval_join_bucketed(
        sa, sb, ["key"], "ts", "ts", 0, 2 * SEC, watermark_us=WM_US
    )
    mon = monitor_streams(spark)
    try:
        _, q = to_memory_sink(j.select(F.col("a.id").alias("ai"), F.col("b.id").alias("bi")))
        return _peak_state(mon, str(q.id), "numRowsTotal")
    finally:
        mon.remove()


def test_bucketed_interval_join_state_rows_plateau(spark, tmp_path_factory):
    r1 = _run_bucketed(spark, tmp_path_factory, 4)
    r2 = _run_bucketed(spark, tmp_path_factory, 8)
    assert r1 > 0 and r2 > 0
    # buffered rows are purged by the event-time range condition as the
    # watermark advances — doubling the replay must not double the peak
    assert r2 <= 1.5 * r1, f"join state rows grew: {r1} -> {r2}"
