"""State-store provider A/B for the stateful streaming pipelines
(VERDICT r11 #9): default HDFSBackedStateStoreProvider vs RocksDB, on the
two state-heaviest BENCH_STREAM rows — `window` (SQL streaming aggregation
state) and `reduce` (applyInPandasWithState custom state) — with the exact
bench shape (N keyed rows, 1 ms tick, availableNow replay).

Run one provider per process (state-store providers are per-query-start,
but a clean JVM keeps the comparison honest):

  python tools/stream_state_ab.py default [n_rows]
  python tools/stream_state_ab.py rocksdb [n_rows]

Prints one JSON line with rows/sec per pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    provider = sys.argv[1] if len(sys.argv) > 1 else "default"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    from pyspark.sql import functions as F

    from windflow_spark import get_spark
    from windflow_spark.streaming import (
        file_stream,
        streaming_rolling_reduce,
        streaming_tumbling_window_tb,
    )

    extra = None
    if provider == "rocksdb":
        extra = {
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming."
                "state.RocksDBStateStoreProvider"
            )
        }
    spark = get_spark("stream-state-ab", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_ab_")
    src = os.path.join(work, "src")
    (
        spark.range(0, n, 1, 32)
        .select(
            (F.col("id") % 1000).alias("key"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.timestamp_micros(F.col("id") * 1000).alias("ts"),
        )
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema

    def run(label: str, build, mode: str) -> float:
        stream = file_stream(spark, src, schema)
        out = build(stream)
        ckpt = os.path.join(work, f"ckpt_{label}")
        t0 = time.time()
        q = (
            out.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return round(n / (time.time() - t0))

    results = {"provider": provider, "n_rows": n}
    results["window_rows_per_sec"] = run(
        "window",
        lambda s: streaming_tumbling_window_tb(
            s, ["key"], "ts", 1_000_000,
            [F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv")],
        ),
        "update",
    )
    results["reduce_rows_per_sec"] = run(
        "reduce",
        lambda s: streaming_rolling_reduce(s, ["key"], "ts", "value"),
        "append",
    )
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
