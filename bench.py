"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall times.

Execution is forced with the noop writer (full pipeline runs, nothing
collected to the driver) — the honest distributed-throughput measurement.

Noise damping (r4 VERDICT #8): each query runs $SPARK_GRAFT_BENCH_REPEATS
times (default 3) and reports the per-query MEDIAN; this box's wall times
drift ±30% run-to-run (time-sliced microVM), so single-shot times made
round-over-round comparisons mostly noise. "value" is the sum of medians
(comparable to a single clean pass); "wall_sec" is the actual loop wall.

Scale artifacts: an sf1 run (after `python tools/gen_scale.py 1`) writes
BENCH_LOCAL_sf1.json by default — commit it so the next round can diff
10×-scale behavior per query without re-running the probe.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_payload(
    times: dict[str, float], sf_dir: str, repeats: int, wall_sec: float
) -> dict:
    """Assemble the bench artifact. ``times`` holds per-query medians;
    failed queries carry -1.0 and are excluded from the total."""
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(t for t in times.values() if t >= 0), 3)
    return {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "repeats": repeats,
        "wall_sec": round(wall_sec, 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    import __spark_entry__ as entry_mod
    from windflow_spark import get_spark

    spark = get_spark("windflow-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    times: dict[str, float] = {}
    # Warmup (excluded from per-query times): touch every table's data so
    # first-scan I/O lands in the page cache, and run one trivial pandas_udf
    # so the Python worker pool is spawned — both are one-time process
    # costs, not per-query throughput.
    from pyspark.sql import functions as F
    from windflow_spark.tables import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        t = load_table(spark, name, sf_dir)
        t.agg(*[F.count(c) for c in t.columns[:4]]).collect()

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, 1000, 1, 32).select(_warm("id")).count()
    # one noop write + one agg through the noop committer: the first
    # write-path initialization (noop datasource lookup, committer setup,
    # first HashAggregate codegen) otherwise lands on whichever query runs
    # first and inflates ITS time by >1s
    spark.range(0, 1000, 1, 8).groupBy((F.col("id") % 7).alias("g")).agg(
        F.sum("id").alias("s"),
        # decimal aggregation path too: its first whole-stage codegen
        # compile otherwise lands on q1 (decimal-summed pricing columns)
        F.sum(F.col("id").cast("decimal(18,6)")).alias("d"),
        F.avg("id").alias("a"),
    ).write.mode("overwrite").format("noop").save()

    t_all = time.time()
    for name, fn in qs.items():
        runs: list[float] = []
        for _ in range(repeats):
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                runs.append(time.time() - t0)
            except Exception as e:  # a failing query must not hide the rest
                runs = []
                print(f"bench error in {name}: {e}", file=sys.stderr)
                break
        times[name] = round(statistics.median(runs), 3) if runs else -1.0
    wall = time.time() - t_all

    payload_obj = build_payload(times, sf_dir, repeats, wall)
    payload = json.dumps(payload_obj)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Durable artifact in addition to the stdout line: the r1 BENCH capture
    # truncated mid-line, losing the total and early per-query times, so
    # round-over-round deltas were not computable (VERDICT r1 §wrong-2).
    # default artifact name is per-sf: only the canonical sf0.1 run may
    # overwrite the committed BENCH_LOCAL.json (a probe/sf0.01 run
    # clobbering it cost a round-over-round comparison once)
    default_name = (
        "BENCH_LOCAL.json"
        if sf_dir.rstrip("/").endswith("sf0.1")
        else f"BENCH_LOCAL_sf{sf}.json"
    )
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), default_name),
    )
    try:
        with open(out_path, "w") as f:
            f.write(payload + "\n")
    except OSError as e:
        print(f"bench: could not write {out_path}: {e}", file=sys.stderr)
    print(payload)
    # Final COMPACT line for the driver: the full 250-entry payload above
    # exceeds the driver's tail window, which truncated it mid-object two
    # rounds running (BENCH_r05/r06 "parsed": null — VERDICT r6 #2). This
    # line is <200 bytes so it survives any tail capture; the full per-query
    # map lives in BENCH_LOCAL.json.
    compact = {
        "metric": "total_query_wall_time",
        "value": payload_obj["value"],
        "unit": "sec",
        "n": len(times),
        "failed": sum(1 for t in times.values() if t < 0),
        "sf": payload_obj["sf"],
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
