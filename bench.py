"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall times.

Execution is forced with the noop writer (full pipeline runs, nothing
collected to the driver) — the honest distributed-throughput measurement.

Noise damping evolution:
- r4: $SPARK_GRAFT_BENCH_REPEATS repeats (default 3), per-query MEDIAN —
  this box's wall times drift ±30% run-to-run (time-sliced microVM).
- r8 (VERDICT r7 #1/#2): in-loop context effects inflated individual
  queries up to 15× (dedup_simhash read 13.8 s in-loop at sf1 vs 0.6-0.84 s
  warm isolated) because a fixed execution order pins each query behind the
  same noisy predecessor (broadcast/GC churn). Now each repeat runs the
  queries in a ROTATED order (shifted by n/repeats) and the per-query stat
  is the MIN across repeats — an order-independent floor. "value" is the
  sum of per-query mins.
- r8 (VERDICT r7 #2): a pinned 5-query SENTINEL set runs at capture time
  and its total is stored as "sentinel_sec" so round-over-round comparisons
  can divide out machine drift instead of re-arguing it each round.

Capture hygiene (VERDICT r7 #3): by default the artifact goes to a temp
path so a driver run never dirties the committed BENCH_LOCAL.json; pass
--commit-capture (or set SPARK_GRAFT_BENCH_OUT) to write the committed
capture on a deliberate refresh.

Scale artifacts: an sf1 run (after `python tools/gen_scale.py 1`) with
--commit-capture writes BENCH_LOCAL_sf1.json — commit it so the next round
can diff 10×-scale behavior per query without re-running the probe.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Fixed drift-sentinel set: cheap, stable, spanning the engine's main paths
# (decimal agg, pushdown filter, map-side enrich, sliding window, keyed
# dedup groupBy). Never remove or reorder — cross-round comparability is
# the whole point.
SENTINELS: tuple[str, ...] = (
    "q1_pricing_summary",
    "q6_revenue_filter",
    "filter_events",
    "win_tb_sliding_1h_15m",
    "dedup_exact_documents",
)


def build_payload(
    times: dict[str, float],
    sf_dir: str,
    repeats: int,
    wall_sec: float,
    sentinel_sec: float | None = None,
    sentinels: dict[str, float] | None = None,
) -> dict:
    """Assemble the bench artifact. ``times`` holds per-query minima across
    order-rotated repeats; failed queries carry -1.0 and are excluded from
    the total."""
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(t for t in times.values() if t >= 0), 3)
    payload = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "repeats": repeats,
        "wall_sec": round(wall_sec, 3),
        "stat": "min_of_rotated_repeats",
    }
    if sentinel_sec is not None:
        payload["sentinel_sec"] = round(sentinel_sec, 3)
    if sentinels:
        payload["sentinels"] = sentinels
    return payload


def _run_once(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    commit_capture = "--commit-capture" in sys.argv[1:]
    import __spark_entry__ as entry_mod
    from windflow_spark import get_spark

    spark = get_spark("windflow-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
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

    # Drift sentinel: min-of-3 per pinned query, measured in a quiet
    # context right after warmup. sentinel_sec normalizes machine drift
    # across rounds (same code + same data ⇒ ratio of sentinel_sec is the
    # machine, not the engine).
    sentinel_times: dict[str, float] = {}
    for name in SENTINELS:
        if name not in qs:
            continue
        runs = [_run_once(qs[name], spark, sf_dir) for _ in range(3)]
        sentinel_times[name] = round(min(runs), 3)
    sentinel_sec = sum(sentinel_times.values())

    names = list(qs)
    all_runs: dict[str, list[float]] = {n: [] for n in names}
    failed: set[str] = set()
    t_all = time.time()
    step = max(1, len(names) // repeats)
    for r in range(repeats):
        # rotate the execution order each repeat so no query is pinned
        # behind the same predecessor's broadcast/GC churn (VERDICT r7 #1)
        order = names[r * step :] + names[: r * step]
        for name in order:
            if name in failed:
                continue
            try:
                all_runs[name].append(_run_once(qs[name], spark, sf_dir))
            except Exception as e:  # a failing query must not hide the rest
                failed.add(name)
                print(f"bench error in {name}: {e}", file=sys.stderr)
    wall = time.time() - t_all
    times = {
        n: (round(min(rs), 3) if rs and n not in failed else -1.0)
        for n, rs in all_runs.items()
    }

    payload_obj = build_payload(
        times, sf_dir, repeats, wall, sentinel_sec, sentinel_times
    )
    payload = json.dumps(payload_obj)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Durable artifact in addition to the stdout line. Committed capture
    # paths (BENCH_LOCAL*.json) are written ONLY behind --commit-capture
    # or an explicit SPARK_GRAFT_BENCH_OUT — a bare run (e.g. the driver's)
    # writes a temp file and leaves the working tree clean (VERDICT r7 #3).
    default_name = (
        "BENCH_LOCAL.json"
        if sf_dir.rstrip("/").endswith("sf0.1")
        else f"BENCH_LOCAL_sf{sf}.json"
    )
    if commit_capture:
        default_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), default_name
        )
    else:
        default_path = os.path.join(
            tempfile.gettempdir(), f"windflow_{default_name}"
        )
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", default_path)
    try:
        with open(out_path, "w") as f:
            f.write(payload + "\n")
        print(f"bench: artifact written to {out_path}", file=sys.stderr)
    except OSError as e:
        print(f"bench: could not write {out_path}: {e}", file=sys.stderr)
    print(payload)
    # Final COMPACT line for the driver: the full per-query payload above
    # exceeds the driver's tail window, which truncated it mid-object two
    # rounds running (BENCH_r05/r06 "parsed": null — VERDICT r6 #2). This
    # line is <250 bytes so it survives any tail capture; the full per-query
    # map lives in the artifact file. "kind" tags the compact schema so a
    # consumer can tell the two stdout objects apart (r7 ADVICE).
    compact = {
        "metric": "total_query_wall_time",
        "value": payload_obj["value"],
        "unit": "sec",
        "n": len(times),
        "failed": sum(1 for t in times.values() if t < 0),
        "sf": payload_obj["sf"],
        "kind": "compact",
        "sentinel_sec": round(sentinel_sec, 3),
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
