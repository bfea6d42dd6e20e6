"""Same-session INTERLEAVED A/B profiler (guide §1): the microVM's
run-to-run drift (sentinel swings 2x between processes) makes cross-process
before/after numbers meaningless, so this loads the BEFORE variant of
windflow_spark/queries.py from a git ref alongside the working-tree AFTER
variant, and times them alternately (A B A B ...) inside ONE warm session.
Min and per-pair ratios are then drift-free to first order.

Usage: python tools/ab_prof.py [--ref HEAD] [--repeats 5] q1 q2 ...
Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import subprocess
import sys
import tempfile
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_ref_queries(ref: str):
    src = subprocess.check_output(
        ["git", "show", f"{ref}:windflow_spark/queries.py"], cwd=REPO
    )
    fd, path = tempfile.mkstemp(suffix=".py", prefix="queries_ref_")
    with os.fdopen(fd, "wb") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("queries_ref", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from windflow_spark import get_spark
    from windflow_spark.tables import TABLE_NAMES, load_table
    from windflow_spark import queries as Qnew

    Qold = load_ref_queries(args.ref)

    spark = get_spark("ab-prof")
    spark.sparkContext.setLogLevel("ERROR")

    for name in TABLE_NAMES:
        t = load_table(spark, name, args.sf_dir)
        t.agg(*[F.count(c) for c in t.columns[:4]]).collect()

    @pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, 1000, 1, 32).select(_warm("id")).count()
    spark.range(0, 1000, 1, 8).groupBy((F.col("id") % 7).alias("g")).agg(
        F.sum("id").alias("s"),
        F.sum(F.col("id").cast("decimal(18,6)")).alias("d"),
        F.avg("id").alias("a"),
    ).write.mode("overwrite").format("noop").save()

    def run(fn) -> float:
        t0 = time.time()
        fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    for name in args.names:
        fa = Qold.QUERIES[name]
        fb = Qnew.QUERIES[name]
        ta, tb = [], []
        run(fa)  # one unmeasured pair to warm both plans' first-time costs
        run(fb)
        for _ in range(args.repeats):
            ta.append(run(fa))
            tb.append(run(fb))
        ratios = sorted(b / a for a, b in zip(ta, tb))
        med_ratio = ratios[len(ratios) // 2]
        print(
            f"{name:45s} before_min={min(ta):6.3f} after_min={min(tb):6.3f} "
            f"min_ratio={min(tb) / min(ta):5.3f} med_pair_ratio={med_ratio:5.3f}"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
