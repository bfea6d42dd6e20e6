"""Measure the bloom semi-join reduction WINNING at 10× scale.

The oracle gate proves ``bloom_prefilter_join`` exact; this tool proves
the pre-filter is *useful* in the scenario it exists for: a SELECTIVE
join that cannot broadcast (broadcast disabled), where the unfiltered
plan shuffles the whole fact side into a sort-merge join while the bloom
pre-filter drops non-matching fact rows at the scan.

Setup on ``_scaleprobe/sf1`` (~6M lineitem rows): the build side is the
~4% supplier slice of one nation; matching fact rows are ~4% of the
table. Timed warm, best of ``runs`` per variant in ONE session (the
bench-noise discipline). Variants:

  plain_smj   — full fact shuffle into SMJ (runtime bloom off)
  spark_rbf   — Spark's own runtime bloom filter enabled (what AQE-era
                Spark injects when stats justify it)
  bloom_pre   — functions/bloom.py explicit pre-filter + SMJ

All three must return identical aggregates. Printed JSON goes into
SCALE.md. Run: python tools/bench_bloom.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "_scaleprobe", "sf1")


def main(runs: int = 3) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from windflow_spark.functions.bloom import bloom_build, bloom_prefilter

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(os.path.join(SF1, "lineitem.parquet"))
    sup = spark.read.parquet(os.path.join(SF1, "supplier.parquet")).filter(
        F.col("s_nationkey") == 3
    )

    def agg(fact):
        j = fact.join(sup, fact.l_suppkey == sup.s_suppkey)
        return (
            j.groupBy("s_suppkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    2,
                ).alias("rev"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_supp"),
                F.sum("n").alias("n_items"),
                F.round(F.sum("rev"), 2).alias("total"),
            )
        )

    def run(tag, make, rbf=False):
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "true" if rbf else "false",
        )
        best, result = None, None
        for _ in range(runs):
            t0 = time.time()
            rows = make().collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            result = rows[0].asDict()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        return {"tag": tag, "best_sec": round(best, 2), "result": result}

    def bloom_variant():
        bf = bloom_build(sup, "s_suppkey", m_bits=1 << 16, k=3)
        return agg(bloom_prefilter(li, "l_suppkey", bf, 1 << 16, 3))

    out = [
        run("plain_smj", lambda: agg(li)),
        run("spark_rbf", lambda: agg(li), rbf=True),
        run("bloom_pre", bloom_variant),
    ]
    results = {o["tag"]: o["result"] for o in out}
    identical = len({json.dumps(r, sort_keys=True) for r in results.values()}) == 1
    print(
        json.dumps(
            {
                "runs": runs,
                "variants": [
                    {k: o[k] for k in ("tag", "best_sec")} for o in out
                ],
                "identical_results": identical,
                "result": results["plain_smj"],
            }
        )
    )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
