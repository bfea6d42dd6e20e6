"""Fixed-iteration PageRank over an edge list.

No reference analog — WindFlow stops at streaming operators; the iterative
graph siblings here (PageRank, plus connected components in
functions/dedup.dedup_clusters) are the batch analytics a corpus/entity
pipeline needs (authority scoring of link/purchase graphs, seed ranking
for crawl scheduling).

Scale shape: each iteration is one co-partitioned equi-join of the edge
list against the (node, rank) frame on src plus one groupBy(dst) — the
canonical distributed PageRank step; edges and ranks re-use the same hash
partitioning across iterations, nothing is collected to the driver, and
the iteration count is a fixed small constant (power iteration converges
geometrically at the damping rate). Dangling nodes receive the base mass
``1 - damping`` via the left join; out-degree is computed once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank: ``r' = (1-d) + d * sum_in(r/outdeg)``
    from a uniform start of 1.0, for a FIXED ``iters`` rounds (the
    deterministic, oracle-matchable form — an unrolled loop, no
    convergence test, no driver scalar per round).

    Pass both edge directions for an undirected graph. The base constant
    is computed as ``1.0 - damping`` in IEEE double on BOTH engines (do
    not substitute a decimal literal like 0.15 — it is a different
    double). Output: (node, pr) with pr rounded to 6dp; intermediate
    ranks stay raw so only summation order separates engines at the ulp
    level.
    """
    # Persist the derived edge list: the iteration DAG references it
    # 2·iters+3 times (nodes, outdeg, each round's contrib join), and
    # without materialization Spark re-derives it from the base tables on
    # every reference — the standard iterative-algorithm discipline
    # (sf0.1: 11 s → ~3 s for 2 rounds). The cached frames are explicitly
    # repartitioned on the join key to CLUSTER PARALLELISM first: a cached
    # relation freezes its partitioning (AQE cannot coalesce it later), so
    # inheriting a wide spark.sql.shuffle.partitions here would pin
    # hundreds of near-empty tasks into every iteration stage (measured
    # 55 s vs 6 s on a default-200 session at sf0.1). Node-sized frames
    # are NOT broadcast: ranks/outdeg scale with the graph, so the
    # per-round join stays co-partitioned (correct at any scale).
    p = edges.sparkSession.sparkContext.defaultParallelism
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .repartition(p, "_s")
        .persist()
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .repartition(p, "node")
        .persist()
    )
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).cast("long").alias("_od"))
    ew = e.join(outdeg, "_s").persist()
    base = F.lit(1.0) - F.lit(damping)
    ranks = nodes.select("node", F.lit(1.0).alias("pr"))
    for _ in range(iters):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "_s"), "_s")
            .select(
                F.col("_d").alias("node"), (F.col("pr") / F.col("_od")).alias("_c")
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_m"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (base + F.lit(damping) * F.coalesce(F.col("_m"), F.lit(0.0))).alias(
                "pr"
            ),
        )
    return ranks.select("node", F.round("pr", 6).alias("pr"))
