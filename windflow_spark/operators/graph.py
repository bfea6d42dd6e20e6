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

from pyspark.sql import DataFrame, Window
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


def triangle_count(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Exact triangle count + global clustering over an undirected edge
    list (rows must be distinct with ``u < v``). One summary row:
    (nodes, edges, open_wedges, triangles, global_clustering).

    Degree-oriented wedge enumeration (the MapReduce triangle algorithm):
    every edge is directed from its lower-(degree, id) endpoint, wedges
    are pairs of out-neighbors, and a wedge counts iff its closing edge
    exists in the oriented list. Out-degrees are bounded by O(sqrt(m)),
    so the wedge set is O(m^1.5) even on power-law graphs — a hub of
    degree 1M generates ZERO wedges from its own key (all its edges point
    INTO it), where the naive sum(C(deg,2)) form would emit 5·10^11.

    Degrees are attached with two window counts over the both-direction
    exploded frame (each endpoint appears exactly deg times per side) —
    no degree-table joins. The oriented list is repartitioned to cluster
    parallelism and persisted: wedge generation, wedge closing, and the
    degree summary all read it, and a cached relation freezes its
    partitioning (see pagerank above).
    """
    spark = edges.sparkSession
    p = spark.sparkContext.defaultParallelism
    both = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(u).alias("_a"), F.col(v).alias("_b")),
                F.struct(F.col(v).alias("_a"), F.col(u).alias("_b")),
            )
        ).alias("e")
    ).select("e._a", "e._b")
    win_b = Window.partitionBy("_b")
    win_a = Window.partitionBy("_a")
    d2 = both.withColumn(
        "_db", F.count(F.lit(1)).over(win_b).cast("long")
    ).withColumn("_da", F.count(F.lit(1)).over(win_a).cast("long"))
    lower = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))
    )
    ed = (
        d2.filter(lower)
        .select(
            F.col("_a").alias("src"),
            F.col("_b").alias("dst"),
            F.col("_da").alias("sdeg"),
            F.col("_db").alias("ddeg"),
        )
        .repartition(p, "src")
        .persist()
    )
    x, y = ed.alias("x"), ed.alias("y")
    wedges = (
        x.join(y, "src")
        .filter(
            (F.col("x.ddeg") < F.col("y.ddeg"))
            | (
                (F.col("x.ddeg") == F.col("y.ddeg"))
                & (F.col("x.dst") < F.col("y.dst"))
            )
        )
        .select(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
    )
    closed = wedges.join(
        ed.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_semi",
    )
    deg = (
        ed.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("n"), F.col("sdeg").alias("d")),
                    F.struct(F.col("dst").alias("n"), F.col("ddeg").alias("d")),
                )
            ).alias("nd")
        )
        .select("nd.n", "nd.d")
        .distinct()
    )
    s_deg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("nodes"),
        F.sum((F.col("d") * (F.col("d") - F.lit(1))) / F.lit(2))
        .cast("long")
        .alias("open_wedges"),
    )
    s_e = ed.agg(F.count(F.lit(1)).cast("long").alias("edges"))
    s_t = closed.agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    return (
        s_deg.crossJoin(s_e)
        .crossJoin(s_t)
        .select(
            "nodes",
            "edges",
            "open_wedges",
            "triangles",
            F.round(
                F.lit(3.0)
                * F.col("triangles")
                / F.col("open_wedges").cast("double"),
                6,
            ).alias("global_clustering"),
        )
    )
