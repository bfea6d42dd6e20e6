"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against the corpus, dot products as column expressions, per-query top-k
via window rank. Shuffle volume is O(corpus × queries) rows of scalars, not
vectors, and the vector math stays JVM-side.

Scale path: LSH bucketing (random hyperplane signs → band buckets) restricts
candidates to matching buckets — the same bucket-join shape as MinHash-LSH
dedup; an IVF variant (k-means coarse quantizer via Spark ML) plugs into the
same candidate-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns (cast upstream)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine neighbors per query (exact). ``queries`` must be small
    enough to broadcast — that is the brute-force contract; for corpus-sized
    query sets use `lsh_topk`.

    Output: (query_id, vec_id, cos_sim rounded 6dp, rk) — ties broken by
    vec_id for determinism.
    """
    c = corpus.select(
        F.col(id_col), as_double_array(vec_col).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col), as_double_array(vec_col).alias("_qv")
    )
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).withColumn(
        "cos_sim", F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rk")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of projections onto pseudo-random
    planes → one integer bucket. Deterministic planes derived from
    xxhash64(seed, plane, coord) so executors need no shared state."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    v = as_double_array(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        bucket = bucket + F.when(_dot(v, plane) > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
    return df.withColumn("lsh_bucket", bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to equal LSH buckets
    (bucket-join, no cross product), then exact cosine + rank within
    candidates."""
    cb = hyperplane_lsh_buckets(corpus, vec_col, n_planes, dim=dim).select(
        F.col(id_col), F.col("lsh_bucket"), as_double_array(vec_col).alias("_cv")
    )
    qb = hyperplane_lsh_buckets(queries, vec_col, n_planes, dim=dim).select(
        F.col(query_id_col), F.col("lsh_bucket"), as_double_array(vec_col).alias("_qv")
    )
    scored = cb.join(qb, "lsh_bucket").filter(F.col(id_col) != F.col(query_id_col)).withColumn(
        "cos_sim", F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style ANN (nprobe=1): a coarse quantizer has already assigned
    every vector to an inverted list (``bucket_col``); each query scans only
    its own list. The probe is a bucket-equi join — shuffle-partitioned by
    list id, never a cross product — so at 100 TB each inverted list is an
    independent co-partitioned unit and skew is bounded by list sizes.

    Reference parity: the reference has no similarity ops at all (SURVEY.md
    §2.11 "not present"); this is a north-star extension operator.
    """
    c = corpus.select(
        F.col(id_col), F.col(bucket_col).alias("_bkt"), as_double_array(vec_col).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col), F.col(bucket_col).alias("_bkt"), as_double_array(vec_col).alias("_qv")
    )
    scored = c.join(q, "_bkt").filter(F.col(id_col) != F.col(query_id_col)).withColumn(
        "cos_sim", F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rk")
    )


def embedding_cosine_neardup(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed: candidate pairs
    are generated only within a coarse-quantizer bucket (self-equi-join on
    ``bucket_col``), then verified with exact cosine and thresholded on the
    rounded score (rounding first keeps the boundary decision identical
    across engines). Same candidate-join shape as MinHash-LSH dedup: per-
    bucket self-join, no O(n²) cross product, scales with Σ bucket².
    """
    e = df.select(
        F.col(id_col), F.col(bucket_col).alias("_bkt"), as_double_array(vec_col).alias("_v")
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, (F.col("a._bkt") == F.col("b._bkt")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("cos_sim", F.round(cosine(F.col("a._v"), F.col("b._v")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cos_sim",
        )
    )
