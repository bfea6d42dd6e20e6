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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two array<double> columns via higher-order fold.

    (An unrolled `a[0]*b[0] + ...` form was measured and REJECTED: the
    64-term expression trees blow up codegen — sim_topk_lsh went 3.5s→20s
    from method-size fallback. The HOF fold stays compact; the win is to
    evaluate it ONCE per pair — see the pushdown barrier in
    embedding_cosine_neardup — not to micro-optimize the fold.)
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns (cast upstream)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_prenorm(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """Cosine with norms precomputed per ROW (before the candidate join)
    instead of per PAIR — same expression tree, so bit-identical to
    ``cosine``, but the per-pair work drops to one dot product. With P
    candidate pairs over N rows this saves 2·P−N norm evaluations."""
    return _dot(a, b) / (a_norm * b_norm)


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
    max_query_rows: int | None = 10_000,
) -> DataFrame:
    """Top-k cosine neighbors per query (exact). ``queries`` must be small
    enough to broadcast — that is the brute-force contract; for corpus-sized
    query sets use `lsh_topk` or `ivf_topk`.

    The contract is ENFORCED: the plan below is a broadcast nested-loop
    (O(corpus × queries) dot products), so a corpus-sized query side would
    silently take quadratic time. ``max_query_rows`` refuses such inputs up
    front with a pointer to the scale paths (``limit(n+1).count()`` — a
    bounded probe, not a full scan). Pass ``None`` to opt out for a side
    known to be bounded (e.g. a fresh batch of user queries).

    Cost note: the probe is an EAGER job at call time, and the query-side
    lineage is computed twice (once for the probe, once in the join). If
    ``queries`` is an expensive derived frame, ``.persist()`` it first (or
    pass ``max_query_rows=None`` when its bound is already known) —
    internal registry callers pass literal bounded sides.

    Output: (query_id, vec_id, cos_sim rounded 6dp, rk) — ties broken by
    vec_id for determinism.
    """
    if max_query_rows is not None:
        probe = queries.limit(max_query_rows + 1).count()
        if probe > max_query_rows:
            raise ValueError(
                f"brute_force_topk: query side exceeds max_query_rows="
                f"{max_query_rows} (the broadcast nested-loop plan is "
                "O(corpus x queries)); use lsh_topk/ivf_topk for "
                "corpus-scale query sets, or raise max_query_rows/pass None "
                "if the side is genuinely bounded."
            )
    c = corpus.select(
        F.col(id_col), as_double_array(vec_col).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    q = queries.select(
        F.col(query_id_col), as_double_array(vec_col).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).withColumn(
        "cos_sim",
        F.round(cosine_prenorm(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")), 6),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rk")
    )


def md5_sign_planes(n_planes: int, dim: int) -> "np.ndarray":
    """±1 'signed random projection' hyperplanes derived from md5 parity:
    plane i, coordinate d is +1 iff the first hex nibble of md5(f"{i},{d}")
    is >= 8. Rademacher (±1) projections preserve cosine-LSH guarantees like
    Gaussian ones (Charikar 2002 uses sign hashes; Achlioptas 2003 for ±1
    projections), and md5 is reproducible in any engine — so an external SQL
    oracle can materialize the identical planes and bucket assignment."""
    import hashlib

    return np.array(
        [
            [
                1.0 if int(hashlib.md5(f"{i},{d}".encode()).hexdigest()[0], 16) >= 8 else -1.0
                for d in range(dim)
            ]
            for i in range(n_planes)
        ]
    )


def md5_sign_planes_sql_values(n_planes: int, dim: int) -> str:
    """The same planes as a SQL VALUES list `(i, [..])` for oracle queries."""
    P = md5_sign_planes(n_planes, dim)
    rows = ", ".join(
        "({}, [{}])".format(i, ", ".join("1.0" if x > 0 else "-1.0" for x in P[i]))
        for i in range(n_planes)
    )
    return rows


def hyperplane_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    dim: int = 64,
    plane_mode: str = "gaussian",
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of projections onto pseudo-random
    planes → one integer bucket. Deterministic planes derived from the seed
    so executors need no shared state. ``plane_mode="md5-pm1"`` swaps the
    Gaussian planes for md5-parity ±1 planes (see md5_sign_planes) that an
    external SQL engine can reproduce."""
    from pyspark.sql.functions import pandas_udf

    if plane_mode == "md5-pm1":
        planes = md5_sign_planes(n_planes, dim)
    else:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_planes, dim))

    @pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (V @ planes.T) > 0  # (rows, n_planes)
        weights = np.left_shift(np.uint64(1), np.arange(n_planes, dtype=np.uint64))
        return pd.Series((signs.astype(np.uint64) @ weights).view(np.int64))

    return df.withColumn("lsh_bucket", _bucket(as_double_array(vec_col)))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    dim: int = 64,
    plane_mode: str = "gaussian",
) -> DataFrame:
    """Approximate top-k: candidates restricted to equal LSH buckets
    (bucket-join, no cross product), then exact cosine + rank within
    candidates."""
    cb = hyperplane_lsh_buckets(corpus, vec_col, n_planes, dim=dim, plane_mode=plane_mode).select(
        F.col(id_col), F.col("lsh_bucket"), as_double_array(vec_col).alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    qb = hyperplane_lsh_buckets(queries, vec_col, n_planes, dim=dim, plane_mode=plane_mode).select(
        F.col(query_id_col), F.col("lsh_bucket"), as_double_array(vec_col).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    scored = cb.join(qb, "lsh_bucket").filter(F.col(id_col) != F.col(query_id_col)).withColumn(
        "cos_sim",
        F.round(cosine_prenorm(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")), 6),
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
    ).withColumn("_cn", _norm(F.col("_cv")))
    q = queries.select(
        F.col(query_id_col), F.col(bucket_col).alias("_bkt"), as_double_array(vec_col).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    scored = c.join(q, "_bkt").filter(F.col(id_col) != F.col(query_id_col)).withColumn(
        "cos_sim",
        F.round(cosine_prenorm(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")), 6),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rk")
    )


def ivf_centroids(
    corpus: DataFrame,
    bucket_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-list centroid vectors (the coarse quantizer's codebook),
    computed distributed: posexplode to (list, dim, value), mean per
    (list, dim), regroup to an ordered array. Output is num_lists rows —
    small by construction at any corpus size (that is what makes it
    broadcastable to the probe step). Dims are rounded to 6dp so the
    codebook is stable across aggregation orders (float addition is
    non-associative; partial-agg order varies run to run)."""
    c = corpus.select(
        F.col(bucket_col).alias("_bkt"),
        F.posexplode(as_double_array(vec_col)).alias("_dim", "_val"),
    )
    per_dim = c.groupBy("_bkt", "_dim").agg(F.round(F.avg("_val"), 6).alias("_avg"))
    return per_dim.groupBy("_bkt").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_dim", "_avg"))), lambda x: x["_avg"]
        ).alias("_cv")
    )


def ivf_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN with multi-probe: each query ranks the inverted lists by
    centroid cosine and scans its ``nprobe`` nearest lists (FAISS-style
    query path; ``ivf_topk`` is the nprobe=1 shortcut that trusts the
    query's own pre-assigned list). Recall rises with nprobe at the cost of
    probing nprobe× more list entries.

    Scale shape: the codebook (num_lists rows) broadcasts to the bounded
    query side — a documented bounded-side nested-loop, num_queries ×
    num_lists pairs; the probe itself is the same shuffle-partitioned
    bucket equi-join as ``ivf_topk``, now keyed on the probed list id, so
    per-task work stays bounded by list sizes × nprobe."""
    cent = ivf_centroids(corpus, bucket_col, vec_col).withColumn(
        "_cn", _norm(F.col("_cv"))
    )
    q = queries.select(
        F.col(query_id_col), as_double_array(vec_col).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    probe_rank = W.partitionBy(query_id_col).orderBy(
        F.round(
            cosine_prenorm(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")), 6
        ).desc(),
        F.col("_bkt"),
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("_prk", F.row_number().over(probe_rank))
        .filter(F.col("_prk") <= nprobe)
        .select(query_id_col, "_bkt", "_qv", "_qn")
    )
    c = corpus.select(
        F.col(id_col),
        F.col(bucket_col).alias("_bkt"),
        as_double_array(vec_col).alias("_cv"),
    ).withColumn("_cn", _norm(F.col("_cv")))
    scored = (
        c.join(probes, "_bkt")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenorm(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")),
                6,
            ),
        )
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
    engine: str = "pandas",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed: candidate pairs
    are generated only within a coarse-quantizer bucket, verified with exact
    cosine and thresholded on the 6dp-rounded score.

    ``engine="pandas"`` (default, the scale path): one Arrow batch per
    bucket via applyInPandas; all pairs of a bucket scored with a single
    BLAS matmul in row blocks (no per-pair Python, no per-pair fold). Each
    bucket is an independent task — at 100 TB, Σ bucket² bounds the work
    and buckets shuffle-partition across executors. Memory is bounded by
    block_rows × bucket_size scores per task.

    ``engine="sql"``: all-JVM per-bucket self-equi-join + HOF cosine —
    slower per pair but exactly-sequential float summation when an engine
    comparison demands fold-order-identical bits.
    """
    if engine == "pandas":
        import numpy as np
        import pandas as pd

        out_schema = f"id_a long, id_b long, cos_sim double"
        block_rows = 2048

        def score_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(id_col)
            ids = pdf[id_col].to_numpy()
            V = np.stack(pdf["_v"].to_numpy())
            nrm = np.sqrt(np.einsum("ij,ij->i", V, V))
            n = len(ids)
            outs = []
            for s in range(0, n, block_rows):
                e_ = min(s + block_rows, n)
                G = (V[s:e_] @ V.T) / np.outer(nrm[s:e_], nrm)
                bi, bj = np.nonzero(np.round(G, 6) >= threshold)
                keep = (bi + s) < bj  # id_a < id_b, each pair once
                bi, bj = bi[keep], bj[keep]
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[bi + s],
                            "id_b": ids[bj],
                            "cos_sim": np.round(G[bi, bj], 6),
                        }
                    )
                )
            return pd.concat(outs) if outs else pd.DataFrame(
                {"id_a": [], "id_b": [], "cos_sim": []}
            )

        e = df.select(
            F.col(id_col), F.col(bucket_col).alias("_bkt"), as_double_array(vec_col).alias("_v")
        )
        return e.groupBy("_bkt").applyInPandas(score_bucket, out_schema)

    e = df.select(
        F.col(id_col), F.col(bucket_col).alias("_bkt"), as_double_array(vec_col).alias("_v")
    ).withColumn("_nrm", _norm(F.col("_v")))
    a = e.alias("a")
    b = e.alias("b")
    scored = (
        a.join(b, (F.col("a._bkt") == F.col("b._bkt")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        # The non-deterministic _mid column blocks PushPredicateThroughProject,
        # so the threshold filter stays ABOVE this projection and the cosine
        # fold is evaluated ONCE per pair (pushed down, it appears in both the
        # predicate and the projection — measured 2× the runtime).
        .withColumn("_mid", F.monotonically_increasing_id())
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                cosine_prenorm(
                    F.col("a._v"), F.col("b._v"), F.col("a._nrm"), F.col("b._nrm")
                ),
                6,
            ).alias("cos_sim"),
            "_mid",
        )
    )
    return scored.filter(F.col("cos_sim") >= threshold).select("id_a", "id_b", "cos_sim")


def _assign_nearest_list(
    vec_df: DataFrame,
    cent: DataFrame,
    id_col: str,
    vec_prepped: bool = False,
    vec_col: str = "embedding",
    keep_score: bool = False,
) -> DataFrame:
    """Assign every vector to its nearest codebook centroid by cosine
    (6dp-rounded, list-id tie-break) — the Lloyd assignment step. The
    codebook (k rows) broadcasts onto the vector side, so the plan is the
    k-means-canonical O(N·k) pass: a BroadcastNestedLoopJoin whose inner
    side is the k-row codebook (documented in tests/test_plans.py).
    Input cent: (_bkt, _cv); output: vec_df columns + (_bkt), plus the
    winning 6dp cosine as ``_cos`` when ``keep_score`` is set."""
    c = cent.select(
        F.col("_bkt").alias("_abkt"),
        F.col("_cv").alias("_acv"),
    ).withColumn("_acn", _norm(F.col("_acv")))
    v = (
        vec_df
        if vec_prepped
        else vec_df.select(
            F.col(id_col), as_double_array(vec_col).alias("_v")
        ).withColumn("_vn", _norm(F.col("_v")))
    )
    score = F.round(
        cosine_prenorm(F.col("_v"), F.col("_acv"), F.col("_vn"), F.col("_acn")), 6
    )
    rank = W.partitionBy(id_col).orderBy(score.desc(), F.col("_abkt"))
    out_cols = [*v.columns, F.col("_abkt").alias("_bkt")]
    if keep_score:
        out_cols.append(F.col("_cos"))
    return (
        v.crossJoin(F.broadcast(c))
        .withColumn("_cos", score)
        .withColumn("_ark", F.row_number().over(rank))
        .filter(F.col("_ark") == 1)
        .select(*out_cols)
    )


def kmeans_codebook(
    corpus: DataFrame,
    n_lists: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train an IVF coarse quantizer with ``iters`` Lloyd iterations,
    distributed: init = the vectors with id < n_lists (deterministic, no
    RNG), assignment = broadcast-codebook pass over the corpus, update =
    per-(list, dim) mean via posexplode (6dp-rounded so the codebook is
    stable across aggregation orders). Between iterations the codebook —
    n_lists × dim doubles, trivially driver-sized at ANY corpus scale (the
    FAISS shape: quantizers are memory-resident) — is collected and
    re-seeded as a literal frame, so each iteration is exactly ONE corpus
    pass and the lineage never compounds (same driver-holds-one-small-thing
    discipline as dedup_clusters' convergence scalar). Clusters that lose
    all members drop out of the codebook. Output: (_bkt, _cv)."""
    spark = corpus.sparkSession
    rows = _kmeans_rows(corpus, n_lists, iters, id_col, vec_col)
    return spark.createDataFrame(rows, _CODEBOOK_SCHEMA)


_CODEBOOK_SCHEMA = "_bkt long, _cv array<double>"

# Trained codebooks memoized per (cache_key, n_lists, iters, id_col,
# vec_col): each value is n_lists × dim python floats — driver-trivial at
# any corpus scale (the FAISS memory-resident-quantizer shape). The cache
# holds plain rows, not DataFrames, so entries survive session restarts
# harmlessly (a literal frame is rebuilt per call, zero Spark jobs).
_CODEBOOK_CACHE: dict[tuple, list[tuple[int, list[float]]]] = {}


def _kmeans_rows(
    corpus: DataFrame,
    n_lists: int,
    iters: int,
    id_col: str,
    vec_col: str,
) -> list[tuple[int, list[float]]]:
    """The Lloyd training loop of kmeans_codebook, returning plain
    (bucket, centroid) rows — the memoizable artifact."""
    spark = corpus.sparkSession
    rows = [
        (int(r["_bkt"]), list(r["_cv"]))
        for r in corpus.filter(F.col(id_col) < n_lists)
        .select(
            F.col(id_col).cast("long").alias("_bkt"),
            as_double_array(vec_col).alias("_cv"),
        )
        .collect()
    ]
    for _ in range(iters):
        cent = spark.createDataFrame(rows, _CODEBOOK_SCHEMA)
        assigned = _assign_nearest_list(corpus, cent, id_col, vec_col=vec_col)
        rows = [
            (int(r["_bkt"]), list(r["_cv"]))
            for r in ivf_centroids(assigned, "_bkt", "_v").collect()
        ]
    return rows


def train_codebook(
    corpus: DataFrame,
    cache_key: object = None,
    n_lists: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train-ONCE handle over ``kmeans_codebook`` (VERDICT r5 #1): the
    FAISS train/add split. Training an identical deterministic codebook
    costs ~8 serial Spark jobs; queries that share a quantizer
    (sim_topk_ivf_kmeans, sim_ivf_kmeans_recall, cluster_embeddings_kmeans)
    must not each retrain it. Pass a ``cache_key`` identifying the corpus
    (e.g. the sf_dir path): the trained rows are memoized per
    (cache_key, n_lists, iters, id_col, vec_col) and later calls rebuild
    the k-row literal frame with ZERO Spark jobs. ``cache_key=None``
    trains unconditionally (the old behavior). Callers that mutate the
    data behind a key must pass a fresh key — the cache trusts the key,
    by design (same contract as a FAISS index handle)."""
    spark = corpus.sparkSession
    key = (cache_key, n_lists, iters, id_col, vec_col)
    if cache_key is None or key not in _CODEBOOK_CACHE:
        rows = _kmeans_rows(corpus, n_lists, iters, id_col, vec_col)
        if cache_key is not None:
            _CODEBOOK_CACHE[key] = rows
    else:
        rows = _CODEBOOK_CACHE[key]
    return spark.createDataFrame(rows, _CODEBOOK_SCHEMA)


def ivf_topk_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    iters: int = 2,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cache_key: object = None,
) -> DataFrame:
    """IVF ANN over a TRAINED coarse quantizer (kmeans_codebook) instead of
    a pre-assigned label column — the full FAISS IVF path: train codebook,
    assign corpus to inverted lists, rank lists per query by centroid
    cosine, scan the nprobe nearest lists. The probe is the same
    shuffle-partitioned list equi-join as ivf_topk; the only non-equi step
    is the k-row codebook broadcast (assignment + probe ranking).
    ``cache_key`` (e.g. the corpus path) routes training through the
    memoized train_codebook so a shared quantizer trains once."""
    cent = train_codebook(
        corpus, cache_key, n_lists, iters, id_col, vec_col
    ).withColumn("_cn", _norm(F.col("_cv")))
    assigned = _assign_nearest_list(corpus, cent, id_col, vec_col=vec_col)
    q = queries.select(
        F.col(query_id_col), as_double_array(vec_col).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    probe_rank = W.partitionBy(query_id_col).orderBy(
        F.round(
            cosine_prenorm(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")), 6
        ).desc(),
        F.col("_bkt"),
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("_prk", F.row_number().over(probe_rank))
        .filter(F.col("_prk") <= nprobe)
        .select(query_id_col, "_bkt", "_qv", "_qn")
    )
    scored = (
        assigned.join(probes, "_bkt")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenorm(F.col("_qv"), F.col("_v"), F.col("_qn"), F.col("_vn")),
                6,
            ),
        )
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rk")
    )


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    cache_key: object = None,
    n_lists: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist a trained IVF index — the durable half of the FAISS
    train/add split (train_codebook covers the in-session half). Writes
    ``<path>/codebook`` (k rows) and ``<path>/lists`` (the corpus with
    prenormed vectors, PARTITIONED BY inverted list) so a 100 TB corpus
    indexes ONCE and every later query batch probes the stored lists:
    the nprobe selected lists map to parquet partitions, so a probe scan
    touches nprobe/n_lists of the data (dynamic partition pruning; at
    scale raise n_lists so each list is a few files). Columns are
    flattened to (id, vector, norm, list) on disk."""
    cent = train_codebook(corpus, cache_key, n_lists, iters, id_col, vec_col)
    assigned = _assign_nearest_list(corpus, cent, id_col, vec_col=vec_col)
    cent.select(
        F.col("_bkt").alias("list_id"), F.col("_cv").alias("centroid")
    ).write.mode("overwrite").parquet(f"{path}/codebook")
    assigned.select(
        F.col(id_col),
        F.col("_v").alias("vector"),
        F.col("_vn").alias("norm"),
        F.col("_bkt").alias("list_id"),
    ).write.mode("overwrite").partitionBy("list_id").parquet(f"{path}/lists")


def ivf_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe a stored IVF index (save_ivf_index): rank stored centroids
    per query by cosine (k-row broadcast), scan the nprobe nearest lists
    via the list equi-join. Result-identical to ivf_topk_kmeans over the
    same corpus/params — pinned by test — without retraining or
    re-assigning anything."""
    cent = (
        spark.read.parquet(f"{path}/codebook")
        .select(F.col("list_id").alias("_bkt"), F.col("centroid").alias("_cv"))
        .withColumn("_cn", _norm(F.col("_cv")))
    )
    lists = spark.read.parquet(f"{path}/lists").select(
        F.col(id_col),
        F.col("vector").alias("_v"),
        F.col("norm").alias("_vn"),
        F.col("list_id").alias("_bkt"),
    )
    q = queries.select(
        F.col(query_id_col), as_double_array(vec_col).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    probe_rank = W.partitionBy(query_id_col).orderBy(
        F.round(
            cosine_prenorm(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")), 6
        ).desc(),
        F.col("_bkt"),
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("_prk", F.row_number().over(probe_rank))
        .filter(F.col("_prk") <= nprobe)
        .select(query_id_col, "_bkt", "_qv", "_qn")
    )
    scored = (
        lists.join(probes, "_bkt")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenorm(F.col("_qv"), F.col("_v"), F.col("_qn"), F.col("_vn")),
                6,
            ),
        )
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rk")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the FAISS IVF-PQ residual of the ANN family —
# split each vector into m subspaces, k-means each subspace independently,
# store every vector as m small codes (here 3-bit: 8 centroids/subspace; a
# production table uses 8-bit: 256), and answer queries with asymmetric
# distance computation (ADC): per query, ONE m×k table of exact
# query-subvector↔centroid distances, then every candidate's distance is a
# sum of m table lookups. Completes the deploy spectrum measured by the
# registry: float32 exact → int8 (4×, recall sim_quantized_recall) → PQ
# (dim·4bytes → m codes, here 64×, recall sim_pq_recall).
#
# Scale shape: training = iters × ONE corpus pass (the m·k×sub_dim codebook
# — 512 doubles here — is the only driver-resident artifact, the FAISS
# memory-resident-quantizer discipline shared with train_codebook); encode =
# one broadcast-codebook pass; ADC = a Q·m·k distance table broadcast onto
# the code frame, one equi-join on (subspace, code), one (query, vec) sum.
# Nothing is ever pairwise on raw vectors.
# ---------------------------------------------------------------------------

_PQ_SCHEMA = "_sub int, _bkt long, _cv array<double>"

# (cache_key, m, n_centroids, iters, id_col, vec_col) -> plain codebook rows
_PQ_CACHE: dict[tuple, list[tuple[int, int, list[float]]]] = {}


def _l2d2(a: Column, b: Column) -> Column:
    """Squared L2 distance, 6dp-rounded, in the engine-mirrored form
    ``(ip(a,a) - 2·ip(a,b)) + ip(b,b)`` — the same inner-product folds the
    cosine family already proves round-6-stable cross-engine."""
    return F.round((_dot(a, a) - F.lit(2.0) * _dot(a, b)) + _dot(b, b), 6)


def _subvector_frame(
    df: DataFrame, id_col: str, vec_col: str, m: int, sub_dim: int
) -> DataFrame:
    """Explode vectors into (id, _sub, _sv) subvector rows — one pass, no
    shuffle (the explode is map-side)."""
    v = as_double_array(vec_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("_sub"),
                F.slice(v, j * sub_dim + 1, sub_dim).alias("_sv"),
            )
            for j in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p._sub").alias("_sub"), F.col("_p._sv").alias("_sv")
    )


def _pq_assign(es: DataFrame, cent: DataFrame, id_col: str) -> DataFrame:
    """Nearest-centroid assignment per (vector, subspace): broadcast
    equi-join on the subspace id (m·k rows), 6dp squared-L2, centroid-id
    tie-break — the Lloyd assignment, one corpus pass."""
    c = cent.select(
        F.col("_sub").alias("_cs"), F.col("_bkt"), F.col("_cv")
    )
    j = es.join(F.broadcast(c), es["_sub"] == F.col("_cs"))
    d2 = _l2d2(F.col("_sv"), F.col("_cv"))
    w = W.partitionBy(id_col, "_sub").orderBy(d2.asc(), F.col("_bkt"))
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, "_sub", "_sv", "_bkt")
    )


def _pq_rows(
    corpus: DataFrame,
    m: int,
    n_centroids: int,
    iters: int,
    id_col: str,
    vec_col: str,
    dim: int,
) -> list[tuple[int, int, list[float]]]:
    """Train all m subspace codebooks JOINTLY: the subvector explode makes
    every Lloyd iteration one assignment pass + one mean pass for ALL
    subspaces (training cost independent of m in job count). Deterministic
    init = subvectors of the first n_centroids ids; per-(sub, bkt, dim)
    means are 6dp-rounded so the codebook is stable across aggregation
    orders. Returns plain rows (the memoizable, driver-trivial artifact)."""
    spark = corpus.sparkSession
    sub_dim = dim // m
    es = _subvector_frame(corpus, id_col, vec_col, m, sub_dim)
    rows = [
        (int(r["_sub"]), int(r["_bkt"]), list(r["_cv"]))
        for r in es.filter(F.col(id_col) < n_centroids)
        .select(
            "_sub",
            F.col(id_col).cast("long").alias("_bkt"),
            F.col("_sv").alias("_cv"),
        )
        .collect()
    ]
    for _ in range(iters):
        cent = spark.createDataFrame(rows, _PQ_SCHEMA)
        a = _pq_assign(es, cent, id_col)
        per = (
            a.select("_sub", "_bkt", F.posexplode("_sv").alias("_dim", "_val"))
            .groupBy("_sub", "_bkt", "_dim")
            .agg(F.round(F.avg("_val"), 6).alias("_avg"))
        )
        upd = per.groupBy("_sub", "_bkt").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_dim", "_avg"))),
                lambda x: x["_avg"],
            ).alias("_cv")
        )
        rows = [
            (int(r["_sub"]), int(r["_bkt"]), list(r["_cv"])) for r in upd.collect()
        ]
    return rows


def train_pq_codebooks(
    corpus: DataFrame,
    cache_key: object = None,
    m: int = 4,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Train-once handle over the PQ codebooks (same contract as
    train_codebook): pass a cache_key identifying the corpus and later
    calls rebuild the m·k-row literal frame with zero Spark jobs."""
    spark = corpus.sparkSession
    key = (cache_key, m, n_centroids, iters, id_col, vec_col)
    if cache_key is None or key not in _PQ_CACHE:
        rows = _pq_rows(corpus, m, n_centroids, iters, id_col, vec_col, dim)
        if cache_key is not None:
            _PQ_CACHE[key] = rows
    else:
        rows = _PQ_CACHE[key]
    return spark.createDataFrame(rows, _PQ_SCHEMA)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    dim: int = 64,
    cache_key: object = None,
) -> DataFrame:
    """ADC top-k: encode the corpus to (id, sub, code), build the per-query
    exact distance table (Q·m·k rows — broadcast), and rank candidates by
    the summed table lookups. Output: (query_id, vec_id, adc_d2, rk≤k),
    self-pairs excluded, distance-then-id tie-break."""
    sub_dim = dim // m
    cent = train_pq_codebooks(
        corpus, cache_key, m, n_centroids, iters, id_col, vec_col, dim
    )
    es = _subvector_frame(corpus, id_col, vec_col, m, sub_dim)
    codes = _pq_assign(es, cent, id_col).select(id_col, "_sub", "_bkt")
    qs = _subvector_frame(queries, query_id_col, vec_col, m, sub_dim)
    dt = (
        qs.join(
            F.broadcast(
                cent.select(F.col("_sub").alias("_cs"), "_bkt", "_cv")
            ),
            qs["_sub"] == F.col("_cs"),
        )
        .select(
            query_id_col,
            "_sub",
            "_bkt",
            _l2d2(F.col("_sv"), F.col("_cv")).alias("_d2"),
        )
    )
    adc = (
        codes.join(F.broadcast(dt), ["_sub", "_bkt"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("_d2"), 6).alias("adc_d2"))
    )
    wq = W.partitionBy(query_id_col).orderBy(
        F.col("adc_d2").asc(), F.col(id_col)
    )
    return adc.withColumn(
        "rk", F.row_number().over(wq).cast("long")
    ).filter(F.col("rk") <= k)


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    max_query_rows: int | None = 10_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the top-k
    most-similar corpus vectors whose LABEL DIFFERS from the query's —
    the negatives that sit closest to the decision boundary and carry the
    most gradient signal (random negatives are trivially separable).

    Same contract and plan as brute_force_topk (bounded query side
    broadcast, O(corpus x queries) dot products, probe-enforced); at
    corpus scale route candidate generation through the IVF/LSH paths and
    apply the label-mismatch filter on the bucket-join output — the
    filter composes with any candidate generator because it is a plain
    predicate on the scored pairs.

    Output: (query_id, query_label, vec_id, neg_label, cos_sim rounded
    6dp, rk) — ties broken by vec_id for determinism.
    """
    if max_query_rows is not None:
        probe = queries.limit(max_query_rows + 1).count()
        if probe > max_query_rows:
            raise ValueError(
                f"hard_negative_topk: query side exceeds max_query_rows="
                f"{max_query_rows}; use the IVF/LSH candidate paths with a "
                "label-mismatch filter for corpus-scale query sets."
            )
    c = corpus.select(
        F.col(id_col),
        F.col(label_col).cast("long").alias("_cl"),
        as_double_array(vec_col).alias("_cv"),
    ).withColumn("_cn", _norm(F.col("_cv")))
    q = queries.select(
        F.col(query_id_col),
        F.col(label_col).cast("long").alias("_ql"),
        as_double_array(vec_col).alias("_qv"),
    ).withColumn("_qn", _norm(F.col("_qv")))
    scored = c.join(
        F.broadcast(q),
        (F.col(id_col) != F.col(query_id_col)) & (F.col("_cl") != F.col("_ql")),
    ).withColumn(
        "cos_sim",
        F.round(
            cosine_prenorm(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")),
            6,
        ),
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(
            query_id_col,
            F.col("_ql").alias("query_label"),
            id_col,
            F.col("_cl").alias("neg_label"),
            "cos_sim",
            "rk",
        )
    )
