"""ANN recall on SEPARABLE (clustered) embeddings — the measurement that
backs the 'data-bound, not plan-bound' claim for the low recall numbers on
the synthetic near-isotropic corpus (knn_graph_recall ≈ 0.5,
sim_matryoshka_recall ≈ 0.08): the same untouched machinery, run on a
fixture with real cluster structure, must deliver the textbook >0.9.

Fixture: 8 random-unit centroids in 64-dim (pairwise |cos| ~ 1/sqrt(64);
the dim matches the testdata corpus — the md5-derived LSH planes are
generated at that dim)
with sigma=0.05 Gaussian noise per point — within-cluster cosine ≈ 0.96,
cross-cluster ≤ ~0.5. vec_ids interleave clusters so the registry queries'
fixed vec_id<50 sample spans all 8 clusters. Written as embeddings.parquet
in a tmp dir with the exact testdata schema, so the REGISTRY functions run
unmodified against it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

N_CLUSTERS, PER_CLUSTER, DIM = 8, 40, 64


@pytest.fixture(scope="module")
def clustered_sf_dir(tmp_path_factory) -> str:
    rng = np.random.default_rng(7)
    cents = rng.normal(size=(N_CLUSTERS, DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vec_ids, vecs, labels = [], [], []
    vid = 0
    for _ in range(PER_CLUSTER):
        for c in range(N_CLUSTERS):  # interleave: vec_id % 8 == cluster
            vecs.append(cents[c] + 0.05 * rng.normal(size=DIM))
            vec_ids.append(vid)
            labels.append(c)
            vid += 1
    tbl = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    d = tmp_path_factory.mktemp("clustered_sf")
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_knn_graph_lsh_recall_above_09_on_clustered(spark, clustered_sf_dir):
    """The registry's own knn_graph_recall (4x4-bit LSH tables, capped
    buckets, exact brute-force truth) on separable data: recall@3 > 0.9 —
    vs the honest 0.51 the SAME code measures on the isotropic corpus."""
    from windflow_spark.queries import knn_graph_recall

    row = knn_graph_recall(spark, clustered_sf_dir).collect()[0]
    assert row["n_truth"] == 150  # 50 sample queries x top-3
    assert row["recall_at_3"] > 0.9, row


def test_ivf_kmeans_recall_above_09_on_clustered(spark, clustered_sf_dir):
    """Trained-quantizer IVF (kmeans codebook, nprobe=1) on separable
    data: mean recall@5 > 0.9 when the learned lists line up with real
    cluster structure."""
    from windflow_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk_kmeans,
    )

    emb = spark.read.parquet(f"{clustered_sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = brute_force_topk(emb, qs, k=5).select("query_id", "vec_id")
    km = ivf_topk_kmeans(
        emb, qs, k=5, n_lists=N_CLUSTERS, iters=2, nprobe=1,
        cache_key=("clustered-fixture", clustered_sf_dir),
    ).select("query_id", "vec_id")
    n_hits = bf.join(km, ["query_id", "vec_id"], "left_semi").count()
    n_truth = bf.count()
    assert n_truth == 40 * 5
    recall = n_hits / n_truth
    assert recall > 0.9, f"ivf kmeans recall {recall}"
