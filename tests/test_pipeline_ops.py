"""Training-pipeline operator edge cases (the oracle gate covers the happy
path at sf0.01; these pin the boundaries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from windflow_spark.functions.pipeline import (
    chunk_documents,
    pack_sequences_greedy,
    stratified_sample_hash,
    vocab_top_tokens,
)


def test_chunk_documents_overlap_and_tail(spark):
    toks = " ".join(f"t{i}" for i in range(95))
    df = spark.createDataFrame(
        [(1, toks), (2, "a b"), (3, ""), (4, "   ")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=50, stride=40).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 0, 40, 80 → chunks of 50, 50, 15; consecutive chunks
    # overlap by 10 tokens
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.n_chunk_tokens for r in c1] == [50, 50, 15]
    assert c1[0].chunk_text.split(" ")[40:] == c1[1].chunk_text.split(" ")[:10]
    assert c1[2].chunk_text.split(" ")[-1] == "t94"
    # short doc: one chunk with everything
    assert [(r.chunk_id, r.n_chunk_tokens) for r in by_doc[2]] == [(0, 2)]
    # empty / whitespace-only docs produce no chunks
    assert 3 not in by_doc and 4 not in by_doc


def test_pack_greedy_resets_and_oversized(spark):
    rows = [
        ("s", 1, 80), ("s", 2, 80), ("s", 3, 80),  # 80+80 fit, 3rd overflows
        ("s", 4, 500),                              # oversized → own pack
        ("s", 5, 10),
        ("z", 6, 10),                               # separate shard restarts
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
    out = {r.doc_id: r.pack_id for r in pack_sequences_greedy(df, budget=200).collect()}
    assert out[1] == 0 and out[2] == 0          # 160 <= 200
    assert out[3] == 1                           # would be 240 → new pack
    assert out[4] == 2                           # 80+500 > 200 → new pack, alone
    assert out[5] == 3                           # 500+10 > 200 → new pack
    assert out[6] == 0                           # new shard starts at 0


def test_stratified_sample_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(40)], "doc_id long, lang string"
    )
    a = sorted(map(tuple, stratified_sample_hash(df, ["lang"], n_per_stratum=5).collect()))
    # re-shuffled input → identical sample (content-addressed rank)
    b = sorted(map(tuple, stratified_sample_hash(
        df.repartition(7).sortWithinPartitions(F.col("doc_id").desc()),
        ["lang"], n_per_stratum=5).collect()))
    assert a == b
    assert len(a) == 10 and len({(l, d) for l, d, _ in a}) == 10


def test_vocab_top_tokens_rank_ties(spark):
    df = spark.createDataFrame(
        [(1, "b a a b c"), (2, "a b")], "doc_id long, text string"
    )
    out = [(r.token, r.cnt, r.rk) for r in vocab_top_tokens(df, top_n=2).collect()]
    # a and b tie at 3; tie broken alphabetically
    assert sorted(out) == [("a", 3, 1), ("b", 3, 2)]


def test_misra_gries_bounds_zipf(spark):
    # Zipf-skewed random corpus, capacity far below the key count so the
    # per-partition prune path actually runs; the mergeable-summaries
    # bounds must hold for EVERY key under ANY partitioning:
    #   est <= true  and  true - est <= N/(cap+1)
    # and every key with true > N/cap must be present.
    import random

    from windflow_spark.functions.pipeline import misra_gries_summary

    rng = random.Random(7)
    toks = [f"k{min(int(1.0 / (rng.random() ** 0.8)), 200)}" for _ in range(20_000)]
    true = {}
    for t in toks:
        true[t] = true.get(t, 0) + 1
    n = len(toks)
    cap = 8
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    for parts in (2, 13):
        est = {
            r.token: r.est
            for r in misra_gries_summary(
                df.repartition(parts), "token", capacity=cap
            ).collect()
        }
        assert len(est) <= cap * parts
        for k, e in est.items():
            assert e <= true[k], (k, e, true[k])
        for k, c in true.items():
            e = est.get(k, 0)
            assert (c - e) * (cap + 1) <= n, (k, c, e)
            if c * cap > n:
                assert k in est, f"guaranteed heavy hitter {k} missing"


def test_sample_token_budget_boundary_and_determinism(spark):
    from windflow_spark.functions.pipeline import sample_token_budget

    df = spark.createDataFrame(
        [(i, "en", " ".join(["w"] * 10)) for i in range(20)],
        "doc_id long, lang string, text string",
    )
    out = sample_token_budget(df, budget=35, strata_cols=["lang"])
    rows = sorted(map(tuple, out.collect()), key=lambda r: r[3])
    # 10 tokens per doc -> exactly 3 docs fit (30 <= 35, 40 > 35): the doc
    # that would CROSS the budget is excluded, not truncated
    assert [r[3] for r in rows] == [10, 20, 30]
    # re-sharded input selects the identical prefix (content-addressed order)
    rows2 = sorted(
        map(tuple, sample_token_budget(
            df.repartition(7), budget=35, strata_cols=["lang"]).collect()),
        key=lambda r: r[3],
    )
    assert rows == rows2


def test_balanced_source_mix_integer_threshold(spark):
    # mirror the exact BIGINT rule in python: keep iff h*n_s < min_cnt*1e6
    import hashlib

    from windflow_spark.functions.pipeline import balanced_source_mix

    rows = [(i, "big" if i < 40 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    n = {"big": 40, "small": 10}
    exp = {"big": 0, "small": 0}
    for i, src in rows:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1_000_000
        if h * n[src] < 10 * 1_000_000:
            exp[src] += 1
    out = {r.source: (r.n_total, r.n_sampled) for r in balanced_source_mix(df).collect()}
    assert out == {"big": (40, exp["big"]), "small": (10, exp["small"])}
    # the small side keeps (almost) everything; the big side is cut ~4x
    assert exp["small"] >= 8 and exp["big"] <= 15


def test_tfidf_hand_checked(spark):
    import math

    from windflow_spark.functions.pipeline import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {(r.doc_id, r.term): (r.tfidf, r.rk)
           for r in tfidf_top_terms(df, top_k=3).collect()}
    idf = lambda dft: math.log((2 + 1) / (dft + 1))  # noqa: E731
    assert out[(1, "a")] == (round(2 * idf(2), 6), 2)  # idf(a)=ln(1)=0 -> rk by tie
    assert out[(1, "b")] == (round(1 * idf(1), 6), 1)  # rarest term ranks first
    assert out[(2, "c")][1] == 1 and out[(2, "a")][1] == 2


def test_bigram_lm_nll_hand_checked(spark):
    # python mirror of the exact model over the same md5 hash split;
    # fixture texts chosen so both buckets are populated
    import hashlib
    import math

    from windflow_spark.functions.pipeline import bigram_lm_nll

    docs = [
        (1, "a b a b c"),   # train (md5 % 100 < 90)
        (2, "a b a"),       # eval: seen bigrams
        (3, "c a b a"),     # train
        (4, "b c z"),       # eval: unseen bigram + unseen unigram z
        (5, "a q"),         # eval: unseen continuation q
        (6, "a c b"),       # train
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def split_of(text):
        h = int(hashlib.md5(text.encode()).hexdigest()[:8], 16) % 100
        return "train" if h < 90 else "eval"

    tr_b, tr_u = {}, {}
    for _, t in docs:
        toks = t.split()
        if split_of(t) != "train":
            continue
        for w in toks:
            tr_u[w] = tr_u.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            tr_b[(a, b)] = tr_b.get((a, b), 0) + 1
    V = len(tr_u)
    expect = {}
    n_eval = 0
    for did, t in docs:
        toks = t.split()
        if split_of(t) != "eval" or len(toks) < 2:
            continue
        n_eval += 1
        nlls = [
            -math.log((tr_b.get((a, b), 0) + 1) / (tr_u.get(a, 0) + V))
            for a, b in zip(toks, toks[1:])
        ]
        expect[did] = (len(nlls), round(sum(nlls) / len(nlls), 6))
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll) for r in bigram_lm_nll(df).collect()
    }
    assert n_eval >= 1  # the fixture must actually exercise the eval path
    assert got == expect


def test_data_quality_report_dirty_rows(spark):
    from windflow_spark.functions.pipeline import data_quality_report

    rows = [
        (1, "O", 10.0),
        (1, "F", 20.0),      # duplicate key
        (None, "P", 30.0),   # null key
        (4, "X", 40.0),      # bad status
        (5, "O", -1.0),      # negative price
        (6, None, 50.0),     # NULL status: unknown, NOT a violation
    ]
    df = spark.createDataFrame(rows, "k long, st string, price double")
    out = {
        r.rule: (r.n_violations, r.n_rows)
        for r in data_quality_report(
            df,
            {
                "null_k": F.col("k").isNull(),
                "bad_status": ~F.col("st").isin("O", "F", "P"),
                "negative_price": F.col("price") < 0,
            },
            unique_cols=["k"],
        ).collect()
    }
    assert out == {
        "null_k": (1, 6),
        "bad_status": (1, 6),       # NULL st excluded (CASE semantics)
        "negative_price": (1, 6),
        "duplicate_k": (1, 6),      # two rows share k=1 -> 1 extra
    }


def test_profile_columns_nulls_and_types(spark):
    from windflow_spark.functions.pipeline import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (None, "b")], "k long, s string"
    )
    out = {r.column: (r.n_nulls, r.n_distinct, r.min_value, r.max_value)
           for r in profile_columns(df, ["k", "s"]).collect()}
    assert out == {"k": (1, 3, "1", "3"), "s": (1, 2, "a", "b")}


def test_bigram_lm_broadcast_guard_branches(spark):
    # r5 VERDICT #3: the vocab-sized unigram broadcast is gated on an
    # up-front vocab count. Both branches — broadcast (vocab under the
    # cap) and plain shuffle join (cap exceeded) — must produce identical
    # scores; only the join strategy may differ.
    from windflow_spark.functions.pipeline import bigram_lm_nll

    docs = [
        (1, "a b a b c"),
        (2, "a b a"),
        (3, "c a b a"),
        (4, "b c z"),
        (5, "a q"),
        (6, "a c b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = lambda d: sorted(
        (r.doc_id, r.n_bigrams, r.avg_nll) for r in d.collect()
    )
    bcast = bigram_lm_nll(df)                           # vocab << default cap
    plain = bigram_lm_nll(df, max_broadcast_vocab=0)    # force shuffle branch
    assert rows(bcast) == rows(plain)
    assert "broadcast" in bcast._jdf.queryExecution().optimizedPlan().toString().lower()


def test_dq_and_profile_names_with_quotes(spark):
    # rule/column names are interpolated into stack() expression strings —
    # a single quote must neither break parsing nor inject SQL
    from windflow_spark.functions.pipeline import data_quality_report

    df = spark.createDataFrame(
        [(1, 5), (2, None)], "id long, v int"
    )
    rep = {
        r.rule: r.n_violations
        for r in data_quality_report(
            df, {"v is'null": F.col("v").isNull()}
        ).collect()
    }
    assert rep == {"v is'null": 1}


def test_winsorize_summary_matches_python_model(spark):
    import numpy as np

    vals = {"a": [1.0, 2.0, 3.0, 4.0, 100.0], "b": [10.0, 20.0, 30.0]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    from windflow_spark.functions.pipeline import winsorize_summary

    out = {
        r.g: (r.p_lo, r.p_hi, r.n_below, r.n_above, r.mean_winsorized)
        for r in winsorize_summary(df, "v", ["g"]).collect()
    }
    for g, vs in vals.items():
        lo = float(np.percentile(vs, 5))
        hi = float(np.percentile(vs, 95))
        clamped = [min(max(v, lo), hi) for v in vs]
        # numpy's interpolation arithmetic differs from Spark/DuckDB by an
        # ulp (the cross-ENGINE exactness that matters is the oracle gate);
        # the python model is approximate on the bounds, exact on counts.
        got = out[g]
        assert got[0] == pytest.approx(lo, rel=1e-12)
        assert got[1] == pytest.approx(hi, rel=1e-12)
        assert got[2:4] == (sum(v < lo for v in vs), sum(v > hi for v in vs))
        assert got[4] == pytest.approx(
            round(sum(clamped) / len(clamped), 6), abs=1e-5
        )


def test_winsorize_summary_ungrouped(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    from windflow_spark.functions.pipeline import winsorize_summary

    r = winsorize_summary(df, "v").collect()[0]
    # percentile(linear) over 1..100: p05 = 5.95, p95 = 95.05
    assert (r.p_lo, r.p_hi) == (5.95, 95.05)
    assert (r.n_below, r.n_above) == (5, 5)


def test_token_pmi_pairs_matches_python_model(spark):
    import math
    from collections import Counter
    from itertools import combinations

    docs = [
        (1, "x y z"),
        (2, "x y"),
        (3, "x z q"),
        (4, "y z"),
        (5, "x y w"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from windflow_spark.functions.pipeline import token_pmi_pairs

    got = {
        (r.tok_a, r.tok_b): (r.n_pair_docs, r.pmi)
        for r in token_pmi_pairs(df, min_pair_docs=2).collect()
    }
    n = len(docs)
    dfreq, pairs = Counter(), Counter()
    for _, text in docs:
        tk = sorted(set(text.split()))
        dfreq.update(tk)
        pairs.update(combinations(tk, 2))
    exp = {
        p: (c, round(math.log(float(c) * n / (dfreq[p[0]] * dfreq[p[1]])), 6))
        for p, c in pairs.items()
        if c >= 2
    }
    assert got == exp


def test_token_pmi_cap_bounds_pair_expansion(spark):
    # the deterministic cap keeps the quadratic expansion bounded: a doc
    # with 50 distinct tokens contributes pairs only from its sorted
    # 5-token prefix when capped at 5
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i:02d}" for i in range(50)))], "doc_id long, text string"
    )
    from windflow_spark.functions.pipeline import token_pmi_pairs

    out = token_pmi_pairs(df, max_tokens_per_doc=5, min_pair_docs=1).collect()
    assert len(out) == 10  # C(5,2)
    toks = {t for r in out for t in (r.tok_a, r.tok_b)}
    assert toks == {f"t{i:02d}" for i in range(5)}


def test_chi2_contingency_matches_python_model(spark):
    rows = [("x", "p")] * 30 + [("x", "q")] * 10 + [("y", "p")] * 10 + [("y", "q")] * 50
    df = spark.createDataFrame(rows, "a string, b string")
    from windflow_spark.functions.pipeline import chi2_contingency

    got = {
        (r.a, r.b): (r.n_obs, r.n_exp, r.chi2_contrib)
        for r in chi2_contingency(df, "a", "b").collect()
    }
    n = len(rows)
    from collections import Counter

    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    for (a, b), obs in cells.items():
        exp = (ra[a] * cb[b]) / n
        d = obs - exp
        assert got[(a, b)] == (obs, round(exp, 6), round(d * d / exp, 6))
    # association is strong: total chi² far above the df=1 critical value
    assert sum(v[2] for v in got.values()) > 3.84


def test_key_distribution_report_uniform_vs_skewed(spark):
    import math

    from windflow_spark.functions.pipeline import key_distribution_report

    uni = spark.createDataFrame([(i % 10,) for i in range(100)], "k long")
    r = key_distribution_report(uni, "k").collect()[0]
    assert (r.n_keys, r.n_total, r.max_cnt) == (10, 100, 10)
    assert r.top_share == 0.1
    assert r.norm_entropy == 1.0  # uniform: H = ln(n_keys)

    skew = spark.createDataFrame(
        [(0,)] * 91 + [(i,) for i in range(1, 10)], "k long"
    )
    s = key_distribution_report(skew, "k").collect()[0]
    assert (s.n_keys, s.max_cnt, s.top_share) == (10, 91, 0.91)
    h = math.log(100) - (91 * math.log(91)) / 100  # 9 singleton keys: ln(1)=0
    assert s.entropy == round(h, 6)
    assert s.norm_entropy < 0.25


def test_pq_codebook_memoized_and_codes_shape(spark, sf_dir):
    from windflow_spark.functions import similarity as S
    from windflow_spark.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    n = emb.count()
    S._PQ_CACHE.clear()
    cb1 = S.train_pq_codebooks(emb, cache_key="k1", m=4, n_centroids=8)
    assert len(S._PQ_CACHE) == 1
    rows1 = sorted((r["_sub"], r["_bkt"]) for r in cb1.collect())
    # a second call with the same key must NOT retrain (cache returns the
    # identical rows even for a different corpus frame)
    cb2 = S.train_pq_codebooks(
        emb.limit(10), cache_key="k1", m=4, n_centroids=8
    )
    assert sorted((r["_sub"], r["_bkt"]) for r in cb2.collect()) == rows1
    # every codebook entry is a sub_dim-length centroid; every subspace
    # has at most n_centroids lists
    for r in cb1.collect():
        assert len(r["_cv"]) == 16
        assert 0 <= r["_sub"] < 4 and 0 <= r["_bkt"] < 8
    # encode: every vector gets exactly m codes
    es = S._subvector_frame(emb, "vec_id", "embedding", 4, 16)
    codes = S._pq_assign(es, cb1, "vec_id")
    assert codes.count() == n * 4
    S._PQ_CACHE.clear()


def test_pq_adc_orders_like_exact_on_separable_data(spark):
    # two well-separated gaussian-ish blobs: PQ-ADC must rank a query's
    # own blob ahead of the other blob even at 4 subspaces x 2 centroids
    from pyspark.sql import Row

    from windflow_spark.functions import similarity as S

    def vec(center, i):
        return [center + ((i * 37 + d * 11) % 7) * 0.01 for d in range(16)]

    rows = [Row(vec_id=i, embedding=vec(0.0, i)) for i in range(0, 12)] + [
        Row(vec_id=i, embedding=vec(5.0, i)) for i in range(12, 24)
    ]
    emb = spark.createDataFrame(rows)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = S.pq_topk(
        emb, q, k=8, m=4, n_centroids=2, iters=2, dim=16, cache_key=None
    ).collect()
    assert len(top) == 8
    assert all(r["vec_id"] < 12 for r in top)  # all hits from the 0-blob
