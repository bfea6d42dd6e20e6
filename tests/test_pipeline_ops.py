"""Training-pipeline operator edge cases (the oracle gate covers the happy
path at sf0.01; these pin the boundaries)."""

from __future__ import annotations

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
