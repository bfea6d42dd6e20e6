"""Training-data pipeline operators beyond dedup/similarity: chunking,
sequence packing, decontamination, vocabulary, stratified sampling, and
embedding normalization/quantization.

Reference parity: none of these exist in the reference (its §2.11 operator
surface is the classic streaming set); they are north-star extensions a
100 TB LLM-data pipeline needs. Everything is column expressions or one
bounded applyInPandas; every operator has a DuckDB value oracle in
queries.py.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from windflow_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Token-window chunking with overlap (chunk_tokens=50, stride=40 →
    10-token overlap): the standard long-document → training-sample step.

    Pure column expressions: tokenize once, explode the chunk starts
    (0, stride, 2·stride, …), slice the token array per chunk — no UDF, no
    shuffle, runs at scan speed; output size is Σ ceil(n_tok/stride) rows.
    Output: (id, chunk_id, chunk_text, n_chunk_tokens).
    """
    d = (
        df.select(F.col(id_col), tokens(text_col).alias("_t"))
        .withColumn("_n", F.size("_t"))
        .filter(F.col("_n") >= 1)
    )
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    return (
        d.select(id_col, "_t", "_n", F.posexplode(starts).alias("chunk_id", "_s"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice("_t", F.col("_s") + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_s"))
            .cast("long")
            .alias("n_chunk_tokens"),
        )
    )


def pack_sequences_greedy(
    df: DataFrame,
    shard_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    budget: int = 200,
) -> DataFrame:
    """Greedy sequence packing: walk each shard's docs in id order, filling
    packs up to ``budget`` tokens; a doc that does not fit starts a new pack
    (an oversized doc sits alone in its pack). The step is inherently
    sequential (running fill with reset), so it runs as one applyInPandas
    pass per shard — at 100 TB the shard column is the parallel unit and
    each task holds only (id, len) pairs, never the text. DuckDB oracle:
    the same recurrence as a recursive CTE.

    Output: (shard, id, pack_id).
    """
    out_schema = f"{shard_col} string, {id_col} long, pack_id long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        fill, pid = 0, 0
        ids = []
        for nt in pdf[len_col]:
            nt = int(nt)
            if ids and fill + nt > budget:
                pid += 1
                fill = nt
            else:
                fill += nt
            ids.append(pid)
        pdf = pdf[[shard_col, id_col]].copy()
        pdf["pack_id"] = ids
        return pdf

    return (
        df.select(shard_col, id_col, len_col)
        .groupBy(shard_col)
        .applyInPandas(pack, out_schema)
    )


def _md5_int60(c: Column) -> Column:
    """Portable 60-bit hash (first 15 md5 hex chars) — engine-reproducible."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def decontaminate_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_k: int = 8,
    train_pct: int = 90,
) -> DataFrame:
    """Train/eval decontamination: eval documents sharing any ``gram_k``-gram
    with ANY train document, with the count of shared grams. The split is the
    content-hash split (functions/text.py hash_split — md5-portable).

    Scale shape: grams are hashed to 60-bit ints (md5-portable) BEFORE the
    join, so the shuffle carries fixed-width ints, never gram strings; the
    train side is distinct-deduped grams. Output: (id, n_shared_grams).
    """
    from windflow_spark.functions.dedup import shingle_stream
    from windflow_spark.functions.text import hash_split

    # lead-window gram stream (see dedup.shingle_stream): docs with fewer
    # than gram_k tokens yield no grams, same as the old size() gate
    d = shingle_stream(
        hash_split(df, content_col=text_col, train_pct=train_pct),
        id_col,
        text_col,
        gram_k,
        carry=("split",),
    ).select(id_col, "split", _md5_int60(F.col("_s")).alias("gh"))
    train = d.filter(F.col("split") == "train").select("gh").distinct()
    ev = d.filter(F.col("split") == "eval").select(id_col, "gh")
    return (
        ev.join(train, "gh")
        .groupBy(id_col)
        .agg(F.count_distinct("gh").cast("long").alias("n_shared_grams"))
    )


def vocab_top_tokens(
    df: DataFrame, text_col: str = "text", top_n: int = 100
) -> DataFrame:
    """Corpus vocabulary: token frequencies, top-N by (count desc, token) —
    explode + count + rank; the count is map-side combined so the shuffle
    carries one partial per (partition, token). Output: (token, cnt, rk)."""
    from pyspark.sql import Window as W

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # top-N FIRST via distributed TakeOrdered (per-partition heads merged on
    # the driver-side reducer), THEN rank the surviving N rows — a global
    # row_number window over ALL token counts would funnel the whole
    # vocabulary through one partition at 100 TB
    top = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(top_n)
    w = W.orderBy(F.col("cnt").desc(), F.col("token"))
    return top.select(
        "token",
        F.col("cnt").cast("long").alias("cnt"),
        F.row_number().over(w).cast("long").alias("rk"),
    )


def stratified_sample_hash(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str = "doc_id",
    n_per_stratum: int = 10,
) -> DataFrame:
    """Deterministic stratified sampling: per stratum, the first
    ``n_per_stratum`` rows ordered by md5(id) — content-addressed like
    hash_split, so the sample is stable under re-sharding, re-ordering, and
    engine changes (a seeded RAND() is none of those). One window pass;
    at scale, heavy strata can pre-filter with an approximate hash range
    before ranking. Output: (strata..., id, rk)."""
    from pyspark.sql import Window as W

    keys = list(strata_cols)
    w = W.partitionBy(*keys).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(*keys, id_col)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= n_per_stratum)
    )


def embedding_norm_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """L2 norm + symmetric int8 quantization summary per vector: the
    normalize/quantize step of an embedding pipeline, as column expressions.
    Quantized value q_i = trunc(127 · v_i / ‖v‖) (explicit truncation —
    engines disagree on float→int CAST rounding, not on trunc). Output
    scalars (norm rounded 6dp, q_sum/q_min/q_max) keep the check
    value-hashable. The norm is the sequential left fold, bit-identical to
    an unrolled left-associated sum."""
    from windflow_spark.functions.similarity import as_double_array

    v = as_double_array(vec_col)
    d = df.select(F.col(id_col), v.alias("_v")).withColumn(
        "_norm",
        F.sqrt(
            F.aggregate(
                F.transform("_v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ),
    )
    q = F.transform("_v", lambda x: (F.lit(127.0) * x / F.col("_norm")).cast("int"))
    return d.select(
        id_col,
        F.round("_norm", 6).alias("l2_norm"),
        F.aggregate(q, F.lit(0), lambda a, x: a + x).cast("long").alias("q_sum"),
        F.array_min(q).cast("long").alias("q_min"),
        F.array_max(q).cast("long").alias("q_max"),
    )
