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


def sample_token_budget(
    df: DataFrame,
    budget: int,
    strata_cols: Sequence[str] = ("lang",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget sampling: per stratum, take documents in deterministic
    md5(id) order while the running token total stays within ``budget`` —
    the standard way a training mix pins "N tokens of lang X" rather than
    "N documents of lang X". Content-addressed ordering makes the selection
    stable under re-sharding and engine changes (like stratified_sample_hash).

    One window pass (cumulative sum over the hash order) per stratum. At
    100 TB a heavy stratum's sort is bounded the same way as stratified
    sampling: since selection is a hash-order prefix, pre-filter to a hash
    range slightly above budget/avg_tokens docs before ranking, then window
    only the survivors. Output: (strata..., id, n_tokens, cum_tokens).
    """
    from pyspark.sql import Window as W

    keys = list(strata_cols)
    w = (
        W.partitionBy(*keys)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    d = df.select(
        *keys, id_col, F.size(tokens(text_col)).cast("long").alias("n_tokens")
    )
    return d.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
        F.col("cum_tokens") <= budget
    )


def balanced_source_mix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Balanced source mixing: downsample every source to (approximately)
    the smallest source's row count via a deterministic content-hash
    threshold — the degenerate "equal weights" case of training-mix
    construction. A row survives iff ``h * n_s < min_cnt * 1_000_000`` with
    h = md5(id) mod 1e6: pure BIGINT arithmetic, so Spark and any oracle
    engine select the exact same rows (no float rates, no seeded RAND()).

    Scale shape: one count aggregation (vocab-of-sources-sized), the
    min is a window over that aggregated frame (bounded by the number of
    distinct sources — fine even at 100 TB where sources number in the
    thousands), then a broadcast join of per-source thresholds back onto
    the fact scan; the survivor filter is a scan-side predicate. Output:
    (source, n_total, n_sampled).
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_total"))
    counts = counts.withColumn(
        "min_cnt", F.min("n_total").over(W.partitionBy())
    )
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % F.lit(1_000_000)
    return (
        df.select(source_col, id_col)
        .join(F.broadcast(counts), source_col)
        .withColumn(
            "_keep", h * F.col("n_total") < F.col("min_cnt") * F.lit(1_000_000)
        )
        .groupBy(source_col)
        .agg(
            F.max("n_total").cast("long").alias("n_total"),
            F.sum(F.col("_keep").cast("long")).cast("long").alias("n_sampled"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """TF-IDF top terms per document: tf from one explode+count, document
    frequency from a second (vocab-sized) aggregation, idf = ln((N+1)/(df+1))
    (smoothed), score = round(tf·idf, 6), top-``top_k`` per doc by
    (score desc, term).

    Scale shape: ONE corpus scan; every later stage works on the (doc,
    term) pair frame, which is far smaller than the token stream. Three
    pair-sized keyed exchanges: the tf aggregation, the document-frequency
    count as a window over term, and the per-doc rank window. (The naive
    alternative — a separate vocab-sized idf table broadcast back onto tf —
    re-runs the corpus scan + tf shuffle for the broadcast side and stalls
    on its barrier; measured 1.6× slower end-to-end at sf0.1.) The document count N
    rides as a ONE-ROW broadcast onto the pair frame (Catalyst folds the
    literal key into a 1×pairs BroadcastNestedLoopJoin — O(pairs), the
    scalar-attach plan; documented in tests/test_plans.py's allowlist).
    Output: (id, term, tfidf, rk).
    """
    from pyspark.sql import Window as W

    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    nd = df.agg(F.count(F.lit(1)).cast("long").alias("nd")).withColumn(
        "_k", F.lit(1)
    )
    scored = (
        tf.withColumn(
            "dft", F.count(F.lit(1)).over(W.partitionBy("term")).cast("long")
        )
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(nd), "_k")
        .drop("_k")
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    (F.col("nd") + F.lit(1)).cast("double")
                    / (F.col("dft") + F.lit(1))
                ),
                6,
            ),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_k)
        .select(id_col, "term", "tfidf", "rk")
    )


def misra_gries_summary(
    df: DataFrame, col: str = "token", capacity: int = 32
) -> DataFrame:
    """Distributed Misra–Gries frequent-items sketch: each partition builds
    a ``capacity``-counter summary (mapInPandas, one dict per partition,
    pruned by the mergeable-summaries rule: on overflow subtract the
    (capacity+1)-th largest count and drop non-positive counters), then the
    per-partition summaries are merged by a plain sum.

    Guarantees (Misra–Gries / Agarwal et al., "Mergeable Summaries"):
    for EVERY item, true_count − N/(capacity+1) ≤ est ≤ true_count, and any
    item with true_count > N/capacity is present in the merged summary
    (if Σ_p cnt_p > Σ_p N_p/capacity then some partition kept it). The
    merged frame is ≤ capacity × partitions rows — constant-size state per
    partition regardless of data volume, the 100 TB path for "top sources /
    top hosts / heavy tokens" where exact counting would shuffle the full
    key set. Output: (col, est) — est is partition-layout-dependent inside
    the bound; downstream checks must assert bounds, not exact values.
    """
    from collections import Counter

    def mg(pdfs):
        acc: Counter = Counter()
        for pdf in pdfs:
            acc.update(pdf[col].value_counts().to_dict())
            if len(acc) > capacity:
                cuts = sorted(acc.values(), reverse=True)
                sub = cuts[capacity]
                acc = Counter(
                    {k: v - sub for k, v in acc.items() if v - sub > 0}
                )
        yield pd.DataFrame({col: list(acc.keys()), "est": list(acc.values())})

    summaries = df.select(col).mapInPandas(mg, f"{col} string, est long")
    return summaries.groupBy(col).agg(F.sum("est").cast("long").alias("est"))


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


def bigram_lm_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 90,
    max_broadcast_vocab: int = 2_000_000,
) -> DataFrame:
    """Perplexity-style quality scoring (the CCNet/KenLM filter signal):
    an add-one-smoothed bigram language model is "trained" on the
    content-hash train split and every EVAL document is scored by the
    average negative log-likelihood of its bigrams,
    nll(w1,w2) = −ln((c(w1,w2)+1) / (c(w1)+V)), V = distinct train
    unigrams. High avg_nll = improbable text under the corpus model — the
    standard "remove gibberish / keep natural text" filter.

    Scale shape: bigrams are extracted JVM-side (slice + arrays_zip — no
    window, no Python). The train bigram table shuffles once on (w1,w2)
    and equi-joins the eval bigram stream on the same key. The unigram
    table is vocab-sized: V is counted ONCE up front (an eager job at
    build time) and that exact count both (a) gates the broadcast hint —
    a web-scale raw-token vocab above ``max_broadcast_vocab`` rows falls
    back to a plain shuffle join instead of an oversized broadcast — and
    (b) rides into the smoothing denominator as a plain literal, so no
    one-row scalar-attach join is needed. Unseen bigrams/unigrams fall
    back to the smoothed floor via left joins, exactly the add-one
    contract. Output: (id, n_bigrams, avg_nll 6dp) for eval docs with ≥2
    tokens.
    """
    from windflow_spark.functions.text import hash_split

    d = hash_split(df, content_col=text_col, train_pct=train_pct).select(
        F.col(id_col), F.col("split"), tokens(text_col).alias("_toks")
    )
    n = F.size("_toks")
    pairs = F.arrays_zip(
        F.slice("_toks", 1, n - 1).alias("w1"), F.slice("_toks", 2, n - 1).alias("w2")
    )
    bigrams = (
        d.filter(n >= 2)
        .select(id_col, "split", F.explode(pairs).alias("_p"))
        .select(id_col, "split", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    unigrams = d.select(id_col, "split", F.explode("_toks").alias("w1"))
    tr_b = (
        bigrams.filter(F.col("split") == "train")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    tr_u = (
        unigrams.filter(F.col("split") == "train")
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("long").alias("cu"))
    )
    v_count = tr_u.count()  # = |distinct train unigrams| = V, exact
    u_side = F.broadcast(tr_u) if v_count <= max_broadcast_vocab else tr_u
    ev = bigrams.filter(F.col("split") == "eval").select(id_col, "w1", "w2")
    scored = (
        ev.join(tr_b, ["w1", "w2"], "left")
        .join(u_side, "w1", "left")
        .withColumn(
            "_nll",
            -F.log(
                (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(v_count))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("_nll"), 6).alias("avg_nll"),
    )


def _sql_str(name: str) -> str:
    """Render ``name`` as a SQL single-quoted string literal, escaping
    embedded quotes — rule/column names are interpolated into ``stack()``
    expression strings and must not break parsing or inject SQL."""
    return "'" + name.replace("'", "''") + "'"


def data_quality_report(
    df: DataFrame,
    violation_rules: dict[str, Column],
    unique_cols: Sequence[str] = (),
) -> DataFrame:
    """Deequ-style data-quality report: evaluate every rule in ONE
    aggregation pass over the table (conditional sums — map-side combined,
    one exchange regardless of rule count) plus a distinct-count per
    uniqueness column, then unpivot to one row per rule. This is the
    validation gate a 100 TB ingest runs before publishing a snapshot.

    ``violation_rules`` maps rule name → boolean Column that is True for a
    VIOLATING row (NULL predicates count as non-violations, both here and
    in SQL CASE semantics). ``unique_cols`` adds ``duplicate_<col>`` rules
    counting non-distinct non-null values. Output: (rule, n_violations,
    n_rows).
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    names = list(violation_rules)
    for i, name in enumerate(names):
        aggs.append(
            F.sum(
                F.when(violation_rules[name], F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias(f"_v{i}")
        )
    for j, c in enumerate(unique_cols):
        aggs.append(
            (F.count(F.col(c)) - F.count_distinct(F.col(c)))
            .cast("long")
            .alias(f"_u{j}")
        )
    a = df.agg(*aggs)
    stack_args = []
    for i, name in enumerate(names):
        stack_args += [_sql_str(name), f"_v{i}"]
    for j, c in enumerate(unique_cols):
        stack_args += [_sql_str(f"duplicate_{c}"), f"_u{j}"]
    k = len(names) + len(unique_cols)
    return a.select(
        F.expr(f"stack({k}, {', '.join(stack_args)}) as (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    )


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Schema/volume profile: per column, null count, exact distinct
    count, and min/max (string-rendered for a uniform report schema) in a
    SINGLE aggregation (the multi-distinct agg plans one Expand pass —
    rows × columns, the standard profile cost; swap count_distinct for
    approx_count_distinct at 100 TB when exact cardinalities are not
    required). The ingest-time sibling of data_quality_report: profiling
    discovers the thresholds, the DQ gate then enforces them.
    Output: (column, n_nulls, n_distinct, min_value, max_value).
    """
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"_n{i}"),
            F.count_distinct(col).cast("long").alias(f"_d{i}"),
            F.min(col).cast("string").alias(f"_mn{i}"),
            F.max(col).cast("string").alias(f"_mx{i}"),
        ]
    a = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args += [_sql_str(c), f"_n{i}", f"_d{i}", f"_mn{i}", f"_mx{i}"]
    return a.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) as "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def token_kl_by_group(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-distribution divergence from the corpus: for each
    group g (e.g. a crawl source/domain), KL(P_g ‖ P_corpus) =
    Σ_t p_g(t)·ln(p_g(t)/p(t)) over the group's tokens — the CCNet-style
    domain-quality signal ("which sources look least like the corpus")
    used to triage sources before heavier per-document filtering.

    Scale shape: ONE tokenize pass aggregates (group, token) counts — the
    only corpus-sized shuffle. Token totals and group totals are WINDOW
    sums over that already-reduced |groups|×|vocab| frame (no join back,
    no second corpus scan); the corpus total is the one scalar that needs
    its own aggregation branch, and that branch is the IDENTICAL (grp,
    tok) agg subtree, so Spark's ReuseExchange serves it from the main
    shuffle — the executed plan scans the corpus once (pinned by test).
    The final group aggregation reuses the grp window's partitioning.
    Every term has p_g(t) > 0 and p(t) ≥ p_g(t)·share > 0, so the log is
    always defined — no smoothing needed.

    Output: (group, n_tokens, kl 6dp), n_tokens = the group's token count.
    """
    from pyspark.sql import Window as W

    tok = df.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("tok")
    )
    gt = tok.groupBy("grp", "tok").agg(F.count(F.lit(1)).cast("long").alias("cgt"))
    tot = gt.agg(F.sum("cgt").alias("n"))
    enriched = (
        gt.withColumn("ct", F.sum("cgt").over(W.partitionBy("tok")))
        .withColumn("gn", F.sum("cgt").over(W.partitionBy("grp")))
        .join(F.broadcast(tot))
    )
    pg = F.col("cgt") / F.col("gn")
    pc = F.col("ct") / F.col("n")
    return enriched.groupBy(F.col("grp").alias(group_col)).agg(
        F.sum("cgt").cast("long").alias("n_tokens"),
        F.round(F.sum(pg * F.log(pg / pc)), 6).alias("kl"),
    )


def winsorize_summary(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lower_p: float = 0.05,
    upper_p: float = 0.95,
) -> DataFrame:
    """Winsorization report: per group, the exact [p_lo, p_hi] percentile
    bounds (linear interpolation — Spark ``percentile`` and DuckDB
    ``quantile_cont`` compute the identical value, verified bit-exact),
    how many values each tail clamps, and the winsorized mean — the
    outlier-robust normalization step before feeding a metric into
    training or monitoring.

    Two aggregations over the same grouping (bounds, then clamp stats) —
    the second reuses the first's hash partitioning; bounds ride back via
    a broadcast join (|groups| rows). Exact percentile holds a per-group
    sorted buffer, the right tool up to very large groups; at 100 TB swap
    ``percentile_approx`` in for the bounds pass (the clamp pass is
    unchanged) and accept sketch error on the cut points.

    Output: group_cols + (p_lo, p_hi, n_below, n_above, mean_winsorized).
    """
    keys = list(group_cols)
    v = F.col(value_col)
    bounds = df.groupBy(*keys).agg(
        F.percentile(v, F.lit(lower_p)).alias("p_lo"),
        F.percentile(v, F.lit(upper_p)).alias("p_hi"),
    )
    joined = df.join(F.broadcast(bounds), keys) if keys else df.crossJoin(
        F.broadcast(bounds)
    )
    clamped = F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi"))
    return joined.groupBy(*keys).agg(
        F.min("p_lo").alias("p_lo"),
        F.min("p_hi").alias("p_hi"),
        F.sum(F.when(v < F.col("p_lo"), 1).otherwise(0)).cast("long").alias("n_below"),
        F.sum(F.when(v > F.col("p_hi"), 1).otherwise(0)).cast("long").alias("n_above"),
        F.round(F.avg(clamped), 6).alias("mean_winsorized"),
    )


def token_pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens_per_doc: int = 30,
    min_pair_docs: int = 5,
) -> DataFrame:
    """Collocation mining: document-level pointwise mutual information of
    token pairs, PMI(a,b) = ln(c_ab·N / (df_a·df_b)) over doc frequencies
    — the classic "which terms travel together" corpus-analytics signal
    (phrase detection, topic seeds).

    Scale shape: per document the DISTINCT token set is sorted and CAPPED
    at ``max_tokens_per_doc`` (deterministic prefix — the cap is what
    bounds the quadratic pair expansion, same discipline as the LSH
    bucket caps), pairs are expanded JVM-side from the capped array
    (≤ K²/2 rows per doc, no self-join of the exploded token table), and
    everything downstream is two counts joined on reduced frames. Doc
    frequencies are counted over the SAME capped sets, so numerator and
    denominators share one universe.

    Output: (tok_a, tok_b, n_pair_docs, pmi 6dp) for pairs in
    ≥ ``min_pair_docs`` documents.
    """
    toks = F.slice(
        F.array_sort(F.array_distinct(tokens(text_col))), 1, max_tokens_per_doc
    )
    d = df.select(F.col(id_col), toks.alias("_tk")).filter(F.size("_tk") >= 1)
    n_docs = d.count()  # scalar N — one count job, inlined as a literal
    pairs_expr = F.flatten(
        F.transform(
            "_tk",
            lambda x, i: F.transform(
                F.slice("_tk", i + 2, F.greatest(F.size("_tk") - (i + 1), F.lit(0))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pair_docs = (
        d.select(F.explode(pairs_expr).alias("_p"))
        .groupBy(F.col("_p.a").alias("tok_a"), F.col("_p.b").alias("tok_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair_docs"))
        .filter(F.col("n_pair_docs") >= min_pair_docs)
    )
    dfreq = (
        d.select(F.explode("_tk").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    return (
        pair_docs.join(dfreq.withColumnRenamed("tok", "tok_a"), "tok_a")
        .withColumnRenamed("df", "df_a")
        .join(dfreq.withColumnRenamed("tok", "tok_b"), "tok_b")
        .withColumnRenamed("df", "df_b")
        .select(
            "tok_a",
            "tok_b",
            "n_pair_docs",
            F.round(
                F.log(
                    F.col("n_pair_docs").cast("double")
                    * F.lit(float(n_docs))
                    / (F.col("df_a") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def chi2_contingency(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Chi-squared contingency table of two categorical columns: observed
    vs expected cell counts and each cell's chi² contribution — the
    independence screen behind feature selection and drift detection
    (are the two dimensions associated, and WHICH cells drive it).

    Scale shape: ONE keyed exchange builds the (a, b) cell counts; row
    totals, column totals, and the grand total are window sums over that
    reduced |A|×|B| frame (the source_token_kl reshape — no joins back to
    re-derived aggregates, the tiny frame is re-windowed in place).
    Expected counts come from exact BIGINT products divided once in
    double, so cells value-match cross-engine; only the 6dp rounding
    touches float formatting.

    Output: (col_a, col_b, n_obs, n_exp 6dp, chi2_contrib 6dp).
    """
    from pyspark.sql import Window as W

    cell = df.groupBy(col_a, col_b).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    row_tot = F.sum("n_obs").over(W.partitionBy(col_a))
    col_tot = F.sum("n_obs").over(W.partitionBy(col_b))
    n = F.sum("n_obs").over(W.partitionBy())
    withe = cell.withColumn(
        "_exp", (row_tot * col_tot).cast("double") / n
    )
    d = F.col("n_obs") - F.col("_exp")
    return withe.select(
        col_a,
        col_b,
        "n_obs",
        F.round("_exp", 6).alias("n_exp"),
        F.round(d * d / F.col("_exp"), 6).alias("chi2_contrib"),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups of ``value_col``
    — the A/B experiment readout (does the treatment move the metric, with
    how many effective degrees of freedom). Complements chi2_contingency:
    chi² screens categorical association, Welch compares continuous means
    without assuming equal variances or equal group sizes.

    Scale shape: ONE aggregation pass computes count/mean/sample-variance
    per group (Spark's partial-merge aggregates — map-side combine, one
    keyed exchange over exactly two groups), then the two rows collapse to
    one via conditional aggregation; the t statistic and the
    Welch–Satterthwaite df are closed-form column arithmetic on that
    single row. Nothing driver-side, nothing quadratic.

    Output: ONE row (n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat,
    df_welch), floats 6dp.
    """
    g = F.col(group_col)
    s = df.filter(g.isin([group_a, group_b])).groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.avg(value_col).alias("_m"),
        F.var_samp(value_col).alias("_v"),
    )
    pick = lambda c, grp: F.max(F.when(g == F.lit(grp), F.col(c)))  # noqa: E731
    one = s.agg(
        pick("_n", group_a).alias("n_a"),
        pick("_n", group_b).alias("n_b"),
        pick("_m", group_a).alias("_ma"),
        pick("_m", group_b).alias("_mb"),
        pick("_v", group_a).alias("_va"),
        pick("_v", group_b).alias("_vb"),
    )
    sea = F.col("_va") / F.col("n_a")
    seb = F.col("_vb") / F.col("n_b")
    se2 = sea + seb
    t = (F.col("_ma") - F.col("_mb")) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        sea * sea / (F.col("n_a") - 1) + seb * seb / (F.col("n_b") - 1)
    )
    return one.select(
        "n_a",
        "n_b",
        F.round("_ma", 6).alias("mean_a"),
        F.round("_mb", 6).alias("mean_b"),
        F.round("_va", 6).alias("var_a"),
        F.round("_vb", 6).alias("var_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dfw, 6).alias("df_welch"),
    )


def key_distribution_report(df: DataFrame, key_col: str) -> DataFrame:
    """Partition-skew diagnostic for a prospective shuffle/join key: key
    cardinality, total rows, the hottest key's share, and the Shannon
    entropy of the key distribution (plus entropy normalized by ln of the
    cardinality — 1.0 means uniform, → 0 means one key dominates). This
    is the measurement that decides whether a 100 TB join on ``key_col``
    needs salting (operators/skew.py) or AQE skew splitting BEFORE the
    job runs, not after it straggles.

    Scale shape: one keyed exchange for the per-key counts, then a single
    global aggregation using the identity
    ``H = ln(N) - (1/N) * sum(c*ln(c))`` — no second pass to attach N to
    every key. Output is ONE row: (n_keys, n_total, max_cnt, top_share,
    entropy, norm_entropy), floats 6dp.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    a = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_c").cast("long").alias("n_total"),
        F.max("_c").cast("long").alias("max_cnt"),
        F.sum(F.col("_c").cast("double") * F.log(F.col("_c"))).alias("_s"),
    )
    h = F.log(F.col("n_total")) - F.col("_s") / F.col("n_total")
    return a.select(
        "n_keys",
        "n_total",
        "max_cnt",
        F.round(F.col("max_cnt").cast("double") / F.col("n_total"), 6).alias(
            "top_share"
        ),
        F.round(h, 6).alias("entropy"),
        F.round(h / F.log(F.col("n_keys").cast("double")), 6).alias(
            "norm_entropy"
        ),
    )


def bm25_top_docs(
    docs: DataFrame,
    n_query_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval scoring (Robertson/Sparck Jones, the Lucene
    ``ln(1 + (N-df+0.5)/(df+0.5))`` idf form): score every document
    against a deterministic query — the corpus's ``n_query_terms``
    highest-document-frequency tokens — and return the ``top_n`` docs.

    Cross-engine float discipline: tf/df/dl are BIGINTs; per-term
    contributions are folded in TOKEN ORDER via ``aggregate(array_sort(
    collect_list(...)))`` (DuckDB mirrors with an ORDER BY inside sum),
    so the <=n_query_terms-term sum is one fixed double sequence on both
    engines regardless of partitioning; avgdl is attached from a one-row
    broadcast (the tfidf_top_terms scalar-attach shape).

    Scale: one tokenize scan feeds tf; dl rides a doc-keyed window on the
    SAME exchange; df is a vocab-sized agg; the query-term frame is
    TakeOrdered(n) and broadcast — the corpus never shuffles on anything
    but doc_id/token. N is the parquet row count (metadata-cheap eager
    scan, inlined as a literal like lm_perplexity's vocab size).
    """
    from pyspark.sql import Window as W

    n_docs = docs.count()
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    tf = tok.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    tfd = tf.withColumn(
        "dl", F.sum("tf").over(W.partitionBy(id_col)).cast("long")
    )
    df_t = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    q = df_t.orderBy(F.col("df").desc(), "tok").limit(n_query_terms)
    stats = tf.agg(F.sum("tf").cast("long").alias("tot"))
    scored = (
        tfd.join(F.broadcast(q), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            "tok",
            (
                F.log(
                    F.lit(1.0)
                    + (
                        F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)
                    )
                    / (F.col("df") + F.lit(0.5))
                )
                * (
                    F.col("tf") * F.lit(k1 + 1.0)
                    / (
                        F.col("tf")
                        + F.lit(k1)
                        * (
                            F.lit(1.0 - b)
                            + F.lit(b)
                            * F.col("dl")
                            / (F.col("tot") / F.lit(float(n_docs)))
                        )
                    )
                )
            ).alias("contrib"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("tok", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score_raw")
    )
    return (
        agg.orderBy(F.col("score_raw").desc(), id_col)
        .limit(top_n)
        .select(
            id_col,
            F.round("score_raw", 6).alias("bm25"),
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(W.orderBy(F.col("bm25").desc(), id_col))
            .cast("long"),
        )
    )


def cms_token_estimates(
    docs: DataFrame,
    depth: int = 3,
    width: int = 1024,
    top_n: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Count-Min Sketch over the corpus token stream, reported as the CMS
    estimate vs the true count for the top-N tokens — the second classic
    mergeable heavy-hitter summary next to Misra-Gries
    (misra_gries_summary), trading MG's deterministic support bound for
    CMS's point-query estimates with one-sided error (est >= true,
    always; the overestimate column is the audit).

    Scale shape: token counts reduce with one keyed exchange (map-side
    partial agg); the sketch itself is built from the REDUCED (token,
    cnt) frame — depth x width integer counters (a few thousand rows), a
    second tiny keyed sum whose result is independent of partitioning
    because counter updates are commutative integer adds. Candidate
    estimates probe the sketch via a broadcast-joinable (row, idx) key.
    The md5-derived row hashes make the sketch bit-identical on any
    engine, so the oracle recomputes the full sketch exactly in SQL.
    """
    tok_counts = (
        docs.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )

    def _idx(row: int, tok_col) -> Column:
        h = F.md5(F.concat(F.lit(str(row)), F.lit("|"), tok_col))
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast(
            "long"
        )

    rows = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"), _idx(r, F.col("tok")).alias("idx")
            )
            for r in range(depth)
        ]
    )
    sketch = (
        tok_counts.select(F.explode(rows).alias("_h"), "cnt")
        .groupBy(F.col("_h.r").alias("r"), F.col("_h.idx").alias("idx"))
        .agg(F.sum("cnt").alias("counter"))
    )
    cand = tok_counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(top_n)
    probes = cand.select("tok", "cnt", F.explode(rows).alias("_h")).select(
        "tok", "cnt", F.col("_h.r").alias("r"), F.col("_h.idx").alias("idx")
    )
    est = (
        probes.join(F.broadcast(sketch), ["r", "idx"])
        .groupBy("tok")
        .agg(
            F.first("cnt").alias("true_cnt"),
            F.min("counter").cast("long").alias("cms_est"),
        )
    )
    return est.select(
        "tok",
        "true_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("true_cnt")).cast("long").alias("overestimate"),
    )
