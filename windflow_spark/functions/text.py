"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All pure-column expressions (JVM-side, whole-stage codegen) — no Python UDFs
in any hot path; at 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text_col: Column | str, delim: str = " ") -> Column:
    """Whitespace tokens with empties removed (parity with DuckDB
    string_split + list_filter)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, delim), lambda x: x != F.lit(""))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append exact char count and whitespace token count."""
    return df.withColumn("n_chars_exact", F.length(text_col).cast("long")).withColumn(
        "n_tokens", F.size(tokens(text_col)).cast("long")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: mean word length, alpha ratio,
    stopword-ish ratio. Columns: q_mean_word_len, q_alpha_ratio, q_score."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    total_tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    n_chars = F.length(text_col)
    # raw IEEE divisions — unrounded per-row arithmetic is bit-identical
    # across engines (rounding a /2^k ratio is NOT: HALF_UP vs float-round)
    return (
        df.withColumn("q_mean_word_len", total_tok_chars / F.greatest(n_tok, F.lit(1)))
        .withColumn("q_alpha_ratio", alpha_chars / F.greatest(n_chars, F.lit(1)))
        .withColumn(
            "q_score",
            F.least(F.lit(1.0), n_tok / F.lit(100.0)) * F.col("q_alpha_ratio"),
        )
    )


def lang_id_heuristic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tiny n-gram/stopword language-ID heuristic → `lang_pred` column.

    Real pipelines plug a model here (Pandas UDF); the heuristic keeps the
    plumbing testable without external libs and stays JVM-side.
    """
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))

    def hits(words: list[str]) -> Column:
        out = F.lit(0)
        for w in words:
            out = out + F.when(t.contains(f" {w} "), 1).otherwise(0)
        return out

    scores = {
        "en": hits(["the", "and", "of", "to", "is"]),
        "es": hits(["el", "la", "de", "que", "y"]),
        "fr": hits(["le", "la", "et", "les", "des"]),
        "de": hits(["der", "die", "und", "das", "ist"]),
    }
    best = F.greatest(*scores.values())
    # first-match-wins priority on ties (en > es > fr > de) — mirrors the
    # CASE expression in the SQL oracle exactly
    pred = F.when(best == 0, "und")
    for code, s in scores.items():
        pred = pred.when(s == best, code)
    return df.withColumn("lang_pred", pred.otherwise("und"))

LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def lang_id_oracle_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB SQL mirroring lang_id_heuristic exactly (same stopwords, same
    tie priority)."""
    score = lambda ws: " + ".join(
        f"(strpos(tx, ' {w} ') > 0)::INT" for w in ws
    )
    s_cols = ",\n      ".join(
        f"({score(ws)}) AS s_{code}" for code, ws in LANG_STOPWORDS.items()
    )
    codes = list(LANG_STOPWORDS)
    best = f"greatest({', '.join('s_' + c for c in codes)})"
    cases = " ".join(f"WHEN s_{c} = {best} THEN '{c}'" for c in codes)
    return f"""
    WITH t AS (SELECT doc_id, ' ' || lower({text_col}) || ' ' AS tx FROM {table}),
    s AS (SELECT doc_id,
      {s_cols}
    FROM t)
    SELECT doc_id, CASE WHEN {best} = 0 THEN 'und' {cases} ELSE 'und' END AS lang_pred
    FROM s
    """


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """64-bit document fingerprint (xxhash64 of normalized text) — the
    rolling-hash shingle variant lives in functions/dedup.py."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn(out_col, F.xxhash64(norm))


def normalize_text(text_col: Column | str) -> Column:
    """Canonical text normalization for dedup/quality pipelines: lowercase,
    collapse all whitespace runs to single spaces, strip leading/trailing
    space, drop non-alphanumeric characters (keeping spaces). Pure column
    expressions — JVM-side, codegen-fused, SQL-mirrorable."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def hash_split(
    df: DataFrame,
    content_col: str = "text",
    train_pct: int = 90,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic content-hash train/eval split: bucket = first 32 bits
    of md5(content) mod 100. Content-addressed, so the assignment survives
    re-sharding, re-ordering, and engine changes (md5 is bit-portable,
    unlike engine-native hashes) — the standard way to split a 100 TB corpus
    without a global shuffle or a stored assignment table."""
    bucket = F.conv(F.substring(F.md5(F.col(content_col)), 1, 8), 16, 10).cast("long") % 100
    return df.withColumn(out_col, F.when(bucket < train_pct, "train").otherwise("eval"))


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 use duplicate
    line/paragraph and top-n-gram fractions to drop boilerplate/spam):

    - ``dup_token_frac``: 1 − distinct/total tokens — high for keyword-stuff
      and copy-paste spam.
    - ``top_bigram_frac``: occurrences of the most frequent bigram / total
      bigrams — high for templated/repeated phrasing.

    Scale shape: token stats are per-row expressions; the bigram mode runs
    distributed via the shingle_stream (doc, bigram) counts — max/sum per
    doc reuses the stream's doc partitioning, no per-doc arrays, no driver
    funnel. Raw IEEE divisions (unrounded) are bit-identical across
    engines. Docs with < 2 tokens get top_bigram_frac 0.0.

    Output: (id, dup_token_frac, top_bigram_frac).
    """
    from windflow_spark.functions.dedup import shingle_stream

    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_dist = F.size(F.array_distinct(toks))
    tok_stats = df.select(
        F.col(id_col),
        (
            F.lit(1.0)
            - n_dist.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
        ).alias("dup_token_frac"),
    )
    grams = (
        shingle_stream(df, id_col, text_col, 2)
        .groupBy(id_col, "_s")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            (F.max("_c").cast("double") / F.sum("_c").cast("double")).alias(
                "top_bigram_frac"
            )
        )
    )
    return tok_stats.join(grams, id_col, "left").select(
        id_col,
        "dup_token_frac",
        F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias("top_bigram_frac"),
    )


# PII patterns shared by engine and oracle: plain character classes only —
# identical semantics in Java regex (Spark) and RE2 (DuckDB).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9() -]{7,}[0-9]", "<PHONE>"),
    (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def redact_pii(text_col: Column | str) -> Column:
    """Mask emails, phone-number-shaped digit runs, and IPv4 literals with
    typed placeholders — the standard pre-training scrub pass. Pure
    chained regexp_replace: JVM-side, codegen-fused, order fixed (email
    before phone so the digits of a masked email never re-match)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat, rep in PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c
