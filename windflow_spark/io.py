"""Batch I/O across formats — parquet / ORC / CSV / JSON readers and
writers with format inference.

The reference's only I/O is user source/sink functors plus Kafka
(SURVEY.md §2.1/§2.2); file-format breadth is engine-side here, like every
relational engine. All formats go through the same DataFrameReader path,
so pushdown/pruning behavior is inspectable with plans/explain.py
(parquet/ORC push filters and prune columns; CSV/JSON read whole rows —
prefer columnar for anything large).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

_EXT_FMT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}

# Formats whose scans support predicate pushdown + column pruning; at scale
# anything hot should be one of these.
COLUMNAR_FORMATS = frozenset({"parquet", "orc"})


def infer_format(path: str) -> str:
    """Format from the file extension (directories of part-files keep their
    extension on the parts; pass fmt explicitly for extensionless dirs)."""
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _EXT_FMT:
        return _EXT_FMT[ext]
    raise ValueError(
        f"cannot infer format from {path!r}; pass fmt= one of "
        f"{sorted(set(_EXT_FMT.values()))}"
    )


def read_table_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Read a table in any supported format. CSV defaults to header=True;
    for CSV/JSON pass an explicit ``schema`` in production — inference
    scans the data once and types can drift between files."""
    fmt = fmt or infer_format(path)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).load(path)


def write_table_any(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    **options,
) -> None:
    """Write in any supported format; ``partition_by`` produces the
    hive-style directory layout whose partition pruning read_table_any
    benefits from on the way back in."""
    fmt = fmt or infer_format(path)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).save(path)


def read_text_lines(spark, path: str, whole_file: bool = False) -> DataFrame:
    """Raw text ingestion (built-in ``text`` source): one row per line —
    or per FILE with ``whole_file`` (wholetext), the usual entry point for
    a document corpus arriving as flat files. Returns (value string);
    join with ``input_file_name()`` downstream for provenance."""
    return spark.read.format("text").option("wholetext", whole_file).load(path)


def read_binary_files(spark, path: str, glob: str | None = None) -> DataFrame:
    """Opaque-binary ingestion (built-in ``binaryFile`` source) — the
    multimodal on-ramp: images/audio/video land as (path, modificationTime,
    length, content binary) rows that feed functions/multimodal.py's
    decode/feature mapInPandas stages. ``glob`` filters by pattern, e.g.
    ``*.png`` (pushed to the file index, not a post-filter).

    Scale: files are listed distributed and content is read lazily per
    task; pair with spark.sql.files.maxPartitionBytes to control how many
    small files pack into one task. Binary content itself is never parsed
    JVM-side — it crosses to Python as Arrow binary columns only where a
    decode stage needs it.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_json_robust(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """JSON ingestion that SURVIVES malformed lines — the production
    contract for web-scale corpora where some fraction of records is
    always broken. PERMISSIVE mode routes unparseable lines into
    ``corrupt_col`` instead of failing the job (or silently dropping,
    DROPMALFORMED's behavior); callers split the frame on
    ``corrupt_col IS NULL`` and quarantine the rest. An explicit schema is
    REQUIRED: corrupt-record capture only works when the schema (including
    the corrupt column) is known up front.
    """
    from pyspark.sql.types import StringType, StructType

    if not isinstance(schema, StructType):
        raise TypeError("read_json_robust requires an explicit StructType schema")
    if corrupt_col not in schema.fieldNames():
        # Copy before .add(): StructType.add mutates self, and silently
        # growing the CALLER's schema object is a surprise on reuse.
        schema = StructType(list(schema.fields)).add(corrupt_col, StringType())
    return (
        spark.read.format("json")
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .options(**options)
        .load(path)
    )


def write_sized(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    target_mb: int = 256,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    **options,
) -> int:
    """Write with output files sized near ``target_mb`` — the small-files
    guard. A 100 TB pipeline stage that ends 32k-partitions wide writes
    32k files per run; downstream listings and scans then pay per-file
    overhead forever. This derives a file count from the optimizer's
    sizeInBytes statistic (free — no extra job) and coalesces (narrow, no
    shuffle) down to it before writing. Returns the file count used.
    Estimates are approximate; for exact sizing use a two-pass write.
    Never widens: repartitioning UP would add a shuffle — if the frame is
    already narrower than the target this is a no-op.
    """
    nfiles = estimated_file_count(df, target_mb)
    cur = df.rdd.getNumPartitions()
    out = df.coalesce(nfiles) if nfiles < cur else df
    write_table_any(out, path, fmt=fmt, mode=mode, partition_by=partition_by, **options)
    return min(nfiles, cur)


def estimated_file_count(df: DataFrame, target_mb: int = 256) -> int:
    """File count for ``write_sized``: Catalyst's sizeInBytes estimate for
    the optimized plan divided by the target (≥1). Statistics come from the
    query plan (file sizes + filter selectivity guesses), not a data scan."""
    jdf = df._jdf
    size = int(
        jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    return max(1, size // (target_mb * 1024 * 1024))


def compact_files(
    spark,
    path: str,
    fmt: str | None = None,
    target_mb: int = 256,
) -> tuple[int, int]:
    """Compact an EXISTING small-files directory in place: read, rewrite
    at ``target_mb`` sizing (write_sized), swap. The maintenance sibling
    of write_sized — streaming sinks and wide final stages leave
    thousands of tiny files behind, and every later scan pays per-file
    open/footer overhead until someone runs exactly this.

    Returns (files_before, files_after). The swap is rename-based, NOT
    transactional — readers racing the swap can see a missing directory;
    at production scale run it under a table format's transaction (or a
    path-flip) instead. Local filesystems only (os.rename semantics).
    """
    import os
    import shutil

    data_files = [
        f
        for f in os.listdir(path)
        if not f.startswith("_") and not f.startswith(".")
    ]
    before = len(data_files)
    if fmt is None:
        # extensionless directory: sniff the part-files instead
        try:
            fmt = infer_format(path)
        except ValueError:
            fmt = infer_format(data_files[0]) if data_files else "parquet"
    tmp = path.rstrip("/") + "__compact_tmp"
    df = read_table_any(spark, path, fmt=fmt)
    write_sized(df, tmp, fmt=fmt, target_mb=target_mb)
    old = path.rstrip("/") + "__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after = len(
        [
            f
            for f in os.listdir(path)
            if not f.startswith("_") and not f.startswith(".")
        ]
    )
    return before, after


def read_parquet_evolving(spark, path: str) -> DataFrame:
    """Read a parquet directory whose files were written with EVOLVING
    schemas (columns added over time): ``mergeSchema`` unions all file
    footers into one schema, older files yield NULL for columns they
    predate. The ingestion contract for long-lived append directories —
    without it Spark samples ONE footer and silently drops late-added
    columns. Schema merging costs a footer pass over every file; at
    100 TB keep it off for stable-schema tables and on only where
    producers actually evolve."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def overwrite_partitions_dynamic(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    fmt: str = "parquet",
) -> None:
    """Backfill/replay write: overwrite ONLY the partitions present in
    ``df``, leaving every other partition untouched — Spark's DYNAMIC
    partitionOverwriteMode, scoped to this one write (session conf is
    saved and restored). This is how a 100 TB pipeline re-runs one bad
    day: recompute that day's frame, write it, and the other 3 649
    partitions are never listed, read, or rewritten. STATIC mode (the
    default) would instead drop EVERY partition under ``path`` first —
    the classic accidental-table-wipe; scoping the conf here makes the
    safe form the easy one."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_by)
            .format(fmt)
            .save(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed on ``bucket_cols``
    — the storage-side half of shuffle-free joins: two tables bucketed on
    the same key with the same bucket count join WITHOUT any Exchange
    (each task zips bucket i of both sides), and a groupBy on the bucket
    key skips its shuffle too. This is the 100-TB answer for a fact table
    that is re-joined on the same key every day: pay the shuffle ONCE at
    write time, never at read time. ``sort_cols`` additionally sorts
    within each bucket file so sort-merge joins can skip their sorts.
    The table lands under ``spark.sql.warehouse.dir``
    (``SPARK_GRAFT_WAREHOUSE``, /tmp by default — never the repo)."""
    w = df.write.mode("overwrite").format(fmt).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def publish_with_audit(
    df: DataFrame,
    path: str,
    checks: Sequence[tuple[str, "object"]],
    fmt: str = "parquet",
) -> dict:
    """Write-Audit-Publish: stage ``df``, run every audit rule against the
    STAGED files, and only then move them to ``path`` — the pattern that
    keeps a bad batch from ever being visible to readers (the missing
    half of `write_manifest_jsonl`'s commit protocol, applied to batch
    tables). ``checks`` are (name, boolean Column) rules evaluated in ONE
    aggregation pass over the staged data (every rule must hold for every
    row — the data_quality_report shape); any failure leaves the
    published path UNTOUCHED and the staging directory in place for
    inspection. Returns {"published": bool, "failed_rules": [...],
    "n_rows": int}.

    The final step is a filesystem rename — atomic on POSIX/HDFS; on
    object stores use the manifest-committed writer instead (rename is
    copy+delete there)."""
    import shutil

    from pyspark.sql import functions as F

    spark = df.sparkSession
    staging = path.rstrip("/") + "__staging"
    shutil.rmtree(staging, ignore_errors=True)
    df.write.mode("overwrite").format(fmt).save(staging)
    staged = spark.read.format(fmt).load(staging)
    agg = staged.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.min(F.when(col, True).otherwise(False)).alias(name)
            for name, col in checks
        ],
    ).collect()[0]
    failed = [name for name, _ in checks if not agg[name]]
    if failed:
        return {"published": False, "failed_rules": failed, "n_rows": agg["_n"]}
    shutil.rmtree(path, ignore_errors=True)
    os.replace(staging, path)
    return {"published": True, "failed_rules": [], "n_rows": agg["_n"]}
