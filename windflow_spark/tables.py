"""Parquet table loaders for the driver's star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.

At 100 TB these would be partitioned parquet/iceberg datasets; the loader
stays the same (``spark.read.parquet`` on a directory prunes partitions and
pushes filters down — see plans/explain.py helpers to verify).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables that should always broadcast in joins against facts.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


# (session id, sf_dir, table) -> DataFrame. DataFrames are immutable logical
# plans, so handing the same object to every query is safe — and skips the
# per-query footer read + file listing (76 queries × 10 tables of planning
# overhead in bench runs). Invalidate by restarting the session.
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    ck = (id(spark), sf_dir, name)
    if ck in _CACHE:
        return _CACHE[ck]
    df = _load_table_uncached(spark, name, sf_dir)
    _CACHE[ck] = df
    return df


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Coerce any TIMESTAMP_NTZ column to TIMESTAMP (LTZ), timezone-free.

    The testdata parquet stores naive ``timestamp[us]``; Spark 4 infers it as
    TIMESTAMP_NTZ (``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults to
    true), but the whole engine — window assignment via ``unix_micros``,
    interval joins, gap-fill — works on epoch-µs TIMESTAMP, matching the
    DuckDB oracle which treats naive values as UTC instants. The conversion
    below is session-timezone-independent: ``timestampdiff`` between two NTZ
    values is pure wall-clock arithmetic, and ``timestamp_micros`` builds the
    LTZ instant from the raw µs. (A plain ``cast`` would route through the
    session timezone and shift values off-UTC sessions.)
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            us = F.expr(
                "timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{field.name}`)"
            )
            df = df.withColumn(field.name, F.timestamp_micros(us))
    return df


def _load_table_uncached(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    # Read naive parquet timestamps as TIMESTAMP (epoch-µs instants), not
    # TIMESTAMP_NTZ — keeps filter pushdown on ts columns (no wrapping
    # expression) and matches the DuckDB oracle's naive-as-UTC reading.
    # SESSION-WIDE EFFECT, intentionally: the engine's whole time model is
    # epoch-µs TIMESTAMP, so any parquet read in a session that used this
    # loader should infer the same way (a per-read DataFrameReader option
    # does not exist for this conf). _normalize_timestamps below is the
    # belt-and-suspenders for reads that slip through with NTZ anyway.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        # Older generators emitted events.ts as parquet timestamp[ns], which
        # Spark rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as long
        # and convert to a µs timestamp (lossless: the generator emits
        # µs-aligned values, and DuckDB's reader truncates ns→µs identically).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000").cast("long"))
            )
        return _normalize_timestamps(df)
    return _normalize_timestamps(
        spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every star-schema table as a temp view so the full ANSI-SQL
    surface (spark.sql) works against the same data the DataFrame API uses
    — the oracle_sql() strings in the registry then run on Spark too, not
    just DuckDB. Views share load_table's cached logical plans."""
    for name in TABLE_NAMES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
