"""Streaming sources — the WindFlow Source / Kafka_Source analogs
(reference wf/source.hpp:177, wf/kafka/kafka_source.hpp:355).

WindFlow sources are replicated user loops pushing tuples with explicit
timestamps/watermarks (wf/source_shipper.hpp). Spark-first mapping:
- generator loop → rate source (per-second tuple generation, scales with
  numPartitions = source parallelism)
- event-time push → the data's own timestamp column
- ingress-time push → current_timestamp() stamped at read
- Kafka deserializer → format("kafka") + from_json / UDF
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    num_partitions: int | None = None,
    ingress_time_col: str | None = None,
) -> DataFrame:
    """Synthetic generator source (WindFlow Source with a loop functor).
    ``numPartitions`` is the source parallelism (replica count analog)."""
    r = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second)
    if num_partitions:
        r = r.option("numPartitions", num_partitions)
    df = r.load()
    if ingress_time_col:
        df = df.withColumn(ingress_time_col, F.current_timestamp())
    return df


def file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-arrival source: each new file in ``path`` becomes input —
    the standard bridge from batch fixtures to streaming tests, and the
    production pattern for landing-zone ingestion at scale (listing is
    incremental; maxFilesPerTrigger bounds per-batch volume)."""
    r = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.load(path)


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    group_id: str | None = None,
    starting_offsets: str = "latest",
    value_schema=None,
) -> DataFrame:
    """Kafka_Source analog (reference wf/kafka/builders_kafka.hpp:191-269:
    withBrokers/withTopics/withGroupID/withOffsets). Requires the
    spark-sql-kafka package on the cluster; the builder itself is
    environment-independent.

    value_schema: optional StructType — if given, the value is parsed with
    from_json into top-level columns (the 'deserializer' role).
    """
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if group_id:
        r = r.option("kafka.group.id", group_id)
    df = r.load()
    if value_schema is not None:
        df = df.select(
            F.col("key").cast("string").alias("kafka_key"),
            F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
            "timestamp",
        ).select("kafka_key", "v.*", "timestamp")
    return df
