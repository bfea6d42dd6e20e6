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


def kafka_source_options(
    brokers: str | list[str],
    topics: str | list[str],
    group_id: str | None = None,
    starting_offsets: str | dict = "latest",
) -> dict[str, str]:
    """The reader-option mapping of the reference Kafka_Source builder
    (wf/kafka/builders_kafka.hpp:185-268): withBrokers → bootstrap.servers
    (comma-joined), withTopics → subscribe (comma-joined), withGroupID →
    kafka.group.id, withOffsets → startingOffsets (a per-topic/partition
    dict serializes to the JSON offset form). Pure function so the contract
    is testable without a broker; kafka_stream applies it verbatim."""
    import json

    join = lambda v: ",".join(v) if isinstance(v, (list, tuple)) else v
    opts = {
        "kafka.bootstrap.servers": join(brokers),
        "subscribe": join(topics),
        "startingOffsets": (
            json.dumps(starting_offsets)
            if isinstance(starting_offsets, dict)
            else starting_offsets
        ),
    }
    if group_id:
        opts["kafka.group.id"] = group_id
    return opts


def parse_kafka_value(df: DataFrame, value_schema, key_col: str = "kafka_key") -> DataFrame:
    """The 'deserializer' role (reference kafka_source.hpp user deser
    returning an optional tuple): parse the binary value as JSON into
    top-level columns, keep the record key (as string) and the broker
    timestamp. Works on any frame with Kafka's wire schema
    (key binary, value binary, timestamp) — streaming or batch."""
    return df.select(
        F.col("key").cast("string").alias(key_col),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        "timestamp",
    ).select(key_col, "v.*", "timestamp")


def kafka_stream(
    spark: SparkSession,
    brokers: str | list[str],
    topics: str | list[str],
    group_id: str | None = None,
    starting_offsets: str | dict = "latest",
    value_schema=None,
) -> DataFrame:
    """Kafka_Source analog (reference wf/kafka/builders_kafka.hpp:191-269:
    withBrokers/withTopics/withGroupID/withOffsets). Requires the
    spark-sql-kafka package on the cluster; the builder itself is
    environment-independent.

    value_schema: optional StructType — if given, the value is parsed with
    from_json into top-level columns (the 'deserializer' role).
    """
    df = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(brokers, topics, group_id, starting_offsets))
        .load()
    )
    if value_schema is not None:
        df = parse_kafka_value(df, value_schema)
    return df


def socket_stream(
    spark: SparkSession, host: str = "localhost", port: int = 9999
) -> DataFrame:
    """TCP line source — the push-based Source analog for ad-hoc feeds
    (the reference's generic Source functor pulls from any descriptor;
    Spark's socket source is its simplest live transport: one UTF-8 line
    per row in a `value` string column). NOT fault-tolerant (no replay —
    Spark documents it for testing/demos); production push feeds belong
    on Kafka (kafka_stream) or landing files (file_stream). Parse with
    from_json/split downstream, exactly like parse_kafka_value."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
