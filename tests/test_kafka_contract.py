"""Kafka builder contract tests — no broker in the sandbox, so the option
mapping and the (de)serializer roles are pinned directly (VERDICT r1 item 5):
the option dicts must mirror the reference builder surface
(wf/kafka/builders_kafka.hpp:185-365), and parse/serialize must round-trip
on a frame with Kafka's wire schema (key binary, value binary, timestamp)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F
from pyspark.sql.types import StructType, StructField, LongType, StringType

from windflow_spark.streaming.sources import kafka_source_options, parse_kafka_value
from windflow_spark.streaming.sinks import kafka_payload, kafka_sink_options


def test_kafka_source_option_mapping():
    # withBrokers / withTopics / withGroupID / withOffsets
    # (builders_kafka.hpp:185-268) → reader options
    opts = kafka_source_options(
        brokers=["b1:9092", "b2:9092"],
        topics=["t1", "t2"],
        group_id="wf-group",
        starting_offsets="earliest",
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "t1,t2",
        "startingOffsets": "earliest",
        "kafka.group.id": "wf-group",
    }


def test_kafka_source_offsets_dict_serializes_to_json():
    # withOffsets' per-topic offsets → the JSON startingOffsets form
    opts = kafka_source_options(
        "b:9092", "t", starting_offsets={"t": {"0": 23, "1": -2}}
    )
    assert json.loads(opts["startingOffsets"]) == {"t": {"0": 23, "1": -2}}
    assert "kafka.group.id" not in opts  # optional like withGroupID


def test_kafka_sink_option_mapping():
    opts = kafka_sink_options("b1:9092", "out-topic", "/tmp/ckpt")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092",
        "topic": "out-topic",
        "checkpointLocation": "/tmp/ckpt",
    }


def test_kafka_value_roundtrip_on_wire_schema(spark):
    """serializer → wire frame → deserializer recovers the rows (the
    reference's deser(serialize(t)) == t contract, kafka_source.hpp user
    deser + builders_kafka.hpp:302-303 serializer)."""
    rows = [(1, "alpha", 10.5), (2, "beta", -3.25)]
    df = spark.createDataFrame(rows, "id long, name string, score double")

    payload = kafka_payload(df, value_cols=["id", "name", "score"], key_col="id")
    assert payload.columns == ["key", "value"]

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    wire = payload.select(
        F.col("key").cast("binary"),
        F.col("value").cast("binary"),
        F.lit(ts).alias("timestamp"),
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", StringType()),
        ]
    )
    parsed = parse_kafka_value(wire, schema)
    assert parsed.columns == ["kafka_key", "id", "name", "score", "timestamp"]
    got = sorted((r.kafka_key, r.id, r.name, float(r.score)) for r in parsed.collect())
    assert got == [("1", 1, "alpha", 10.5), ("2", 2, "beta", -3.25)]
