"""Streaming sinks — WindFlow Sink / Kafka_Sink analogs (reference
wf/sink.hpp:199, wf/kafka/kafka_sink.hpp:229)."""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def run_available_now(writer) -> None:
    """Start with availableNow (process all available input, then stop) and
    wait — the EOS-flush execution mode (reference flushes all operators at
    end-of-stream, wf/window_replica.hpp:356-400)."""
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


def to_memory_sink(
    df: DataFrame, name: str | None = None, output_mode: str = "append"
) -> tuple[str, "StreamingQuery"]:
    """Collect to an in-memory table (tests / debugging only — bounded)."""
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name, q


def to_parquet_sink(df: DataFrame, path: str, checkpoint: str, output_mode: str = "append"):
    """Durable file sink with checkpointing — the production default."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )


def to_foreach_batch(df: DataFrame, fn: Callable, checkpoint: str, output_mode: str = "update"):
    """foreachBatch — the general Sink functor analog: fn(batch_df, batch_id)
    runs the user logic per micro-batch (multiplexing, upserts, side
    outputs)."""
    return (
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )


def kafka_sink_options(
    brokers: str | list[str], topic: str, checkpoint: str
) -> dict[str, str]:
    """Writer-option mapping of the reference Kafka_Sink builder
    (wf/kafka/builders_kafka.hpp:345-365 withBrokers; the serializer's
    returned topic → the 'topic' option). Pure function — contract-testable
    without a broker; kafka_sink applies it verbatim."""
    join = lambda v: ",".join(v) if isinstance(v, (list, tuple)) else v
    return {
        "kafka.bootstrap.servers": join(brokers),
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def kafka_payload(
    df: DataFrame,
    value_cols: list[str] | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """The 'serializer' role (reference builders_kafka.hpp:302-303 — the
    user serializer returns the payload string): to_json of the selected
    columns as `value`, optionally a record `key`. Works on batch or
    streaming frames, so the serialization contract is testable without a
    broker."""
    value = (
        F.to_json(F.struct(*[F.col(c) for c in value_cols]))
        if value_cols
        else F.to_json(F.struct("*"))
    )
    cols = [value.alias("value")]
    if key_col:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def kafka_sink(
    df: DataFrame,
    brokers: str | list[str],
    topic: str,
    checkpoint: str,
    value_cols: list[str] | None = None,
    key_col: str | None = None,
):
    """Kafka_Sink analog: serializer = to_json of the selected columns
    (reference wf/kafka/builders_kafka.hpp:302-303 — user serializer returns
    topic+payload)."""
    return (
        kafka_payload(df, value_cols, key_col)
        .writeStream.format("kafka")
        .options(**kafka_sink_options(brokers, topic, checkpoint))
    )


def on_query_terminated(spark, fn: Callable[[str], None]):
    """Closing-function lifecycle hook (reference `void(RuntimeContext&)`
    closing funcs run per replica at operator teardown,
    wf/basic_operator.hpp:179-195): ``fn(query_id)`` fires when any
    streaming query of this session terminates. Returns the listener so the
    caller can removeListener when done."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Closing(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            fn(str(event.id))

    listener = _Closing()
    spark.streams.addListener(listener)
    return listener
