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


def kafka_sink(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    value_cols: list[str] | None = None,
):
    """Kafka_Sink analog: serializer = to_json of the selected columns
    (reference wf/kafka/builders_kafka.hpp:302-303 — user serializer returns
    topic+payload)."""
    value = (
        F.to_json(F.struct(*[F.col(c) for c in value_cols]))
        if value_cols
        else F.to_json(F.struct("*"))
    )
    return (
        df.select(value.alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
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
