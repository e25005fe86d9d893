"""Streaming write side: the produce sink.

``foreachBatch`` + the engine's produce commit protocol: every micro-batch
is routed, offset-assigned continuing from the persisted LEO, appended,
and the metadata commit advances LEO + the round-robin cursor — so a
crashed query resumes from its checkpoint and re-produces only unacked
batches (at-least-once, matching the reference's delivery contract; the
reference additionally loses up to 5 s of *commits* on crash,
runtime/flush.rs:9-39, which we do not).

Single-writer-per-topic discipline holds by construction: one streaming
query owns the topic, and foreachBatch invocations are serial within a
query.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from flyq_spark.engine import FlyQEngine


def produce_sink(
    engine: FlyQEngine, topic: str, method: str = "xxhash64"
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callback appending each micro-batch to the topic."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.produce(topic, batch_df, method=method, collect_acks=False)

    return write


def write_stream_to_topic(
    engine: FlyQEngine,
    topic: str,
    stream: DataFrame,
    checkpoint_dir: str,
    method: str = "xxhash64",
    trigger_once: bool = False,
):
    """Start a streaming query that produces ``stream`` into ``topic``.
    Input needs the message shape (key/value/timestamp[/headers][/seq])."""
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(produce_sink(engine, topic, method))
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
