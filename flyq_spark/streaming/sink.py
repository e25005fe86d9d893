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


def upsert_sink(
    snapshot_path: str,
    key_cols: tuple[str, ...],
    ts_col: str,
    op_col: str = "op",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callback maintaining a latest-wins SNAPSHOT table
    from a CDC change stream — the streaming MERGE pattern (Delta's
    ``foreachBatch`` + MERGE INTO recipe, expressed with the batch
    ``apply_changes`` operator so batch and streaming share one merge
    semantics).

    Each micro-batch: read the current snapshot (empty on first batch),
    apply the batch's upserts/deletes (latest-wins, idempotent — safe
    under at-least-once redelivery), write to a tmp dir, swap. Each
    rename is atomic, but the swap is TWO renames (current→old,
    tmp→current), so there is a brief window where the snapshot path is
    absent — a concurrent reader can observe a missing directory (never
    a partial one) and should retry; a crash inside the window strands
    the snapshot under ``._old_<batch>``, which the next batch (or
    query restart) recovers before merging. Single-writer discipline
    holds by construction (foreachBatch invocations are serial within a
    query). The batch itself may carry several changes per key —
    apply_changes resolves them by (ts, change-beats-snapshot) in one
    window."""
    import glob
    import os
    import re
    import shutil

    from flyq_spark.operators.cdc import apply_changes

    def _recover() -> None:
        root = snapshot_path.rstrip("/")
        olds = sorted(
            glob.glob(root + "._old_*"),
            key=lambda p: int(re.search(r"_(\d+)$", p).group(1))
            if re.search(r"_(\d+)$", p)
            else -1,
        )
        if not os.path.isdir(root) and olds:
            # crash between the two renames: roll the newest old forward
            os.rename(olds[-1], root)
            olds = olds[:-1]
        for d in olds:
            shutil.rmtree(d, ignore_errors=True)
        for d in glob.glob(root + "._tmp_*"):
            shutil.rmtree(d, ignore_errors=True)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _recover()
        spark = batch_df.sparkSession
        data_cols = [c for c in batch_df.columns if c != op_col]
        if os.path.isdir(snapshot_path):
            snapshot = spark.read.parquet(snapshot_path).select(*data_cols)
        else:
            snapshot = spark.createDataFrame([], batch_df.drop(op_col).schema)
        merged = apply_changes(snapshot, batch_df, key_cols, ts_col, op_col)
        tmp = snapshot_path.rstrip("/") + f"._tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = snapshot_path.rstrip("/") + f"._old_{batch_id}"
        if os.path.isdir(snapshot_path):
            os.rename(snapshot_path, old)
        os.rename(tmp, snapshot_path)
        shutil.rmtree(old, ignore_errors=True)

    return write
