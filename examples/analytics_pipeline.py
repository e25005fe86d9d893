"""Operational analytics over the broker log — the streaming
materialized-view composition:

    topic tail → parse event payloads
               → aggregate_view_sink (per event-type mergeable state:
                 exact counts + value-cents sum/min/max + HLL distinct
                 users — delta partitions, marker-gated compaction)
    and, on demand:
    read_aggregate_view → read_view   (avgs + distinct estimates)
    resample_locf                     (dense gap-filled time series)

The view is maintained INCREMENTALLY — each micro-batch costs one
key-sized summarize, and the full event history is never rescanned
(operators/incremental.py); the gap-filled series densifies after
aggregation so the grid is keys × span, not event-sized
(operators/timeseries.py). Both are the same library operators the
oracle-gated batch queries use.

Message payload convention (UTF-8): ``event_type,user_id,value_cents``.

Usage:
    python examples/analytics_pipeline.py <engine_dir> <topic> <view_dir>
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_events(batch_df: DataFrame) -> DataFrame:
    """Broker rows → typed event rows (ts from the message timestamp)."""
    parts = F.split(F.decode(F.col("value"), "UTF-8"), ",")
    return batch_df.select(
        F.col("timestamp").alias("ts"),
        parts.getItem(0).alias("event_type"),
        parts.getItem(1).cast("long").alias("user_id"),
        parts.getItem(2).cast("long").alias("value_c"),
    )


def build_stream(
    spark: SparkSession,
    engine_dir: str,
    topic: str,
    view_dir: str,
    checkpoint_dir: str,
    compact_every: int = 4,
):
    """Wire the stream; returns the (not-yet-started) writeStream."""
    from flyq_spark.streaming.sink import aggregate_view_sink
    from flyq_spark.streaming.source import read_stream

    view = aggregate_view_sink(
        view_dir,
        ("event_type",),
        {"value_c": F.col("value_c")},
        approx_distinct={"users": F.col("user_id")},
        compact_every=compact_every,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        view(parse_events(batch_df), batch_id)

    stream = read_stream(spark, engine_dir, topic)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def current_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """The live per-type aggregate: exact stats + derived average
    (exact integer cents) + HLL distinct-user estimate."""
    from flyq_spark.operators.incremental import read_view
    from flyq_spark.streaming.sink import read_aggregate_view

    state = read_aggregate_view(spark, view_dir, ("event_type",), ("value_c",))
    return read_view(state, ("value_c",), avg_scale=1).select(
        "event_type",
        "n_rows",
        "value_c_sum",
        "value_c_avg",
        "value_c_min",
        "value_c_max",
        "users_approx_distinct",
    )


def gap_filled_series(events: DataFrame, interval_s: int = 3600) -> DataFrame:
    """Dense per-type series over the raw log — counts zero-filled,
    last value carried across empty buckets."""
    from flyq_spark.operators.timeseries import resample_locf

    return resample_locf(
        events,
        ("event_type",),
        "ts",
        interval_s,
        {"n": F.count(F.lit(1)), "value_c_max": F.max("value_c")},
        fill=("value_c_max",),
        zero_fill=("n",),
    )


def main() -> None:
    engine_dir, topic, view_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    from flyq_spark.session import get_spark

    spark = get_spark("flyq_analytics_pipeline")
    q = build_stream(
        spark, engine_dir, topic, view_dir, view_dir.rstrip("/") + "_ckpt"
    ).start()
    q.awaitTermination()
    current_view(spark, view_dir).orderBy("event_type").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
