"""Row-granular retention dataflow (A15 time / A16 size).

The engine deletes whole files (engine.apply_retention — the faithful
analog of FlyQ's whole-segment deletes, partition.rs:225-308). These
dataflow forms define the *logical* survivor set at row granularity so the
semantics are oracle-checkable and composable:

- time: survivors = rows with ``ts >= logical_now - retention``; quirk Q5 —
  the reference's clock is an in-memory last-write time that resets on
  restart (segment.rs:208), ours is the data's own timestamp column with
  an explicit logical "now" (deterministic at both engines);
- size: keep the newest rows per partition whose reverse running payload
  byte-sum stays within the cap — the row-granular restatement of "delete
  oldest segments while over retention_bytes" (partition.rs:262-270).

Scale: both are one window/aggregation keyed by the partition column —
the same shuffle key as the log layout, so AQE keeps them co-partitioned;
no global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def retain_by_time(log: DataFrame, cutoff: Column, ts_col: str = "msg_ts") -> DataFrame:
    """Survivors of time retention: rows at/after the cutoff."""
    return log.where(F.col(ts_col) >= cutoff)


def retain_by_size(
    log: DataFrame,
    retention_bytes: int,
    part_col: str = "part_id",
    offset_col: str = "msg_offset",
    value_col: str = "msg_value",
) -> DataFrame:
    """Survivors of size retention: newest-first running byte sum <= cap.

    A row survives iff the total payload bytes of itself plus all newer
    rows in its partition is within ``retention_bytes`` — i.e. deletion
    consumes oldest rows first, exactly the BTreeMap-order deletion of the
    reference (partition.rs:262-270) at row granularity.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(offset_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.octet_length(F.col(value_col))).over(w)
    return (
        log.withColumn("_running_bytes", running)
        .where(F.col("_running_bytes") <= retention_bytes)
        .drop("_running_bytes")
    )


def post_retention_watermarks(
    full_log: DataFrame,
    survivors: DataFrame,
    part_col: str = "part_id",
    offset_col: str = "msg_offset",
) -> DataFrame:
    """Watermark triple after retention: low = min surviving offset, while
    high/leo are preserved from the pre-retention log (retention never
    rewinds the end of the log — partition.rs:285 only advances low)."""
    leo = full_log.groupBy(F.col(part_col).alias("part_id")).agg(
        F.max(offset_col).cast("long").alias("high_watermark"),
        (F.max(offset_col) + 1).cast("long").alias("log_end_offset"),
    )
    low = survivors.groupBy(F.col(part_col).alias("part_id")).agg(
        F.min(offset_col).cast("long").alias("low_watermark")
    )
    return leo.join(low, on="part_id", how="left").select(
        "part_id",
        F.coalesce(F.col("low_watermark"), F.col("log_end_offset")).alias("low_watermark"),
        "high_watermark",
        "log_end_offset",
    )


def compact_by_key(
    log: DataFrame,
    part_col: str = "part_id",
    key_col: str = "msg_key",
    offset_col: str = "msg_offset",
) -> DataFrame:
    """Kafka-style log compaction: keep only the LATEST record (highest
    offset) for each (partition, key) — the retention policy for
    changelog topics where the log is a materialized map and old values
    for a key are dead weight. [EXT]: the reference broker (a pure
    queue) has no compaction; this is the standard broker feature its
    users would reach for next.

    One shuffle: ``row_number() over (partition by part, key order by
    offset desc)`` and keep rank 1 — no self-join against a max-offset
    aggregate (which would shuffle the log twice). Null-key records
    (round-robin traffic) are never compacted away, matching Kafka:
    compaction is defined only for keyed records.

    Offsets are preserved, not re-densified — consumers seek by stored
    offset into a compacted topic exactly as Kafka's do.

    "Keyless" follows quirk Q1's definition: NULL **or empty** key —
    the codec cannot distinguish them (a zero-length key decodes as
    None, message.rs:83-92) and the router treats both as round-robin
    traffic, so compaction must exempt both (collapsing b"" records
    would delete unrelated keyless messages that happened to share a
    partition)."""
    keyless = F.col(key_col).isNull() | (F.octet_length(F.col(key_col)) == 0)
    w = Window.partitionBy(part_col, key_col).orderBy(F.col(offset_col).desc())
    keyed = log.where(~keyless)
    latest = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.unionByName(log.where(keyless))
