"""Scan-based watermark/lag/health dataflow (A12/A13/A14).

The engine API answers these from O(1) metadata (engine.py); these
DataFrame forms compute the same answers from the log data itself — the
shape the DuckDB oracle checks, and the shape you want on a cluster when
metadata is unavailable or untrusted (an audit/repair path).

Scale notes:
- the watermark aggregate is min/max over ``offset`` only — with
  ``spark.sql.parquet.aggregatePushdown`` it is answered from parquet
  footers without touching data pages;
- the lag join broadcasts the consumer-offsets side (groups × partitions
  rows — tiny by construction), so lag is scan + broadcast-hash-join with
  no shuffle of the big side.

Reference: flyq-server/src/core/log_engine.rs:133-144 (watermarks),
:181-224 (lag, clamp at :209), :226-256 (health).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarks(
    log: DataFrame, part_col: str = "part_id", offset_col: str = "msg_offset"
) -> DataFrame:
    """Per-partition (low, high, leo) for non-empty partitions.

    Quirk Q6 (empty partition -> (0,0,0)) is an engine-API concern; a scan
    over data cannot see empty partitions.
    """
    return log.groupBy(F.col(part_col).alias("part_id")).agg(
        F.min(offset_col).cast("long").alias("low_watermark"),
        F.max(offset_col).cast("long").alias("high_watermark"),
        (F.max(offset_col) + 1).cast("long").alias("log_end_offset"),
    )


def consumer_lag(watermark_df: DataFrame, offsets_df: DataFrame) -> DataFrame:
    """lag = greatest(high_watermark - committed, 0) per partition — the
    reference formula exactly (log_engine.rs:209: hw.saturating_sub(
    committed); pinned by tests/watermark_apis.rs:67-92: 20 messages at
    committed=0 -> lag 19, commit 10 -> 9, commit 19 -> 0). Note hw is the
    *last* offset, so lag undercounts unread-by-one at committed=0 — a
    reference quirk (Q4) we inherit deliberately. Broadcast the tiny
    offsets side."""
    committed = F.coalesce(F.col("committed"), F.lit(0))
    return (
        watermark_df.join(
            F.broadcast(offsets_df.select("part_id", "committed")),
            on="part_id",
            how="left",
        )
        .select(
            "part_id",
            committed.cast("long").alias("committed"),
            F.col("high_watermark"),
            F.greatest(F.col("high_watermark") - committed, F.lit(0))
            .cast("long")
            .alias("lag"),
        )
    )


def partition_health(
    log: DataFrame,
    part_col: str = "part_id",
    offset_col: str = "msg_offset",
    value_col: str = "msg_value",
) -> DataFrame:
    """Logical health: record count + payload bytes + watermark triple per
    partition. (Physical segment_count/file sizes are engine-side,
    storage.partition_file_stats — not reproducible by a SQL oracle.)"""
    return log.groupBy(F.col(part_col).alias("part_id")).agg(
        F.count("*").cast("long").alias("record_count"),
        F.sum(F.octet_length(F.col(value_col))).cast("long").alias("total_value_bytes"),
        F.min(offset_col).cast("long").alias("low_watermark"),
        F.max(offset_col).cast("long").alias("high_watermark"),
        (F.max(offset_col) + 1).cast("long").alias("log_end_offset"),
    )


def offsets_for_times(
    log: DataFrame,
    ts_cutoff,
    part_col: str = "part_id",
    offset_col: str = "msg_offset",
    ts_col: str = "msg_ts",
) -> DataFrame:
    """Kafka's ``offsetsForTimes`` as dataflow: per partition, the
    EARLIEST offset whose timestamp is >= the cutoff — the seek API a
    consumer uses to start "from 9am yesterday". Partitions with no
    qualifying record emit no row (Kafka returns null there).

    Scale shape: the timestamp predicate reaches the parquet scan
    (footer min/max row-group skipping, since log data is appended in
    rough time order), then ONE tiny groupBy on the partition key. No
    window, no join."""
    return (
        log.where(F.col(ts_col) >= ts_cutoff)
        .groupBy(F.col(part_col).alias("part_id"))
        .agg(F.min(offset_col).cast("long").alias("first_offset"))
    )


def late_arrival_profile(
    df,
    group_col: str,
    arrival_order,
    ts_col: str,
    thresholds_us: tuple[int, ...] = (60_000_000, 3_600_000_000),
):
    """Late-data profile per group — the measurement that SIZES a
    Structured Streaming watermark delay before you commit to one:
    replay the data in ARRIVAL order, track the running max event-time
    per group (exactly the watermark a streaming job would have
    carried, reference scope: the broker's high watermark is the
    offset analog, partition_state.rs:4-8), and report how many
    events arrived more than each candidate delay behind it — i.e.
    exactly the rows ``withWatermark(delay)`` would have dropped.

    lateness_us = running_max(ts) − ts, inclusive (0 when the row
    itself advances the watermark). The running max rides the grouped
    prefix-agg primitive (operators/ranking.py — one range exchange +
    Arrow cummax; a window keyed by the low-cardinality group column
    would sort N/|groups| rows in one task).

    Output: one row per group — (group, n_events, max_late_us,
    total_late_us, n_late_<t>us per threshold)."""
    from pyspark.sql import functions as F

    from flyq_spark.operators.ranking import grouped_prefix_agg

    src = df.select(
        F.col(group_col),
        arrival_order.alias("_ord"),
        F.col(ts_col).alias("_ts_us"),
    ).where(F.col("_ts_us").isNotNull())
    cum = grouped_prefix_agg(
        src,
        [group_col],
        [F.col("_ord").asc()],
        {"_wm_us": ("max", F.col("_ts_us"))},
    )
    late = F.col("_wm_us") - F.col("_ts_us")
    counters = [
        F.count(F.when(late > int(t), 1))
        .cast("long")
        .alias(f"n_late_{int(t)}us")
        for t in thresholds_us
    ]
    return cum.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(late).cast("long").alias("max_late_us"),
        F.sum(late).cast("long").alias("total_late_us"),
        *counters,
    )
