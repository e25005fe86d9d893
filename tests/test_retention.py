"""Retention tests — ports of flyq-server/tests/retention.rs (file-granular
deletes, never the newest file, low-watermark advance) with quirk Q5: time
keys on data timestamps + an explicit logical now."""

from __future__ import annotations

from tests.conftest import make_messages

DAY_MS = 24 * 3600 * 1000
T0 = 1_700_000_000_000


def _fill(engine, topic="t", batches=4, per_batch=5, step_ms=DAY_MS):
    """One parquet file per produce call, batch i stamped T0 + i days."""
    for i in range(batches):
        engine.produce(topic, make_messages(per_batch, ts0=T0 + i * step_ms))


def test_time_retention_deletes_old_files_and_advances_low(engine):
    """retention.rs:9-125: old segments deleted, file count shrinks, low
    watermark advances past victims; data past the cutoff survives."""
    _fill(engine, batches=4)
    before = engine.get_partition_health("t", 0)
    assert before["segment_count"] == 4

    # logical now = T0 + 3d + 1h; retention 1.5d -> batches 0,1 are too old
    now_ms = T0 + 3 * DAY_MS + 3_600_000
    deleted = engine.apply_retention("t", now_ms=now_ms, retention_ms=int(1.5 * DAY_MS))
    assert len(deleted) == 2

    after = engine.get_partition_health("t", 0)
    assert after["segment_count"] == 2
    low, high, leo = engine.get_watermark("t", 0)
    assert (low, high, leo) == (10, 19, 20)  # victims held offsets 0..9
    rows = engine.read_from_offset("t", 0, 0)
    assert [int(r["offset"]) for r in rows] == list(range(10, 20))


def test_retention_never_deletes_newest_file(engine):
    """partition.rs:236-246: the active (newest) segment is never deleted,
    even when everything is out of retention."""
    _fill(engine, batches=3)
    now_ms = T0 + 100 * DAY_MS
    engine.apply_retention("t", now_ms=now_ms, retention_ms=DAY_MS)
    h = engine.get_partition_health("t", 0)
    assert h["segment_count"] == 1
    assert len(engine.read_from_offset("t", 0, 0)) == 5  # newest batch survives


def test_retention_skips_single_file_partition(engine):
    """partition.rs:236-246: <= 1 segment -> no cleanup."""
    engine.produce("t", make_messages(5, ts0=T0))
    deleted = engine.apply_retention(
        "t", now_ms=T0 + 100 * DAY_MS, retention_ms=DAY_MS
    )
    assert deleted == []
    assert engine.get_partition_health("t", 0)["segment_count"] == 1


def test_size_retention_deletes_oldest_until_under_cap(engine):
    """retention.rs:127-197: size-based deletion removes oldest segments
    until total size fits the cap."""
    for i in range(4):
        engine.produce("t", make_messages(20, value_size=1024, ts0=T0 + i * DAY_MS))
    before = engine.get_partition_health("t", 0)
    assert before["segment_count"] == 4
    cap = int(before["total_size_bytes"] * 0.55)
    engine.apply_retention(
        "t", now_ms=T0 + 10 * DAY_MS, retention_ms=100 * DAY_MS, retention_bytes=cap
    )
    after = engine.get_partition_health("t", 0)
    assert after["segment_count"] < before["segment_count"]
    assert after["total_size_bytes"] <= cap
    low, _, _ = engine.get_watermark("t", 0)
    assert low > 0  # oldest offsets gone
    survivors = engine.read_from_offset("t", 0, 0)
    assert [int(r["offset"]) for r in survivors] == list(range(low, 80))


def test_watermark_triple_after_full_history_consumed_by_retention(engine):
    """LEO survives retention; low/high keep their meaning (Q6 semantics:
    high stays at last-written even when older data ages out)."""
    _fill(engine, batches=2)
    engine.apply_retention(
        "t", now_ms=T0 + 50 * DAY_MS, retention_ms=DAY_MS // 2
    )
    low, high, leo = engine.get_watermark("t", 0)
    assert leo == 10 and high == 9 and low == 5


def test_row_granular_retention_dataflow(spark):
    """operators/retention.py survivor-set semantics on a hand-built log."""
    from pyspark.sql import functions as F

    from flyq_spark.operators.retention import retain_by_size, retain_by_time

    rows = [
        (0, i, f"v{i:02d}", T0 + i * 1000) for i in range(10)
    ]  # 10 rows, 3-byte values
    log = spark.createDataFrame(
        rows, "part_id long, msg_offset long, msg_value string, ts_ms long"
    ).withColumn("msg_ts", F.timestamp_millis(F.col("ts_ms")))
    surv_t = retain_by_time(log, F.timestamp_millis(F.lit(T0 + 5000)))
    assert sorted(r["msg_offset"] for r in surv_t.collect()) == list(range(5, 10))
    surv_s = retain_by_size(log, 9)  # 3 newest rows of 3 bytes each
    assert sorted(r["msg_offset"] for r in surv_s.collect()) == [7, 8, 9]


def test_maintain_topic_retains_then_compacts(engine):
    """A22 cleanup-cycle body: retention deletes aged files, compaction
    defragments what survives; data and watermarks stay consistent."""
    for i in range(6):
        engine.produce("m", make_messages(4, ts0=T0 + i * DAY_MS))
    out = engine.maintain_topic(
        "m",
        now_ms=T0 + 5 * DAY_MS + 1,
        retention_ms=2 * DAY_MS,
        compact_above_files=2,
    )
    assert len(out["deleted_files"]) > 0
    assert out["compacted_partitions"].get(0) == 1
    low, high, leo = engine.get_watermark("m", 0)
    assert leo == 24 and high == 23 and low > 0
    rows = engine.read_from_offset("m", 0, 0)
    assert [int(r["offset"]) for r in rows] == list(range(low, 24))


def test_compact_by_key_keeps_latest_and_null_keys(spark):
    from flyq_spark.operators.retention import compact_by_key

    log = spark.createDataFrame(
        [
            (0, 0, "k1", "v0"),
            (0, 1, "k1", "v1"),
            (0, 2, "k2", "v2"),
            (0, 3, None, "rr0"),
            (0, 4, None, "rr1"),
            (1, 0, "k1", "other-part"),
        ],
        "part_id long, msg_offset long, msg_key string, msg_value string",
    )
    got = {
        (r["part_id"], r["msg_offset"], r["msg_key"], r["msg_value"])
        for r in compact_by_key(log).collect()
    }
    assert got == {
        (0, 1, "k1", "v1"),          # older k1@0 compacted away
        (0, 2, "k2", "v2"),
        (0, 3, None, "rr0"),          # null keys never compacted
        (0, 4, None, "rr1"),
        (1, 0, "k1", "other-part"),   # per-partition keyspace
    }


def test_per_topic_retention_override(engine):
    """A topic created with retention_ms override uses it when
    apply_retention runs without arguments (the Kafka topic-config
    pattern); describe_topic surfaces the override."""
    t0 = 1_700_000_000_000
    engine.create_topic("rtopic", partitions=1, retention_ms=1000)
    # two produce batches -> two files; first entirely older than cutoff
    engine.produce(
        "rtopic",
        [{"key": None, "value": b"old", "timestamp": t0 + i} for i in range(3)],
    )
    engine.produce(
        "rtopic",
        [{"key": None, "value": b"new", "timestamp": t0 + 60_000 + i} for i in range(3)],
    )
    desc = engine.describe_topic("rtopic")
    assert desc["config"] == {"retention_ms": 1000}
    assert desc["partition_state"][0]["files"] == 2
    deleted = engine.apply_retention("rtopic", now_ms=t0 + 70_000)
    assert len(deleted) == 1  # old file out; engine default (7d) would keep it
    low, high, leo = engine.get_watermark("rtopic", 0)
    assert (low, high, leo) == (3, 5, 6)


def test_compact_partition_by_key(engine):
    """cleanup.policy=compact: only the latest record per key survives,
    null-key records are exempt, offsets/watermarks are preserved, and
    point reads by stored offset still work on the compacted log."""
    engine.create_topic("ckt", partitions=1)
    t0 = 1_700_000_000_000
    msgs = []
    for i in range(9):
        key = None if i % 3 == 2 else str(i % 2).encode()  # keys 0,1 + nulls
        msgs.append({"key": key, "value": f"v{i}".encode(), "timestamp": t0 + i})
    engine.produce("ckt", msgs)
    before = engine.get_watermark("ckt", 0)
    n = engine.compact_partition_by_key("ckt", 0)
    rows = {
        (None if r["key"] is None else bytes(r["key"])): (r["offset"], bytes(r["value"]))
        for r in engine.log("ckt").where("key is not null").collect()
    }
    # latest per key: key b'0' at offset 6 (v6), key b'1' at offset 7 (v7)
    assert rows == {b"0": (6, b"v6"), b"1": (7, b"v7")}
    nulls = sorted(
        r["offset"] for r in engine.log("ckt").where("key is null").collect()
    )
    assert nulls == [2, 5, 8]  # null-key records all survive
    assert n == 5
    assert engine.get_watermark("ckt", 0) == before  # watermarks untouched
    got = engine.consume("ckt", 0, 7)  # seek by stored offset still works
    assert bytes(got["value"]) == b"v7"
