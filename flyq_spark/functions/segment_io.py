"""FlyQ on-disk segment format import/export — data-directory migration.

A user of the reference can point ``import_flyq_dir`` at a FlyQ broker's
base directory and get the same topics/partitions/offsets as parquet log
tables; ``export_topic`` writes a directory the reference broker can
recover from. Formats implemented byte-exactly:

- segment files ``segment_<base:020d>.log`` of StoredRecords
  ``[record_len:u32][offset:u64][message wire bytes]``
  (flyq-server/src/core/stored_record.rs:13-27; filename
  segment.rs:54-56);
- sparse index files ``segment_<base:020d>.index`` of 16-byte
  ``[offset:u64][file_pos:u64]`` entries, first record + every 100th
  (segment.rs:125-154; DEFAULT_INDEX_INTERVAL constants.rs:3) — the
  reference recovers from ANY index density including a missing file
  (segment.rs:188-237), so density is a compatibility courtesy;
- directory layout ``topic_<name>/partition_<id>/`` (topic.rs:21-26).

Export streams rows via ``toLocalIterator`` (bounded driver memory) —
it is a migration utility, not a hot path.
"""

from __future__ import annotations

import os
import re
import struct

from flyq_spark import storage
from flyq_spark.functions.codec import deserialize_message, serialize_message

INDEX_INTERVAL = 100  # DEFAULT_INDEX_INTERVAL, constants.rs:3
_SEGMENT_RE = re.compile(r"^segment_(\d{20})\.log$")


def encode_stored_record(
    offset: int,
    key: bytes | None,
    value: bytes,
    timestamp_ms: int,
    headers=None,
) -> bytes:
    """stored_record.rs:18-27: [len][offset][wire message] (wire = body
    without the message-level length prefix)."""
    wire = serialize_message(key, value, timestamp_ms, headers)[4:]
    return struct.pack(">I", 8 + len(wire)) + struct.pack(">Q", offset) + wire


def decode_stored_records(buf: bytes) -> list[dict]:
    """Parse a whole segment file into message dicts (+ offset)."""
    out = []
    pos = 0
    while pos + 4 <= len(buf):
        (rec_len,) = struct.unpack_from(">I", buf, pos)
        pos += 4
        if rec_len < 8 or pos + rec_len > len(buf):
            # torn/zero-padded tail — the reference's recovery also
            # stops at the first implausible frame instead of crashing
            break
        (offset,) = struct.unpack_from(">Q", buf, pos)
        body = buf[pos + 8 : pos + rec_len]
        pos += rec_len
        m = deserialize_message(struct.pack(">I", len(body)) + body)
        m["offset"] = offset
        out.append(m)
    return out


def export_topic(engine, topic: str, out_dir: str) -> list[str]:
    """Write a topic as a reference-compatible data directory; returns
    written segment paths.

    Executor-parallel: rows repartition onto their broker partition and
    sort by offset within it, then each task streams its partitions'
    records straight into segment+index files — a multi-TB topic exports
    at cluster width instead of serializing through the driver's
    ``toLocalIterator``. Byte layout is unchanged (pinned by
    tests/test_segment_io.py). On a real cluster ``out_dir`` must be a
    filesystem the executors share with the driver (the reference's data
    directory is inherently a local-directory layout); local[?] mode
    trivially satisfies this."""
    from itertools import chain

    from pyspark.sql import functions as F

    n = engine.topic_partitions(topic)
    tdir = os.path.join(out_dir, "topic_" + topic)
    lows: dict[int, int] = {}
    for p in range(n):
        os.makedirs(os.path.join(tdir, f"partition_{p}"), exist_ok=True)
        lows[p] = engine.get_watermark(topic, p)[0]
    low_expr = (
        F.coalesce(
            F.create_map(
                *chain.from_iterable(
                    (F.lit(int(p)), F.lit(int(v))) for p, v in lows.items()
                )
            )[F.col("partition")],
            F.lit(0),
        )
        if lows
        else F.lit(0)
    )
    df = (
        engine.log(topic)
        .where(F.col("offset") >= low_expr)
        # epoch millis computed ENGINE-side: int(dt.timestamp()*1000)
        # on the collected datetime truncates 1 ms low for ~0.6% of
        # values (float) and resolves DST-ambiguous local times wrongly
        # on non-UTC executors; unix_millis is exact and tz-free
        .withColumn("_ts_ms", F.unix_millis(F.col("timestamp")))
        .repartition(max(1, min(n, 32)), "partition")
        .sortWithinPartitions("partition", "offset")
    )

    def write_task(rows):
        paths: list[str] = []
        cur = base = None
        seg = idx = None
        file_pos = n_since_index = 0
        for row in rows:
            p = int(row["partition"])
            off = int(row["offset"])
            if p != cur:
                if seg is not None:
                    seg.close()
                    idx.close()
                cur, base = p, off
                file_pos = n_since_index = 0
                pdir = os.path.join(tdir, f"partition_{p}")
                os.makedirs(pdir, exist_ok=True)
                seg_path = os.path.join(pdir, f"segment_{base:020d}.log")
                seg = open(seg_path, "wb")
                idx = open(
                    os.path.join(pdir, f"segment_{base:020d}.index"), "wb"
                )
                paths.append(seg_path)
            headers = (
                [(h["key"], bytes(h["value"])) for h in row["headers"]]
                if row["headers"]
                else None
            )
            rec = encode_stored_record(
                off,
                bytes(row["key"]) if row["key"] is not None else None,
                bytes(row["value"]),
                int(row["_ts_ms"]),
                headers,
            )
            n_since_index += 1
            if off == base or n_since_index > INDEX_INTERVAL:
                idx.write(struct.pack(">QQ", off, file_pos))
                n_since_index = 1
            seg.write(rec)
            file_pos += len(rec)
        if seg is not None:
            seg.close()
            idx.close()
        return iter(paths)

    return sorted(df.rdd.mapPartitions(write_task).collect())


def import_flyq_dir(engine, src_dir: str) -> dict[str, int]:
    """Load every topic of a reference data directory into the engine,
    preserving partitions and offsets exactly. Returns {topic: rows}.

    Executor-parallel (mirror of ``export_topic``): the driver only
    LISTS segment files; decoding runs as one task per segment via
    ``parallelize(files).flatMap`` — a multi-TB data directory imports
    at cluster width instead of byte-crawling through the driver.
    Watermark bounds come from a per-partition aggregate over the
    decoded rows (a partitions-sized collect), sharing one cached pass
    with the parquet write. ``src_dir`` must be a filesystem executors
    share with the driver, the same contract as export."""
    imported: dict[str, int] = {}
    sc = engine.spark.sparkContext
    for name in sorted(os.listdir(src_dir)):
        if not name.startswith("topic_"):
            continue
        topic = name[len("topic_") :]
        tdir = os.path.join(src_dir, name)
        part_ids = sorted(
            int(d.split("_", 1)[1])
            for d in os.listdir(tdir)
            if d.startswith("partition_")
        )
        n = (max(part_ids) + 1) if part_ids else 1
        if engine.topic_exists(topic):
            existing = engine._meta(topic)
            if any(int(v) > 0 for v in existing["log_end_offsets"].values()):
                raise ValueError(
                    f"refusing to import into non-empty topic {topic!r}: "
                    "appended duplicate offsets would corrupt the log "
                    "(import into a fresh engine/topic, or delete the "
                    "topic first)"
                )
        engine.create_topic(topic, partitions=n)
        meta = engine._meta(topic)
        files = [
            (p, os.path.join(tdir, f"partition_{p}", seg))
            for p in part_ids
            for seg in sorted(
                f
                for f in os.listdir(os.path.join(tdir, f"partition_{p}"))
                if _SEGMENT_RE.match(f)
            )
        ]
        total = 0
        if files:
            from pyspark.sql import functions as F

            from flyq_spark.schemas import LOG_SCHEMA

            def decode_file(item):
                from datetime import datetime, timezone

                p, path = item
                with open(path, "rb") as f:
                    data = f.read()
                for m in decode_stored_records(data):
                    yield (
                        int(m["offset"]),
                        m["key"],
                        m["value"],
                        datetime.fromtimestamp(
                            m["timestamp"] / 1000.0, tz=timezone.utc
                        ),
                        [
                            {"key": k, "value": v}
                            for k, v in (m["headers"] or [])
                        ]
                        or None,
                        p,
                    )

            rdd = sc.parallelize(files, max(1, min(len(files), 64))).flatMap(
                decode_file
            )
            df = engine.spark.createDataFrame(rdd, LOG_SCHEMA).persist()
            try:
                bounds = (
                    df.groupBy("partition")
                    .agg(
                        F.min("offset").alias("lo"),
                        F.max("offset").alias("hi"),
                        F.count("*").alias("cnt"),
                    )
                    .collect()
                )
                for r in bounds:
                    p = str(int(r["partition"]))
                    meta["log_end_offsets"][p] = int(r["hi"]) + 1
                    meta["low_watermarks"][p] = int(r["lo"])
                    total += int(r["cnt"])
                # same defensive conf every engine write path sets:
                # INT96 would strip footer timestamp stats and kill
                # time retention over imported files (quirk Q5)
                engine.spark.conf.set(
                    "spark.sql.parquet.outputTimestampType",
                    "TIMESTAMP_MICROS",
                )
                (
                    df.repartition(max(1, min(n, 32)), "partition")
                    .sortWithinPartitions("partition", "offset")
                    .write.mode("append")
                    .partitionBy("partition")
                    .parquet(storage.topic_dir(engine.base_dir, topic))
                )
            finally:
                df.unpersist()
        storage.save_topic_meta(engine.base_dir, topic, meta)
        imported[topic] = total
    return imported
