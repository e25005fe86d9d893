"""Canonical schemas for the log and control tables (SURVEY §1.3).

The message model mirrors the reference ``Message`` struct
(flyq-protocol/src/message.rs:17-22): optional binary key, binary value,
epoch-millis timestamp, optional (string, binary) header pairs. The log-row
shape matches Spark's built-in Kafka source schema so every streaming idiom
applies directly.
"""

from __future__ import annotations

from pyspark.sql import types as T

HEADERS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("value", T.BinaryType(), False),
        ]
    )
)

# Input shape accepted by produce(): key/value/timestamp/headers, plus an
# optional `seq` (arrival order) used for deterministic routing/offsets.
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("headers", HEADERS_TYPE, True),
    ]
)

# On-disk log row (StoredRecord analog, flyq-server/src/core/stored_record.rs:6-9).
# `topic` is implicit in the table directory (one table per topic, mirroring
# flyq-server/src/core/topic.rs:94-96); `partition` is the hive partition col.
LOG_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("headers", HEADERS_TYPE, True),
        T.StructField("partition", T.IntegerType(), False),
    ]
)

# Consumer-group offsets (OffsetTracker analog,
# flyq-server/src/core/offset_tracker.rs:6-10) with the topic-scope fix
# (quirk Q3: the reference keys by (group, partition) only, so two topics
# sharing a group collide — we key by (group, topic, partition)).
CONSUMER_OFFSETS_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType(), False),
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
)
