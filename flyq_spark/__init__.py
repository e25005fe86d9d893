"""flyq_spark — a PySpark-native engine with the capabilities of FlyQ.

FlyQ (reference: /root/reference, aboosoyeed/FlyQ) is a single-node,
Kafka-inspired message broker: an append-only, segment-rotated, sparsely
indexed log with topics, partitions, consumer-group offset tracking,
watermark/lag/health observability, and time/size-based retention.

This package re-expresses those semantics Spark-first:

- the log is a hive-partitioned parquet table per topic
  (``topic_<name>/partition=<id>/*.parquet``) — parquet footer min/max
  stats on ``offset`` play the role of FlyQ's sparse index
  (reference: flyq-server/src/core/segment.rs:125-154);
- produce/consume/offset-tracking are DataFrame transformations
  (reference: flyq-server/src/core/log_engine.rs);
- retention is file-granular, mirroring FlyQ's segment-granular deletes
  (reference: flyq-server/src/core/partition.rs:225-308);
- streaming ingest/tail are Structured Streaming (readStream/foreachBatch).

Beyond the reference surface, ``operators/`` adds LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale: built-in-function expressions (JVM-side,
whole-stage-codegen friendly), no row-at-a-time Python in hot paths.
"""

from flyq_spark.config import EngineConfig
from flyq_spark.engine import FlyQEngine, UnknownTopic
from flyq_spark.session import get_spark

__all__ = ["EngineConfig", "FlyQEngine", "UnknownTopic", "get_spark"]
__version__ = "0.2.0"
