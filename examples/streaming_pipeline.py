"""Continuous training-corpus ingestion — the STREAMING composition of
the batch pipeline in examples/pipeline.py: documents arrive as broker
messages, and every micro-batch flows

    topic tail → PII redaction → quality filter (Gopher rules)
               → MinHash-LSH near-dup dedup against ALL previously
                 accepted documents (persisted band-key store)
               → accepted-documents corpus (parquet, epoch-partitioned)

Each stage is the same library operator the batch path uses — the
design point of the CDC/dedup operators is exactly that batch and
streaming share one semantics. Idempotence under at-least-once
redelivery comes from `neardup_dedup_sink`'s epoch-keyed overwrite +
strict batch_id<N history filter, so a crashed-and-replayed micro-batch
converges to the same corpus.

Usage:
    python examples/streaming_pipeline.py <engine_dir> <topic> <out_dir>
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_stream(
    spark: SparkSession,
    engine_dir: str,
    topic: str,
    out_dir: str,
    checkpoint_dir: str,
    min_words: int = 10,
):
    """Wire the stream; returns the (not-yet-started) writeStream.

    The per-batch function keys documents by (partition, offset)
    packed into one id (partition * 2^40 + offset) — unique across a
    multi-partition topic (offsets are PER-PARTITION in this engine)
    and stable under replay, which the dedup sink's idempotence relies
    on; 2^40 offsets per partition is ~10^12 messages, far past any
    single partition's range."""
    from flyq_spark.operators.text import quality_filter, redact_pii
    from flyq_spark.streaming.sink import neardup_dedup_sink
    from flyq_spark.streaming.source import read_stream

    dedup = neardup_dedup_sink(
        out_dir.rstrip("/") + "/accepted",
        out_dir.rstrip("/") + "/bands",
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(
            (
                F.col("partition").cast("long") * F.lit(1 << 40)
                + F.col("offset")
            ).alias("doc_id"),
            F.decode(F.col("value"), "UTF-8").alias("text"),
        )
        clean = redact_pii(docs).select("doc_id", "text")
        verdicts = quality_filter(clean, min_words=min_words)
        kept = clean.join(
            verdicts.where(F.col("keep")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        dedup(kept, batch_id)

    stream = read_stream(spark, engine_dir, topic)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def main() -> None:
    engine_dir, topic, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    from flyq_spark.session import get_spark

    spark = get_spark("flyq_streaming_pipeline")
    q = build_stream(
        spark, engine_dir, topic, out_dir, out_dir.rstrip("/") + "/ckpt"
    ).start()
    q.awaitTermination()
    accepted = spark.read.parquet(out_dir.rstrip("/") + "/accepted")
    print(f"accepted corpus: {accepted.count()} documents")
    spark.stop()


if __name__ == "__main__":
    main()
