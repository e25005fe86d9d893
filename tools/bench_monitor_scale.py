"""Measured per-batch cost curve for the streaming decontamination
monitor (r12): the r11 shape checked each batch's eval shingles with
``eval_ng JOIN store LEFT SEMI`` — Spark cannot broadcast the left
side of a semi-join and the store is too big to broadcast as the
build side, so the ENTIRE accepted-shingle store crossed the wire
every micro-batch (per-batch cost grows with stream history, total
quadratic in stream length). The r12 shape broadcasts the BATCH's
eval shingles and streams the store through one BroadcastHashJoin
scan, and folds the store into a distinct base every
``compact_every`` batches.

This tool drives BOTH shapes over the same synthetic stream and
prints per-batch wall times, so the claim is measured, not asserted.
The regime that matters is STREAM HISTORY >> BATCH (a monitor that
has been ingesting for weeks sees small batches against a huge
store), so batch 0 is a large SEED batch that builds the store and
the follow-on batches are small: the r11 shape pays
exchange+sort(store) on every one of them, the r12 shape one
streamed scan. The r11 shape is reproduced inline (it no longer
exists in the package) byte-for-byte in its join/read structure.
The vocabulary size bounds the distinct-shingle keyspace — size it
well above seed_docs*7 so the store actually grows with the stream
(an early run with vocab=1M saturated the store at ~1M rows / 8 MB,
where the semi-join's exchange is FREE and its fixed costs win;
the flip's claim is about the GB-scale store a long-lived stream
accumulates).

Usage: python tools/bench_monitor_scale.py [seed_docs n_batches docs_per_batch vocab]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _stream_batch(spark, lo: int, hi: int, vocab: int):
    """Deterministic micro-batch over the id range [lo, hi): texts are
    overlapping windows of a ``vocab``-word vocabulary, so adjacent ids
    share most shingles (leakage is real) while distant ids mint new
    ones. ``vocab`` CAPS the store's distinct-shingle count (a shingle
    is determined by its start position mod vocab) — size it well above
    seed_docs * 7 or the store saturates and stops growing."""
    start = (F.col("id") * 7) % vocab
    words = F.transform(
        F.sequence(F.lit(0), (F.col("id") % 6).cast("int") + F.lit(8)),
        lambda i: F.concat(
            F.lit("w"), ((start + i) % vocab).cast("string")
        ),
    )
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
    )


def _r11_shape_sink(out_path: str, state_path: str, n: int = 8):
    """The round-11 monitor write path, reproduced for measurement:
    flat batch_id=N state partitions, store read as one partitioned
    scan, eval-side LEFT SEMI against the whole store, no compaction."""
    from flyq_spark.operators.corpus import _h60, split_shingled

    def write(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = split_shingled(batch_df, n, "doc_id", "text", "0d", "1a")
        train_ng = (
            base.where(F.col("split") == "train")
            .select(F.explode("_ng").alias("_g"))
            .select(_h60(F.col("_g")).alias("ng"))
            .distinct()
        )
        train_ng.write.mode("overwrite").parquet(
            state_path.rstrip("/") + f"/batch_id={batch_id}"
        )
        known = (
            spark.read.parquet(state_path)
            .where(F.col("batch_id") <= batch_id)
            .select("ng")
        )
        eval_ng = (
            base.where(F.col("split") != "train")
            .select("split", F.col("doc_id"), F.explode("_ng").alias("_g"))
            .select("split", "doc_id", _h60(F.col("_g")).alias("ng"))
            .distinct()
            .persist()
        )
        per_doc = eval_ng.groupBy("split", "doc_id").agg(
            F.count("*").cast("long").alias("n_ngrams")
        )
        hit_counts = (
            eval_ng.join(known, on="ng", how="left_semi")
            .groupBy("split", "doc_id")
            .agg(F.count("*").cast("long").alias("n_contaminated"))
            .select(
                F.col("split").alias("_hs"),
                F.col("doc_id").alias("_hid"),
                "n_contaminated",
            )
        )
        hits = per_doc.join(
            hit_counts,
            on=(F.col("split") == F.col("_hs"))
            & (F.col("doc_id") == F.col("_hid")),
            how="left",
        ).select(
            "split",
            "doc_id",
            "n_ngrams",
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        hits.write.mode("overwrite").parquet(
            out_path.rstrip("/") + f"/batch_id={batch_id}"
        )
        eval_ng.unpersist()

    return write


def _drive(
    label: str, sink, spark, seed_docs: int, n_batches: int, docs: int,
    vocab: int,
) -> list[float]:
    """Batch 0 = [0, seed_docs); batch b>=1 = the next `docs` ids.
    Returns the SMALL-batch times (the steady-state per-batch cost)."""
    t0 = time.time()
    sink(_stream_batch(spark, 0, seed_docs, vocab), 0)
    seed_t = time.time() - t0
    times = []
    for b in range(1, n_batches + 1):
        lo = seed_docs + (b - 1) * docs
        t0 = time.time()
        sink(_stream_batch(spark, lo, lo + docs, vocab), b)
        times.append(time.time() - t0)
    print(
        f"{label}: seed({seed_docs})={seed_t:.1f}s  "
        f"small-batch avg={sum(times) / len(times):.2f}s  "
        f"min={min(times):.2f}s  max={max(times):.2f}s"
    )
    print("  per-batch:", " ".join(f"{t:.2f}" for t in times))
    return times


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from flyq_spark.session import get_spark
    from flyq_spark.streaming.sink import (
        contamination_monitor_sink,
        read_contamination_monitor,
    )

    seed_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    docs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    vocab = int(sys.argv[4]) if len(sys.argv) > 4 else 50_000_000
    spark = get_spark("monitor_scale")
    root = tempfile.mkdtemp(prefix="monitor_scale_")
    try:
        new_sink = contamination_monitor_sink(
            os.path.join(root, "new_out"),
            os.path.join(root, "new_state"),
            compact_every=8,
        )
        t_new = _drive("r12 broadcast-probe + compaction", new_sink, spark,
                       seed_docs, n_batches, docs, vocab)
        old_sink = _r11_shape_sink(
            os.path.join(root, "old_out"), os.path.join(root, "old_state")
        )
        t_old = _drive("r11 store-semi-join (reproduced)", old_sink, spark,
                       seed_docs, n_batches, docs, vocab)
        # identical answers: the flip + compaction change the PLAN only
        a = sorted(
            tuple(r)
            for r in read_contamination_monitor(
                spark, os.path.join(root, "new_out")
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in read_contamination_monitor(
                spark, os.path.join(root, "old_out")
            ).collect()
        )
        assert a == b, "shapes disagree on results"
        print(f"results identical across shapes (rollup rows): {len(a)}")
        avg_new = sum(t_new) / len(t_new)
        avg_old = sum(t_old) / len(t_old)
        print(
            f"steady-state per-batch: r12={avg_new:.2f}s  r11={avg_old:.2f}s"
            f"  speedup={avg_old / avg_new:.2f}x"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
