"""Erasure execution (operators/pruning.py erase_partition_keys): the
GDPR delete path's executing half. Covers what the gate fixture can't:
a partition erased to EMPTY (directory must disappear), Bloom false
positives (harmless rewrite, zero rows lost), untouched partitions
keeping their files byte-identical, and the empty work list no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_ds(spark, path):
    rows = [(i, i // 10) for i in range(50)]  # partitions b=0..4, 10 rows each
    (
        spark.createDataFrame(rows, "event_id long, b long")
        .repartition(5, "b")
        .write.partitionBy("b")
        .parquet(path)
    )


def _part_files(path, v):
    d = os.path.join(path, f"b={v}")
    if not os.path.isdir(d):
        return None
    return sorted(
        (f, os.path.getmtime(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def test_erase_rewrites_only_flagged_and_drops_emptied(spark, tmp_path):
    from flyq_spark.operators.pruning import erase_partition_keys

    path = str(tmp_path / "ds")
    _write_ds(spark, path)
    before_untouched = _part_files(path, 3)
    # erase all of partition 1 (ids 10..19) + two keys from partition 0
    keys = spark.createDataFrame(
        [(i,) for i in range(10, 20)] + [(3,), (7,)], "k long"
    )
    stats = erase_partition_keys(
        spark, path, "b", [0, 1], keys, "k", "event_id"
    )
    assert stats == {"files_rewritten": 1, "partitions_deleted": 1}
    assert _part_files(path, 1) is None  # emptied directory removed
    assert _part_files(path, 3) == before_untouched  # untouched bytes
    got = sorted(
        r[0] for r in spark.read.parquet(path).select("event_id").collect()
    )
    assert got == [0, 1, 2, 4, 5, 6, 8, 9] + list(range(20, 50))


def test_erase_false_positive_partition_survives_intact(spark, tmp_path):
    """A Bloom false positive flags a partition holding none of the
    keys: the rewrite must keep every row (wasted I/O, zero damage)."""
    from flyq_spark.operators.pruning import erase_partition_keys

    path = str(tmp_path / "ds")
    _write_ds(spark, path)
    keys = spark.createDataFrame([(999,)], "k long")  # matches nothing
    stats = erase_partition_keys(spark, path, "b", [2], keys, "k", "event_id")
    assert stats == {"files_rewritten": 1, "partitions_deleted": 0}
    got = sorted(
        r[0] for r in spark.read.parquet(path).select("event_id").collect()
    )
    assert got == list(range(50))


def test_erase_empty_worklist_is_noop(spark, tmp_path):
    from flyq_spark.operators.pruning import erase_partition_keys

    path = str(tmp_path / "ds")
    _write_ds(spark, path)
    keys = spark.createDataFrame([(1,)], "k long")
    stats = erase_partition_keys(spark, path, "b", [], keys, "k", "event_id")
    assert stats == {"files_rewritten": 0, "partitions_deleted": 0}
    assert spark.read.parquet(path).count() == 50


def test_erase_end_to_end_with_bloom_plan(spark, tmp_path):
    """Plan from the Bloom index, execute, prove survivors exact — the
    full pipeline the gate query runs, on a corpus small enough to
    enumerate."""
    from flyq_spark.operators.pruning import (
        bloom_file_index,
        bloom_index_lookup_many,
        erase_partition_keys,
    )

    path = str(tmp_path / "ds")
    _write_ds(spark, path)
    back = spark.read.parquet(path).withColumn("file", F.col("b"))
    idx = bloom_file_index(back, "file", F.col("event_id"), 1024, 3)
    keys = spark.createDataFrame([(5,), (23,), (44,), (777,)], "k long")
    flagged = sorted(
        r[0]
        for r in bloom_index_lookup_many(idx, keys, "k", 1024, 3)
        .select("file")
        .distinct()
        .collect()
    )
    # soundness: every partition truly holding a key must be flagged
    assert {0, 2, 4} <= set(flagged)
    erase_partition_keys(spark, path, "b", flagged, keys, "k", "event_id")
    got = sorted(
        r[0] for r in spark.read.parquet(path).select("event_id").collect()
    )
    assert got == [i for i in range(50) if i not in (5, 23, 44)]
