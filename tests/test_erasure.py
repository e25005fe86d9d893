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


def test_compaction_execute_merges_and_preserves_content(spark, tmp_path):
    """Multi-file dirs merge to ONE file each, single-file bins stay
    byte-identical on disk, content multiset unchanged."""
    from flyq_spark.operators.pruning import (
        compaction_execute,
        compaction_plan,
        file_sizes,
    )

    path = str(tmp_path / "ds")
    rows = [(i, i // 20) for i in range(50)]  # b=0,1: 20 rows; b=2: 10
    (
        spark.createDataFrame(rows, "event_id long, b long")
        .repartition(1)
        .write.option("maxRecordsPerFile", 8)
        .partitionBy("b")
        .parquet(path)
    )
    sizes = file_sizes(spark, path)
    n_before = sizes.count()
    assert n_before == 3 + 3 + 2  # ceil(20/8)*2 + ceil(10/8)
    plan = compaction_plan(sizes, 512 * 1024 * 1024)
    stats = compaction_execute(spark, path, plan)
    assert stats == {"bins_merged": 3, "files_removed": 8, "files_written": 3}
    after = file_sizes(spark, path).collect()
    assert len(after) == 3
    assert all(r["file"].startswith("compacted-") for r in after)
    got = sorted(r[0] for r in spark.read.parquet(path).select("event_id").collect())
    assert got == list(range(50))
    # partition column survives via directory structure
    got_b = dict(
        (r["b"], r["n"])
        for r in spark.read.parquet(path)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got_b == {0: 20, 1: 20, 2: 10}


def test_compaction_execute_noop_when_no_multifile_bins(spark, tmp_path):
    from flyq_spark.operators.pruning import (
        compaction_execute,
        compaction_plan,
        file_sizes,
    )

    path = str(tmp_path / "ds")
    spark.createDataFrame(
        [(1, 0), (2, 1)], "event_id long, b long"
    ).repartition(1).write.partitionBy("b").parquet(path)
    sizes = file_sizes(spark, path)
    before = sorted(
        (r["dir"], r["file"], os.path.getmtime(os.path.join(path, r["dir"], r["file"])))
        for r in sizes.collect()
    )
    stats = compaction_execute(spark, path, compaction_plan(sizes, 10**9))
    assert stats == {"bins_merged": 0, "files_removed": 0, "files_written": 0}
    after = sorted(
        (r["dir"], r["file"], os.path.getmtime(os.path.join(path, r["dir"], r["file"])))
        for r in file_sizes(spark, path).collect()
    )
    assert after == before  # bytes AND mtimes untouched


def test_subject_access_collapses_after_erasure(spark, tmp_path):
    """The full GDPR loop: subject report shows the subject's rows,
    erasure executes, the re-run report collapses to (0, 0, 0) for the
    erased subject while other subjects' digests are unchanged."""
    from flyq_spark.operators.profile import subject_access_report
    from flyq_spark.operators.pruning import erase_partition_keys

    path = str(tmp_path / "ds")
    rows = [(i, i % 7, i // 10) for i in range(50)]  # (event_id, user, b)
    (
        spark.createDataFrame(rows, "event_id long, user_id long, b long")
        .repartition(5, "b")
        .write.partitionBy("b")
        .parquet(path)
    )

    def report():
        return {
            (r["table_name"], r["subject_key"]): (
                r["n_rows"], r["xor_h"], r["sum_mod"]
            )
            for r in subject_access_report(
                {
                    "ds": (
                        spark.read.parquet(path),
                        F.col("user_id"),
                        {"event_id": F.col("event_id")},
                    )
                },
                spark.createDataFrame([(3,), (5,), (999,)], "k long"),
            ).collect()
        }

    before = report()
    assert before[("ds", 3)][0] == 7  # ids 3,10,17,24,31,38,45
    assert before[("ds", 999)] == (0, 0, 0)  # absent subject: explicit zeros
    # erase subject 3's EVENT ids? — erasure is by event_id key here:
    # drop all of subject 3's events (ids where i % 7 == 3)
    subj3_ids = [i for i in range(50) if i % 7 == 3]
    keys = spark.createDataFrame([(i,) for i in subj3_ids], "k long")
    erase_partition_keys(
        spark, path, "b", [0, 1, 2, 3, 4], keys, "k", "event_id"
    )
    after = report()
    assert after[("ds", 3)] == (0, 0, 0)  # proof of deletion
    assert after[("ds", 5)] == before[("ds", 5)]  # bystander unchanged


def test_engine_erase_subject_full_loop(spark, tmp_path):
    """The composed GDPR loop (engine.erase_subject): before-report,
    keyed erasure across topics, after-report — erased subjects must
    collapse to (0, 0, 0) with their before-counts intact, bystander
    messages must survive byte-for-byte with their ORIGINAL offsets
    (gaps allowed, like retention), and a second call must report the
    subject already gone (n_before = 0)."""
    from flyq_spark.engine import FlyQEngine

    eng = FlyQEngine(spark, str(tmp_path / "broker"))
    subjects = [b"alice", b"bob"]
    bystander = b"carol"
    msgs = []
    for i in range(30):
        k = [b"alice", b"bob", bystander][i % 3]
        msgs.append(
            {"key": k, "value": f"m{i}".encode(), "timestamp": 1_700_000_000_000 + i}
        )
    eng.produce("t1", msgs)
    eng.produce("t2", msgs[:9])

    pre_carol = sorted(
        (r["partition"], r["offset"], bytes(r["value"]))
        for r in eng.log("t1").where(F.col("key") == F.lit(bystander)).collect()
    )
    rep = {
        (r["topic"], r["subject_key"]): r
        for r in eng.erase_subject(subjects).collect()
    }
    assert len(rep) == 4  # 2 topics x 2 subjects
    for (_t, _k), r in rep.items():
        assert r["n_before"] > 0
        assert (r["n_after"], r["xor_after"], r["sum_after"]) == (0, 0, 0)
    assert sum(r["n_before"] for r in rep.values()) == 20 + 6

    # bystander rows byte-identical, original offsets preserved
    post_carol = sorted(
        (r["partition"], r["offset"], bytes(r["value"]))
        for r in eng.log("t1").where(F.col("key") == F.lit(bystander)).collect()
    )
    assert post_carol == pre_carol
    # no subject bytes anywhere on disk
    assert eng.log("t1").where(F.col("key").isin(subjects)).count() == 0
    assert eng.log("t2").where(F.col("key").isin(subjects)).count() == 0

    # second call: already erased — zero everywhere, zero rewrites
    rep2 = eng.erase_subject(subjects).collect()
    assert all(r["n_before"] == 0 and r["n_after"] == 0 for r in rep2)
    assert all(r["parts_rewritten"] == 0 and r["parts_deleted"] == 0 for r in rep2)
