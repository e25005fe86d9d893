"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure a CPU-heavy narrow stage gets at least ``min_parallelism``
    tasks (default: the cluster's defaultParallelism).

    A small corpus read from one parquet file (or one row group — splits
    can't cross row-group boundaries) pins every downstream narrow stage
    to a single core, no matter how wide the cluster is. For operators
    whose per-row work dominates (shingling, per-char fingerprints,
    signature building, n×k pivot scoring), one round-robin shuffle to
    restore parallelism pays for itself immediately.

    Guarded: when the input already has enough partitions — the normal
    state at cluster scale, where 100 TB arrives as thousands of splits —
    this is a no-op, so the library never injects a corpus-wide shuffle
    into an already-parallel plan.
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
