"""Bucketed range join [EXT] — the other join Spark lacks a fast native
strategy for (a raw inequality join degenerates to
broadcast-nested-loop: n x m comparisons).

``within_interval_pairs``: all pairs of rows with the same key whose
timestamps lie within ``max_gap`` of each other. The scale shape:

1. bucket every row into ``floor(ts / max_gap)``;
2. replicate each row into its own and the next bucket (each qualifying
   pair then co-occurs in exactly one bucket: the earlier row's own
   bucket when both share it, else the later row's bucket which the
   earlier row was replicated into);
3. equi-join on (key, bucket) — a hash join, sized by bucket occupancy,
   never n x m;
4. exact |ts_a - ts_b| <= max_gap filter, and a containment rule that
   keeps each pair from the one bucket where both rows genuinely
   belong, so no duplicates survive.

The same bucket-replicate-filter shape generalizes to interval
containment (point-in-interval joins): replicate intervals over the
buckets they span, equi-join points on bucket, filter exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def within_interval_pairs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    max_gap_s: int,
) -> DataFrame:
    """Pairs (id_a < id_b) of same-key rows within max_gap_s seconds.
    Output: (key, id_a, id_b, gap_s)."""
    gap_us = max_gap_s * 1_000_000
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("i"),
        F.unix_micros(F.col(ts_col)).alias("t"),
    )
    bucketed = base.withColumn("own_bucket", F.floor(F.col("t") / gap_us))
    # replicate into own and next bucket
    repl = bucketed.select(
        "k",
        "i",
        "t",
        "own_bucket",
        F.explode(F.array(F.col("own_bucket"), F.col("own_bucket") + 1)).alias("bucket"),
    )
    a, b = repl.alias("a"), repl.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.k") == F.col("b.k"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.i") < F.col("b.i"),
            ],
        )
        .where(F.abs(F.col("a.t") - F.col("b.t")) <= gap_us)
        # keep each pair exactly once, in the later row's own bucket: when
        # both rows share an own-bucket B they co-occur in B and B+1 (keep
        # B = the greatest); when they differ by one, the only shared
        # bucket IS the later one (again the greatest own bucket).
        .where(
            F.col("a.bucket")
            == F.greatest(F.col("a.own_bucket"), F.col("b.own_bucket"))
        )
        .select(
            F.col("a.k").alias(key_col),
            F.col("a.i").alias("id_a"),
            F.col("b.i").alias("id_b"),
            (F.abs(F.col("a.t") - F.col("b.t")) / 1_000_000.0).alias("gap_s"),
        )
    )
    return pairs
