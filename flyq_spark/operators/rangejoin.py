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


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    key_col: str | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval-overlap self-join: pairs (id_a < id_b) whose [start, end]
    intervals intersect — the second classic inequality-join shape
    (``within_interval_pairs`` is point-proximity; this is
    interval-interval, the genomics/temporal-overlap workhorse Spark
    has no native operator for).

    Two scale regimes, caller-chosen:
    - ``key_col`` given (bucket_width None): candidate pairs come from
      a plain equi-join on the key — right when per-key interval counts
      are bounded (overlaps of one order's shipments, one user's
      activity spans). One key shuffle, AQE-skew-splittable.
    - ``bucket_width`` given: each interval replicates into every
      width-``bucket_width`` bucket it touches; candidates share a
      bucket, and each pair is EMITTED EXACTLY ONCE — only in the
      bucket containing max(start_a, start_b), the start of the
      overlap region, which lies in exactly one bucket (the same
      dedup-by-canonical-bucket trick as ``within_interval_pairs``,
      and the binned-range-join strategy engines ship for this).
      Replication factor = interval length / width; pick the width
      near the TYPICAL interval length and AQE splits the dense
      buckets. No n x m comparison anywhere.

    Starts/ends are integers (cast timestamps with unix_micros first).
    Output: (key?, id_a, id_b, overlap) where overlap =
    min(end) - max(start) >= 0 (touching intervals count, overlap 0).
    """
    if (key_col is None) == (bucket_width is None):
        raise ValueError("exactly one of key_col / bucket_width required")
    base = df.select(
        *( [F.col(key_col).alias("k")] if key_col else [] ),
        F.col(id_col).alias("i"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    )
    if key_col:
        a, b = base.alias("a"), base.alias("b")
        joined = a.join(
            b,
            on=[F.col("a.k") == F.col("b.k"), F.col("a.i") < F.col("b.i")],
        )
    else:
        repl = base.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("s") / bucket_width),
                    F.floor(F.col("e") / bucket_width),
                )
            ),
        )
        a, b = repl.alias("a"), repl.alias("b")
        joined = a.join(
            b,
            on=[
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.i") < F.col("b.i"),
            ],
        ).where(
            # canonical emission: only the bucket holding the overlap start
            F.col("a.bucket")
            == F.floor(
                F.greatest(F.col("a.s"), F.col("b.s")) / bucket_width
            )
        )
    overlap = F.least(F.col("a.e"), F.col("b.e")) - F.greatest(
        F.col("a.s"), F.col("b.s")
    )
    out_cols = (
        [F.col("a.k").alias(key_col)] if key_col else []
    ) + [
        F.col("a.i").alias("id_a"),
        F.col("b.i").alias("id_b"),
        overlap.cast("long").alias("overlap"),
    ]
    return joined.where(overlap >= 0).select(*out_cols)
