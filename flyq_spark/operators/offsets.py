"""Contiguous per-partition offset assignment (SURVEY A4).

The reference assigns offsets with a mutex-guarded atomic fetch-and-increment
(flyq-server/src/core/partition_state.rs:27-29, used partition.rs:108), which
serializes every append through one lock. The Spark restatement keeps the
guarantee (dense offsets 0..n-1 per partition, in arrival order) while
parallelizing across partitions:

    offset = prev_log_end_offset[partition]
           + row_number() OVER (PARTITION BY partition ORDER BY seq) - 1

Commits are single-writer per topic — exactly the reference's effective
guarantee (its global engine mutex, flyq-server/src/types.rs:4, is stricter:
one op per *broker*). At scale the window is one shuffle by `partition`,
which the subsequent partitioned write needs anyway, so offset assignment
adds no extra shuffle stage.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_offsets(
    routed: DataFrame, prev_leo: dict[int, int], seq_col: str = "seq"
) -> DataFrame:
    """Add dense `offset` per partition, continuing from `prev_leo`."""
    w = Window.partitionBy("partition").orderBy(F.col(seq_col))
    if prev_leo:
        base = F.coalesce(
            F.create_map(
                *chain.from_iterable(
                    (F.lit(int(p)), F.lit(int(leo))) for p, leo in prev_leo.items()
                )
            )[F.col("partition")],
            F.lit(0),
        )
    else:
        base = F.lit(0)
    return routed.withColumn(
        "offset", (base + F.row_number().over(w) - 1).cast("long")
    )
