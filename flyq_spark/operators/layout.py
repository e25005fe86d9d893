"""Data-layout optimization [EXT]: Z-order (Morton) clustering.

Parquet pruning is only as good as the per-file min/max envelopes. A
single-column sort gives perfect envelopes on ONE column and useless
ones on every other; interleaving the bits of several bounded keys
(the Morton / Z-order curve) makes every file's envelope small on ALL
interleaved dimensions at once, so filters on any of them prune files
(Delta/Iceberg OPTIMIZE ZORDER offer exactly this; open-source Spark
has no built-in, hence this operator).

The code is a pure bit-arithmetic projection (whole-stage codegen'd,
no UDF); the layout step is ``repartitionByRange`` on the code — the
same one shuffle any clustered write pays. At 100 TB the win scales
with file count: pruning is O(files touched), and touched files drop
multiplicatively with each filtered dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of x
    lands at position 2i, bit i of y at 2i+1. Closed-form sum of
    shifted bit tests — deterministic, engine-independent integer
    arithmetic (no UDF, no lookup table)."""
    code: Column = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        code = code + F.shiftleft(xb, 2 * i) + F.shiftleft(yb, 2 * i + 1)
    return code


def zorder_repartition(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = 16,
) -> DataFrame:
    """Cluster rows for writing: range-partition on the Morton code of
    (x, y) and sort within partitions, so each output file covers a
    compact 2-D tile — its parquet min/max stats are tight on BOTH
    columns and a filter on either prunes most files."""
    coded = df.withColumn("_z", morton_code(F.col(x_col), F.col(y_col), bits))
    return (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def morton_code_n(cols: list[Column], bits: int | None = None) -> Column:
    """N-dimensional Morton interleave: bit i of column j lands at
    position ``i·k + j`` for k columns — the general form of
    :func:`morton_code` (which it reproduces exactly for two columns
    at the same bits). Same closed-form shifted-bit-test sum: pure
    integer projection, whole-stage codegen'd, no UDF.

    ``bits`` defaults to the most that fit a signed 64-bit code
    (63 // k — e.g. 21 bits per dim at k=3); the product k·bits must
    stay ≤ 63, enforced loudly. Inputs must be non-negative and below
    2^bits (higher bits are simply not encoded — range-reduce or
    bucket upstream, exactly as with the 2-D form)."""
    k = len(cols)
    if k < 2:
        raise ValueError("morton_code_n needs at least two columns")
    if bits is None:
        bits = 63 // k
    if bits < 1 or k * bits > 63:
        raise ValueError(f"k*bits must be in [k, 63]: k={k}, bits={bits}")
    code: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            b = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            code = code + F.shiftleft(b, i * k + j)
    return code


def zorder_repartition_n(
    df: DataFrame,
    cols: list[str],
    n_files: int = 8,
    bits: int | None = None,
) -> DataFrame:
    """N-column clustered write layout: range-partition + sort on the
    N-dim Morton code so every output file is a compact k-D tile —
    min/max envelopes tight on ALL k columns, so a filter on ANY of
    them prunes files (``pruning.file_stats`` measures exactly this).
    The one shuffle any clustered write pays."""
    coded = df.withColumn(
        "_z", morton_code_n([F.col(c) for c in cols], bits)
    )
    return (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
