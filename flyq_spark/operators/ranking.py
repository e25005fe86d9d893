"""Distributed total-order ranking — global row_number and exact NTILE
without a single-partition sort.

The naive shape (``row_number()/ntile() OVER (ORDER BY ...)`` with no
PARTITION BY) compiles to one Exchange SinglePartition + one sort task
holding the entire input: fine at sf0.01, a straggler/OOM on a
billion-row per-user aggregate at 100 TB. The scalable shape used here
is the classic range-partitioned rank:

1. ``repartitionByRange(P, *order)`` — each output partition owns a
   contiguous slice of the total order (one full-data shuffle, the
   same volume a global sort would move, but into P parallel tasks).
2. ``sortWithinPartitions(*order)`` — P parallel sorts of ~N/P rows;
   then ``monotonically_increasing_id()`` stamps each row. Within a
   task the id is the per-partition row counter (partition id in the
   high bits), so ``id - min(id over the partition)`` IS the 0-based
   local rank in sort order — no second data-sized exchange, where a
   window PARTITIONED BY the range id would hash-shuffle the full
   data a second time just to regroup what the range exchange already
   co-located.
3. per-range (min_id, count) — a ≤P-row aggregate with map-side
   combine — is cumulated into rank offsets; global rank =
   offset + local rank, attached by a broadcast join.

The ONLY partition-less window in the resulting plan runs over that
≤P-row offset table — bounded by cluster configuration, never by data
(this is the "shard-offset table" class in the plan audit's
allowlist). Total data motion: ONE full-data shuffle (the range
exchange), full stop.

Determinism: output values depend only on the TOTAL order (callers
must pass a tie-broken order — e.g. append the primary key), never on
where the range boundaries land, so the sampled boundaries cannot
change results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Dense 1-based global row_number over ``order`` (which must be a
    TOTAL order — include a unique tiebreak column) without a
    single-partition sort. Adds ``rank_col`` (long); with
    ``total_col`` set, also the total row count on every row.

    ``materialize`` (default on) lazily localCheckpoints the input
    first: ``repartitionByRange`` runs a SAMPLING job over its child to
    pick boundaries, and the rank needs the data in two branches (rows
    + per-range counts) — without materialization the upstream plan
    (often a full-table aggregate) recomputes up to three times per
    call, and CHAINED calls (multi-metric NTILE) compound that. The
    checkpoint costs one executor-local write of the input — the same
    order as the range shuffle itself — and truncates lineage so every
    branch reads the materialized rows. Pass ``materialize=False``
    only when the input is itself a trivially-rescannable scan."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if materialize:
        df = df.localCheckpoint(eager=False)
    # monotonically_increasing_id = (partition id << 33) | per-task row
    # counter: consecutive within a task in row order, so after the
    # in-range sort, (_gmid - min(_gmid)) is the 0-based local rank.
    # Ranks depend only on row POSITION within the range (not on the
    # raw id values), and the final rank only on the total order, so
    # neither boundary sampling nor the id's cross-partition gaps can
    # change results.
    local = (
        df.repartitionByRange(num_partitions, *order)
        .sortWithinPartitions(*order)
        .withColumn("_gpid", F.spark_partition_id())
        .withColumn("_gmid", F.monotonically_increasing_id())
    )
    # ≤ num_partitions rows, map-side combined before the tiny shuffle
    counts = local.groupBy("_gpid").agg(
        F.count(F.lit(1)).alias("_gn"), F.min("_gmid").alias("_gmin")
    )
    # range partition ids are ordered by the range boundaries, so
    # cumulating counts in _gpid order walks the total order; this
    # window's input is the ≤P-row side table — bounded by cluster
    # configuration, never by data
    w_cum = Window.orderBy("_gpid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("_gpid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "_gpid",
        "_gmin",
        F.coalesce(F.sum("_gn").over(w_cum), F.lit(0)).alias("_goff"),
        F.sum("_gn").over(w_tot).alias("_gtot"),
    )
    out = (
        local.join(F.broadcast(offs), on="_gpid")
        .withColumn(
            rank_col,
            (F.col("_goff") + F.col("_gmid") - F.col("_gmin") + 1).cast("long"),
        )
        .drop("_gpid", "_gmid", "_gmin", "_goff")
    )
    if total_col is not None:
        out = out.withColumnRenamed("_gtot", total_col)
    else:
        out = out.drop("_gtot")
    return out


def ntile_exact(
    df: DataFrame,
    order: list[Column],
    n_tiles: int,
    out_col: str,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact ``NTILE(n_tiles) OVER (ORDER BY *order)`` semantics from
    the distributed rank: with N rows and q, rem = divmod(N, t), the
    first ``rem`` buckets hold q+1 rows and the rest hold q — bucket
    sizes differ by at most one, larger buckets first, identical to
    the SQL window function for any N (including N < t, where q=0 and
    bucket = rank). All-integer arithmetic, so the result is
    hash-identical to ``F.ntile`` on every engine.

    ``order`` must be a total order (unique tiebreak) for the
    segmentation to be reproducible."""
    t = int(n_tiles)
    if t < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    ranked = global_row_number(
        df,
        order,
        rank_col="_flyq_nr",
        total_col="_flyq_nt",
        num_partitions=num_partitions,
        materialize=materialize,
    )
    # q = N DIV t, rem = N % t; head = rem*(q+1) rows fill the big
    # buckets. ceil(a/b) = (a+b-1) DIV b on non-negatives; the
    # greatest(...,1) guards ANSI div-by-zero on the q=0 branch, which
    # is unreachable (rank <= N = head when q=0) but still evaluated.
    bucket = F.when(
        F.expr(f"_flyq_nr <= (_flyq_nt % {t}) * ((_flyq_nt DIV {t}) + 1)"),
        F.expr(f"(_flyq_nr + (_flyq_nt DIV {t})) DIV ((_flyq_nt DIV {t}) + 1)"),
    ).otherwise(
        F.expr(
            f"(_flyq_nt % {t}) + "
            f"(_flyq_nr - (_flyq_nt % {t}) * ((_flyq_nt DIV {t}) + 1) "
            f"+ greatest(_flyq_nt DIV {t}, 1) - 1) "
            f"DIV greatest(_flyq_nt DIV {t}, 1)"
        )
    )
    return (
        ranked.withColumn(out_col, bucket.cast("int"))
        .drop("_flyq_nr", "_flyq_nt")
    )

def global_prefix_sums(
    df: DataFrame,
    order: list[Column],
    sums: dict[str, Column],
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Running (inclusive) prefix sums over a TOTAL order without a
    single-partition window — the distributed cumulative-sum primitive
    (CDFs, running totals, exact KS statistics). For each name→expr in
    ``sums``, adds a ``name`` column holding sum(expr) over all rows
    at-or-before this row in ``order``.

    Same shape as :func:`global_row_number`: one range exchange, P
    parallel in-partition sorts + local cumsums (a window PARTITIONED
    by the range id), and a broadcast ≤P-row offset table of
    per-partition totals cumulated in range order — the only
    partition-less window in the plan runs over that offset table
    (the plan audit's ``_gpid`` class)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if materialize:
        df = df.localCheckpoint(eager=False)
    names = list(sums)
    exprs = [sums[n].cast("long").alias(f"_gx_{n}") for n in names]
    ranged = (
        df.select("*", *exprs)
        .repartitionByRange(num_partitions, *order)
        .withColumn("_gpid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("_gpid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged
    for n in names:
        local = local.withColumn(f"_gl_{n}", F.sum(f"_gx_{n}").over(w_local))
    totals = ranged.groupBy("_gpid").agg(
        *[F.sum(f"_gx_{n}").alias(f"_gt_{n}") for n in names]
    )
    w_cum = Window.orderBy("_gpid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "_gpid",
        *[
            F.coalesce(F.sum(f"_gt_{n}").over(w_cum), F.lit(0)).alias(f"_go_{n}")
            for n in names
        ],
    )
    out = local.join(F.broadcast(offs), on="_gpid")
    for n in names:
        out = out.withColumn(n, (F.col(f"_go_{n}") + F.col(f"_gl_{n}")).cast("long"))
    return out.drop(
        "_gpid", *[f"_gx_{n}" for n in names],
        *[f"_gl_{n}" for n in names], *[f"_go_{n}" for n in names]
    )
