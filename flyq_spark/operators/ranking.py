"""Distributed total-order ranking — global AND grouped row_number,
exact NTILE, and prefix sums without a data-sized single-key sort.

The naive shapes this module replaces:

- ``row_number()/ntile()/sum() OVER (ORDER BY ...)`` with no PARTITION
  BY compiles to one Exchange SinglePartition + one sort task holding
  the entire input — fine at sf0.01, a straggler/OOM at 100 TB.
- the same window ``PARTITION BY group`` where ``group`` has
  constant cardinality (event_type ≈ 5 values, source, lang) is the
  identical disease divided by a small constant: 5 tasks each sorting
  N/5 rows. Low-cardinality-group ranking needs the grouped variants
  here, not a group-keyed window.

The scalable shape is the classic range-partitioned rank:

1. ``repartitionByRange(P, *group, *order)`` — each output partition
   owns a contiguous slice of the (group, order) total order (one
   full-data shuffle, the same volume a global sort would move, but
   into P parallel tasks; a group's rows are contiguous WITHIN each
   partition, and a group larger than one range spans consecutive
   partitions — no single task ever holds a whole hot group).
2. ``sortWithinPartitions`` — P parallel sorts of ~N/P rows, then a
   per-row local position: ``monotonically_increasing_id()`` for
   row_number (id − min(id) over the (partition, group) cell IS the
   0-based local rank — ids are consecutive within a task), or an
   Arrow ``mapInPandas`` streaming cumulative-sum kernel for prefix
   sums (zero extra shuffle — a window PARTITIONED BY the range id
   would hash-exchange the full data a second time just to regroup
   what the range exchange already co-located).
3. a per-(range-partition, group) offset table — a ≤(P + G)-row
   aggregate with map-side combine — is cumulated in range order and
   broadcast back; global value = group offset + local value.

The stamped/cumsum'd rows are lazily ``localCheckpoint``-ed before
fan-out: the offset aggregate and the final join are TWO consumers of
the same partitioning, and without materialization their subtrees can
compile to independently-sampled RangePartitioners whose boundaries
disagree — offsets from exchange A applied to rows of exchange B
would corrupt ranks silently. The checkpoint makes the single-exchange
claim structural instead of an exchange-reuse accident: exactly one
data-sized exchange runs, its result is written once to executor-local
storage, and every consumer reads those exact rows.

Offset-table windows order by ``_gpid`` and partition by ``_gg_*``
group-key copies — both marker prefixes are auto-allowed by the plan
audit because those tables are bounded by cluster configuration +
group count, never by data volume.

Group-cardinality regime: the grouped variants broadcast a
≤(P + G)-row offset table, so they are built for HUMAN-SCALE group
counts (sources, event types, cohorts — the low-cardinality keys that
make plain group-keyed windows straggle). For millions of small
groups the plain ``Window.partitionBy(group)`` is already
well-distributed and is the right tool.

Determinism: output values depend only on the TOTAL order (callers
must pass a tie-broken order — e.g. append the primary key — unless
the downstream use is tie-insensitive, like min-rank-per-value), so
the sampled range boundaries cannot change results.

localCheckpoint LIFECYCLE: every primitive call checkpoints its
stamped rows (and callers may checkpoint inputs), and those RDDs are
NEVER unpersisted — executor-local storage grows with the number of
calls in the session. That is the right trade for gate/bench/batch
sessions (bounded call counts, storage reclaimed at session exit), and
the WRONG one inside a long-lived Structured Streaming query: a sink
invoking these primitives per micro-batch leaks one checkpoint per
batch forever. The streaming sinks (flyq_spark/streaming/sink.py) must
stay off this module — enforced by
tests/test_plan_audit.py::test_streaming_sinks_stay_off_ranking_primitives.
A long-lived NON-streaming session that needs these repeatedly should
recycle its SparkSession (or call
``spark.sparkContext._jsc.getPersistentRDDs()`` cleanup) between
rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# marker prefix for group-key copies in offset tables; windows whose
# partition keys all carry this prefix are the bounded offset-table
# class in the plan audit (tests/test_plan_audit.py), like _gpid
GROUP_MARKER = "_gg_"


def _range_partitioned(
    df: DataFrame, num_partitions: int | None, cols: list[Column]
) -> DataFrame:
    """The primitive's one data-sized exchange. With ``num_partitions``
    unset (the default), the shuffle is planned WITHOUT a pinned count
    (origin REPARTITION_BY_COL), so AQE's partition coalescing sizes
    the reduce side from the actual shuffle bytes
    (advisoryPartitionSizeInBytes) instead of a constant — tiny inputs
    collapse to a few tasks, huge ones keep the full conf'd width
    (r13, guide §2.2 "fewer, larger reduce partitions", scale-adaptive
    rather than tuned to either local mode or the cluster). Coalescing
    merges ADJACENT reduce partitions, so the range order across
    partitions — everything the offset math relies on — is preserved.
    An explicit ``num_partitions`` pins the count exactly as before."""
    if num_partitions is None:
        return df.repartitionByRange(*cols)
    return df.repartitionByRange(int(num_partitions), *cols)


def _marks(group_cols: list[str]) -> list[str]:
    return [f"{GROUP_MARKER}{i}" for i in range(len(group_cols))]


def _attach_offsets(local: DataFrame, offs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Broadcast-join the ≤(P+G)-row offset table back onto the stamped
    rows: equality on the range-partition id plus NULL-SAFE equality on
    each group key (a NULL group key is a real group — a plain ON
    clause would silently drop its rows)."""
    offs = offs.withColumnRenamed("_gpid", "_ogpid")
    cond = local["_gpid"] == offs["_ogpid"]
    for c, m in zip(group_cols, _marks(group_cols)):
        cond = cond & local[c].eqNullSafe(offs[m])
    return local.join(F.broadcast(offs), on=cond).drop(
        "_ogpid", *_marks(group_cols)
    )


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Dense 1-based row_number over ``order`` WITHIN each group of
    ``group_cols`` (pass ``[]`` for a single global group) without a
    group-keyed sort task: the scalable replacement for
    ``row_number() OVER (PARTITION BY low_card_group ORDER BY ...)``.
    ``order`` must be a total order within each group (include a
    unique tiebreak column). Adds ``rank_col`` (long); with
    ``total_col`` set, also each row's group row count.

    ``materialize`` (default on) lazily localCheckpoints the INPUT
    first: ``repartitionByRange`` runs a sampling job over its child
    to pick boundaries — without materialization an expensive upstream
    (often a full-table aggregate) computes once for the sampler and
    once for the exchange. Pass ``materialize=False`` only when the
    input is itself a trivially-rescannable scan. The stamped rows are
    ALWAYS lazily checkpointed (see module docstring: that is what
    makes offset/row consistency structural), so the data moves
    through exactly one exchange either way.
    """
    if materialize:
        df = df.localCheckpoint(eager=False)
    gcols = [F.col(c) for c in group_cols]
    # monotonically_increasing_id = (partition id << 33) | per-task row
    # counter: consecutive within a task in row order, so after the
    # in-partition sort (group first, then order), a (partition, group)
    # cell's rows are contiguous and (_gmid - min(_gmid)) is the
    # 0-based local rank. Ranks depend only on row POSITION, so neither
    # boundary sampling nor the id's cross-partition gaps can change
    # results.
    local = (
        _range_partitioned(df, num_partitions, [*gcols, *order])
        .sortWithinPartitions(*gcols, *order)
        .withColumn("_gpid", F.spark_partition_id())
        .withColumn("_gmid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    marks = _marks(group_cols)
    counts = local.groupBy(
        F.col("_gpid"), *[F.col(c).alias(m) for c, m in zip(group_cols, marks)]
    ).agg(F.count(F.lit(1)).alias("_gn"), F.min("_gmid").alias("_gmin"))
    # range partition ids are ordered by the range boundaries, so
    # cumulating counts in _gpid order within each group walks that
    # group's total order; these windows' input is the ≤(P+G)-row
    # offset table — bounded by cluster configuration + group count,
    # never by data (the plan audit's _gpid/_gg_* marker class)
    w_cum = (
        Window.partitionBy(*marks)
        .orderBy("_gpid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = (
        Window.partitionBy(*marks)
        .orderBy("_gpid")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # NOTE (r13, measured): do NOT localCheckpoint this offset table.
    # The static plan shows the subtree replayed per consumer of the
    # ranked output (mad_outliers: 8 stamped-checkpoint scans, 40
    # exchanges), but AQE's runtime stage reuse already dedups the
    # identical exchange stages; an explicit checkpoint only added
    # store/read job waves (mad_outliers 2.34 s -> 2.49 s, ks_by_group
    # 2.08 s -> 2.77 s at sf0.1).
    offs = counts.select(
        "_gpid",
        *marks,
        "_gmin",
        F.coalesce(F.sum("_gn").over(w_cum), F.lit(0)).alias("_goff"),
        F.sum("_gn").over(w_tot).alias("_gtot"),
    )
    out = (
        _attach_offsets(local, offs, group_cols)
        .withColumn(
            rank_col,
            (F.col("_goff") + F.col("_gmid") - F.col("_gmin") + 1).cast("long"),
        )
        .drop("_gpid", "_gmid", "_gmin", "_goff")
    )
    if total_col is not None:
        return out.withColumnRenamed("_gtot", total_col)
    return out.drop("_gtot")


def global_row_number(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Dense 1-based GLOBAL row_number over ``order`` (a total order —
    include a unique tiebreak column) without a single-partition sort:
    :func:`grouped_row_number` with no group columns."""
    return grouped_row_number(
        df,
        [],
        order,
        rank_col=rank_col,
        total_col=total_col,
        num_partitions=num_partitions,
        materialize=materialize,
    )


def _ntile_bucket(t: int) -> Column:
    """Exact NTILE(t) bucket from a 1-based rank ``_flyq_nr`` and a
    total ``_flyq_nt``: with q, rem = divmod(N, t), the first ``rem``
    buckets hold q+1 rows and the rest hold q — bucket sizes differ by
    at most one, larger buckets first, identical to the SQL window
    function for any N (including N < t, where q=0 and bucket = rank).
    All-integer arithmetic, so the result is hash-identical to
    ``F.ntile`` on every engine. The greatest(...,1) guards ANSI
    div-by-zero on the q=0 branch, which is unreachable (rank <= N =
    head when q=0) but still evaluated."""
    return F.when(
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


def grouped_ntile(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    n_tiles: int,
    out_col: str,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (PARTITION BY *group_cols ORDER BY
    *order)`` semantics from the distributed grouped rank — the
    scalable replacement for NTILE windows keyed by a
    constant-cardinality column. ``order`` must be a total order
    within each group (unique tiebreak) for the segmentation to be
    reproducible."""
    t = int(n_tiles)
    if t < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    ranked = grouped_row_number(
        df,
        group_cols,
        order,
        rank_col="_flyq_nr",
        total_col="_flyq_nt",
        num_partitions=num_partitions,
        materialize=materialize,
    )
    return ranked.withColumn(out_col, _ntile_bucket(t).cast("int")).drop(
        "_flyq_nr", "_flyq_nt"
    )


def ntile_exact(
    df: DataFrame,
    order: list[Column],
    n_tiles: int,
    out_col: str,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact GLOBAL ``NTILE(n_tiles) OVER (ORDER BY *order)``:
    :func:`grouped_ntile` with no group columns."""
    return grouped_ntile(
        df,
        [],
        order,
        n_tiles,
        out_col,
        num_partitions=num_partitions,
        materialize=materialize,
    )


_PREFIX_OPS = ("sum", "max", "min")


def _cumagg_kernel(group_cols: list[str], specs: list[tuple[str, str]]):
    """Arrow mapInPandas kernel: streaming per-partition running
    aggregates (cumsum / cummax / cummin per ``specs`` = [(name, op)])
    of the ``_gx_{name}`` columns into ``_gl_{name}``, resetting at
    group boundaries. Input partitions are sorted by (group, order),
    so a group change is monotone within a partition and only the LAST
    group of a batch can continue into the next batch — one carry
    vector + one carry key is the entire cross-batch state. Runs
    inside the range-exchange output partitions: zero extra shuffle."""

    def key_at(pdf, i):
        import pandas as pd

        return tuple(
            None if pd.isna(v) else v
            for v in (pdf.iloc[i][c] for c in group_cols)
        )

    def combine(op, acc, carry):
        import numpy as np

        if op == "sum":
            return acc + carry
        if op == "max":
            return np.maximum(acc, carry)
        return np.minimum(acc, carry)

    def fn(batches):
        carry = None  # running aggregate of the open (trailing) group
        carry_key = None
        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            if group_cols:
                keys = pdf[list(group_cols)]
                prev = keys.shift()
                changed = (
                    keys.ne(prev) & ~(keys.isna() & prev.isna())
                ).any(axis=1)
                changed.iloc[0] = True
                seg = changed.cumsum()
            else:
                seg = None
            cums = {}
            for n, op in specs:
                col = pdf[f"_gx_{n}"].astype("int64")
                grouped = col.groupby(seg) if group_cols else col
                if op == "sum":
                    cums[n] = grouped.cumsum()
                elif op == "max":
                    cums[n] = grouped.cummax()
                else:
                    cums[n] = grouped.cummin()
            first_key = key_at(pdf, 0) if group_cols else ()
            carried = carry is not None and first_key == carry_key
            carry_in = carry
            if carried:
                if group_cols:
                    mask = (seg == 1).to_numpy()
                    for j, (n, op) in enumerate(specs):
                        cums[n].loc[mask] = combine(
                            op, cums[n].loc[mask], carry[j]
                        )
                else:
                    for j, (n, op) in enumerate(specs):
                        cums[n] = combine(op, cums[n], carry[j])
            # int64 wrap guard for the sum paths: pandas/numpy cumsum
            # WRAPS silently where the Spark window SUM this kernel
            # replaced crashed under ANSI — crash-don't-wrap is the
            # repo's integer discipline. Cheap conservative bound
            # first (|carry| + Σ|batch|, in float64 so it cannot wrap
            # itself): if that cannot reach the int64 range, no prefix
            # inside the batch can either. Only a batch that CAN reach
            # it pays the exact Python-int re-walk.
            import numpy as np

            for j, (n, op) in enumerate(specs):
                if op != "sum":
                    continue
                raw = pdf[f"_gx_{n}"].to_numpy()
                bound = float(np.abs(raw.astype("float64")).sum())
                if carried:
                    bound += abs(float(carry_in[j]))
                if bound < float(2**62):
                    continue
                sv = seg.to_numpy() if group_cols else None
                run = int(carry_in[j]) if carried else 0
                for i in range(n_rows):
                    if sv is not None and i > 0 and sv[i] != sv[i - 1]:
                        run = 0
                    run += int(raw[i])
                    if not (-(2**63) <= run < 2**63):
                        raise OverflowError(
                            f"prefix sum of {n!r} exceeds int64 at batch "
                            f"row {i} (running value {run}); rescale the "
                            "summand upstream"
                        )
            carry = [int(cums[n].iloc[-1]) for n, _ in specs]
            carry_key = key_at(pdf, n_rows - 1) if group_cols else ()
            for n, _ in specs:
                pdf[f"_gl_{n}"] = cums[n].to_numpy()
            yield pdf

    return fn


def grouped_prefix_agg(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    aggs: dict[str, tuple[str, Column]],
    totals: dict[str, str] | None = None,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Running (inclusive) prefix aggregates over a TOTAL order within
    each group (``[]`` = one global group): the distributed
    cumulative primitive behind CDFs, running totals, exact KS
    statistics, rank-from-counted-distinct, and running-watermark /
    running-extreme analyses. ``aggs`` maps an output name to
    ``(op, expr)`` with op ∈ {"sum", "max", "min"}; each output column
    holds op(expr) over the rows of the same group at-or-before this
    row in ``order``.

    NULL handling: "sum" coalesces NULL expr values to 0 (window SUM
    would skip them identically except for an all-NULL prefix, where
    it yields NULL — callers feeding counts never see the
    difference). "max"/"min" REQUIRE non-null expressions (coalesce
    upstream) — a running extreme of a NULL has no sensible identity
    and the kernel fails loudly rather than guessing.

    ``totals`` optionally maps an agg name → an output column carrying
    that agg's whole-group value on every row — free to attach here
    (the offset table already aggregates per-group), where a separate
    groupBy + join-back would cost another pass.

    Plan shape: ONE data-sized exchange (the range exchange), P
    parallel in-partition sorts, an Arrow ``mapInPandas`` streaming
    cumsum/cummax/cummin (no second exchange — a window PARTITIONED BY
    the range id would re-shuffle the co-located rows), a ≤(P+G)-row
    offset aggregate off the lazily checkpointed rows, broadcast back;
    cross-partition combination is op-consistent (+ / greatest /
    least, with a NULL offset for each group's first range partition).
    """
    if materialize:
        df = df.localCheckpoint(eager=False)
    names = list(aggs)
    specs = []
    for n in names:
        op, _ = aggs[n]
        if op not in _PREFIX_OPS:
            raise ValueError(f"op for {n!r} must be one of {_PREFIX_OPS}: {op}")
        specs.append((n, op))
    _AGG = {"sum": F.sum, "max": F.max, "min": F.min}
    exprs = [
        (
            F.coalesce(aggs[n][1].cast("long"), F.lit(0))
            if aggs[n][0] == "sum"
            else aggs[n][1].cast("long")
        ).alias(f"_gx_{n}")
        for n in names
    ]
    gcols = [F.col(c) for c in group_cols]
    ranged = (
        _range_partitioned(df.select("*", *exprs), num_partitions, [*gcols, *order])
        .sortWithinPartitions(*gcols, *order)
        .withColumn("_gpid", F.spark_partition_id())
    )
    out_schema = T.StructType(
        list(ranged.schema.fields)
        + [T.StructField(f"_gl_{n}", T.LongType()) for n in names]
    )
    local = ranged.mapInPandas(
        _cumagg_kernel(list(group_cols), specs), schema=out_schema
    ).localCheckpoint(eager=False)
    marks = _marks(group_cols)
    grp_totals = local.groupBy(
        F.col("_gpid"), *[F.col(c).alias(m) for c, m in zip(group_cols, marks)]
    ).agg(*[_AGG[op](f"_gx_{n}").alias(f"_gt_{n}") for n, op in specs])
    w_cum = (
        Window.partitionBy(*marks)
        .orderBy("_gpid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = (
        Window.partitionBy(*marks)
        .orderBy("_gpid")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    total_cols = []
    if totals:
        total_cols = [
            _AGG[dict(specs)[n]](f"_gt_{n}").over(w_tot).cast("long").alias(out)
            for n, out in totals.items()
        ]
    off_cols = []
    for n, op in specs:
        if op == "sum":
            off_cols.append(
                F.coalesce(F.sum(f"_gt_{n}").over(w_cum), F.lit(0)).alias(
                    f"_go_{n}"
                )
            )
        else:
            # NULL for the group's first range partition: greatest/least
            # ignore NULL operands, so the identity element is free
            off_cols.append(_AGG[op](f"_gt_{n}").over(w_cum).alias(f"_go_{n}"))
    offs = grp_totals.select("_gpid", *marks, *off_cols, *total_cols)
    out = _attach_offsets(local, offs, group_cols)
    for n, op in specs:
        if op == "sum":
            combined = F.col(f"_go_{n}") + F.col(f"_gl_{n}")
        elif op == "max":
            combined = F.greatest(F.col(f"_go_{n}"), F.col(f"_gl_{n}"))
        else:
            combined = F.least(F.col(f"_go_{n}"), F.col(f"_gl_{n}"))
        out = out.withColumn(n, combined.cast("long"))
    return out.drop(
        "_gpid",
        *[f"_gx_{n}" for n in names],
        *[f"_gl_{n}" for n in names],
        *[f"_go_{n}" for n in names],
    )


def grouped_prefix_sums(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    sums: dict[str, Column],
    totals: dict[str, str] | None = None,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Running (inclusive) prefix SUMS within each group:
    :func:`grouped_prefix_agg` with op="sum" for every column."""
    return grouped_prefix_agg(
        df,
        group_cols,
        order,
        {n: ("sum", expr) for n, expr in sums.items()},
        totals=totals,
        num_partitions=num_partitions,
        materialize=materialize,
    )


def global_prefix_sums(
    df: DataFrame,
    order: list[Column],
    sums: dict[str, Column],
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Running (inclusive) prefix sums over a GLOBAL total order:
    :func:`grouped_prefix_sums` with no group columns — one data-sized
    exchange, Arrow local cumsums, broadcast ≤P-row offset table."""
    return grouped_prefix_sums(
        df,
        [],
        order,
        sums,
        num_partitions=num_partitions,
        materialize=materialize,
    )
