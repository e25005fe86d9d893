"""Missing-value imputation by group statistic [EXT].

The data-prep staple: fill a column's NULLs with a statistic of the
non-null values in the row's group — median (robust default), mean, or
mode. All three statistics are computed with the repo's exact-integer
discipline (no collect_list, no approx unless asked):

- ``median``: exact LOWER median via rank selection over the DISTINCT
  (group, value) counts with per-group distributed prefix sums
  (operators/ranking.py) — no group-keyed sort task, no group-sized
  driver array. Matches DuckDB ``quantile_disc(0.5)``.
- ``mean``: integer mean ``div(sum, cnt)`` (truncating IntegralDivide)
  for integral columns — callers wanting fractional means scale to
  cents upstream, keeping the result hash-stable across engines.
- ``mode``: most frequent value, ties broken to the SMALLEST value
  (deterministic — an unspecified tie-break is a silent
  nondeterminism at any scale).

Plan shape: one statistics frame per call (group-key-sized), joined
back on the group key — AQE broadcasts it when small; the fact side
never shuffles for mean/mode (their stats are pure groupBys). Median
pre-aggregates to (key, value, count) itself, so a single giant group
costs a balanced range exchange of its distinct values, never one
sort task.

The reference has no NULL semantics at all (values are opaque bytes);
this is [EXT] data-platform surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STRATEGIES = ("median", "mean", "mode")


def group_statistic(
    df: DataFrame,
    keys: tuple[str, ...],
    col: str,
    strategy: str = "median",
) -> DataFrame:
    """Per-group fill statistic over NON-NULL values: one row per group
    present in ``df``, column ``_fill`` (NULL for all-NULL groups).

    Group-cardinality regime (median only): the rank selection rides
    the grouped prefix-sum primitive, which force-broadcasts a
    ≤(P + |groups|)-row offset table — built for LOW-cardinality keys
    (sources, event types, cohorts) where a group-keyed window
    straggles. For millions of tiny groups (e.g. per-user medians)
    that broadcast is the bottleneck; use a plain
    ``Window.partitionBy(*keys)`` percentile there instead (same
    regime note as operators/ranking.py). mean/mode are pure groupBys
    and have no such regime split."""
    if strategy not in _STRATEGIES:
        raise ValueError(
            f"strategy must be one of {_STRATEGIES}, got {strategy!r}"
        )
    nn = df.where(F.col(col).isNotNull())
    if strategy == "mean":
        return (
            df.groupBy(*keys)
            .agg(
                F.sum(col).cast("long").alias("_s"),
                F.count(col).cast("long").alias("_c"),
            )
            .select(
                *keys,
                # guard the all-NULL group: div-by-zero raises under ANSI
                F.when(
                    F.col("_c") > 0,
                    F.call_function("div", F.col("_s"), F.col("_c")),
                ).alias("_fill"),
            )
        )
    if strategy == "mode":
        counted = nn.groupBy(*keys, col).agg(F.count("*").alias("_c"))
        # argmax by count, tie -> smallest value: min over (-count, value)
        return _restore_all_groups(
            counted.groupBy(*keys)
            .agg(F.min(F.struct((-F.col("_c")).alias("_nc"), F.col(col).alias("_v"))).alias("_m"))
            .select(*keys, F.col("_m._v").alias("_fill")),
            df,
            keys,
        )
    # median (exact, lower convention) — rank selection over the
    # DISTINCT (group, value) table: counted distinct + per-group
    # prefix sums (operators/ranking.py — no window keyed by the group
    # column, which sorts N/|groups| rows in one task when the group is
    # low-cardinality). The value at 1-based rank div(n+1, 2) is the
    # unique distinct value whose rank interval (cum−cnt, cum] covers
    # the target.
    from flyq_spark.operators.ranking import grouped_prefix_sums

    counted = nn.groupBy(*keys, col).agg(F.count("*").cast("long").alias("_c"))
    cums = grouped_prefix_sums(
        counted,
        list(keys),
        [F.col(col).asc()],
        {"_cum": F.col("_c")},
        totals={"_cum": "_n"},
    )
    target = F.call_function(
        "div", F.col("_n") + F.lit(1).cast("long"), F.lit(2).cast("long")
    )
    med = (
        cums.where(
            (F.col("_cum") - F.col("_c") < target) & (target <= F.col("_cum"))
        )
        .groupBy(*keys)
        .agg(F.min(col).alias("_fill"))
    )
    return _restore_all_groups(med, df, keys)


def _restore_all_groups(
    stats: DataFrame, df: DataFrame, keys: tuple[str, ...]
) -> DataFrame:
    """Re-attach groups whose values were all NULL (absent from the
    non-null statistics) with ``_fill`` NULL — null-SAFE on the group
    keys: a NULL group key is a real group (its rows were aggregated
    together upstream), and the plain on-name right join this replaces
    silently dropped such a group's computed statistic."""
    marks = [f"_sg_{i}" for i in range(len(keys))]
    st = stats.select(
        *[F.col(k).alias(m) for k, m in zip(keys, marks)], "_fill"
    )
    all_groups = df.select(*keys).distinct()
    cond = None
    for k, m in zip(keys, marks):
        c = F.col(m).eqNullSafe(F.col(k))
        cond = c if cond is None else cond & c
    # group-sized side broadcast explicitly: behind the aliased
    # null-safe condition the planner has no size estimate and would
    # fall back to sort-merge
    return all_groups.join(F.broadcast(st), cond, "left").drop(*marks)


def impute_group_stat(
    df: DataFrame,
    keys: tuple[str, ...],
    col: str,
    strategy: str = "median",
    flag_col: str | None = None,
) -> DataFrame:
    """Fill ``col``'s NULLs with the group ``strategy`` statistic; rows
    in groups with no non-null value stay NULL. Adds a boolean
    ``flag_col`` (default ``{col}_imputed``) marking filled rows —
    imputation without provenance poisons downstream analysis
    silently. All other columns pass through unchanged."""
    flag = flag_col or f"{col}_imputed"
    stats = group_statistic(df, keys, col, strategy)
    # null-safe on the group keys: rows whose group key is NULL belong
    # to a real group with a real statistic (the plain on-name join
    # this replaces left them unfilled); stats keys are aliased to
    # marker names first — stats shares df's lineage, and a direct
    # attribute-based self-join condition is ambiguous.
    marks = [f"_sg_{i}" for i in range(len(keys))]
    st = stats.select(
        *[F.col(k).alias(m) for k, m in zip(keys, marks)], "_fill"
    )
    cond = None
    for k, m in zip(keys, marks):
        c = F.col(k).eqNullSafe(F.col(m))
        cond = c if cond is None else cond & c
    out = df.join(F.broadcast(st), cond, "left").drop(*marks)
    filled = F.coalesce(F.col(col), F.col("_fill"))
    was = F.col(col).isNull() & F.col("_fill").isNotNull()
    return out.select(
        *[c for c in df.columns if c != col],
        filled.alias(col),
        was.alias(flag),
    )


def winsorize(
    df: DataFrame,
    keys: tuple[str, ...],
    value_col: str,
    lo_permille: int = 10,
    hi_permille: int = 990,
) -> DataFrame:
    """Per-group winsorization — clamp an integer metric to its exact
    per-group [lo‰, hi‰] percentile bounds (the robust-preprocessing
    counterpart of ``robust_outliers``: instead of reporting the tails,
    cap them, the standard treatment before training on heavy-tailed
    quality/engagement signals).

    Percentiles use the same inverted-CDF integer-rank definition as
    ``length_percentiles``: the value at 1-based rank ceil(p·n)
    ascending — a pure rank selection both engines compute identically
    (no interpolation, no floats). NULL values pass through unclamped
    (nothing to cap) and are excluded from rank computation.

    Plan: the rank selection runs over the DISTINCT (group, value)
    table — one (group, value) groupBy + the per-group distributed
    prefix-sum primitive (operators/ranking.py; no rank window keyed by
    the group column, which is one N/|groups|-row sort task when the
    group is low-cardinality) — then the |groups|-row bounds table
    broadcast-attaches. The value at target rank r is the distinct
    value whose rank interval (cum−cnt, cum] covers r. Appends
    ``lo_bound``, ``hi_bound``, ``<value_col>_w`` (clamped), and
    ``was_clamped``.

    Group-cardinality regime: the grouped primitive force-broadcasts a
    ≤(P + |groups|)-row offset table — right for LOW-cardinality keys;
    for millions of tiny groups use a plain group-keyed window
    percentile instead (operators/ranking.py regime note)."""
    from flyq_spark.operators.ranking import grouped_prefix_sums
    from flyq_spark.operators.util import exact_ceil_frac

    if not (0 < lo_permille <= hi_permille < 1000):
        raise ValueError(
            f"need 0 < lo <= hi < 1000 permille, got {lo_permille}, {hi_permille}"
        )
    v = F.col(value_col)
    counted = (
        df.where(v.isNotNull())
        .select(*keys, v.alias("_v"))
        .groupBy(*keys, "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    cums = grouped_prefix_sums(
        counted,
        list(keys),
        [F.col("_v").asc()],
        {"_cum": F.col("_c")},
        totals={"_cum": "_n"},
    )
    lo_r = exact_ceil_frac(F.col("_n"), lo_permille / 1000)
    hi_r = exact_ceil_frac(F.col("_n"), hi_permille / 1000)
    covers = lambda r: (F.col("_cum") - F.col("_c") < r) & (r <= F.col("_cum"))  # noqa: E731
    bounds = cums.groupBy(*keys).agg(
        F.max(F.when(covers(lo_r), F.col("_v"))).cast("long").alias("lo_bound"),
        F.max(F.when(covers(hi_r), F.col("_v"))).cast("long").alias("hi_bound"),
    )
    # null-safe equality: a NULL group key is a real group (its rows
    # ranked together above); a plain ON-clause would never match it and
    # silently null out every v_w in that group
    cond = [df[c].eqNullSafe(bounds[c]) for c in keys]
    out = df.join(bounds, on=cond, how="left")
    for c in keys:
        out = out.drop(bounds[c])
    clamped = F.when(v.isNull(), F.lit(None).cast("long")).otherwise(
        F.greatest(F.least(v, F.col("hi_bound")), F.col("lo_bound"))
    )
    return out.withColumn(f"{value_col}_w", clamped).withColumn(
        "was_clamped", v.isNotNull() & (F.col(f"{value_col}_w") != v)
    )


def rank_normalize(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    out_col: str = "rank_ppm",
) -> DataFrame:
    """Percentile-rank (quantile) normalization per group, exact
    integer ppm — the scale-free transform that makes quality scores
    from different sources comparable before mixing (a score of 7.3
    from model A and 0.61 from model B both become "better than X ppm
    of their own cohort").

    Definition: SQL percent_rank as exact integers —
    ``rank_ppm = (rank − 1) · 1,000,000 div (n − 1)`` with RANK ties
    sharing a value (and a single-row group pinned to 0). No float
    percent_rank appears, so results hash-check across engines.

    Scale shape: RANK assigns every row of the same (group, value) the
    same number, so it is computed on the DISTINCT (group, value)
    table — one (group, value) groupBy, per-group distributed prefix
    sums over the counts (operators/ranking.py; no rank window keyed by
    the group column, which is one N/|groups|-row sort task when the
    group is low-cardinality), then a (group, value) join back attaches
    the shared rank to every row. rank = cum − cnt + 1 (count of
    strictly-smaller values + 1) and n rides the prefix-sum offset
    table for free. NULL values pass through with NULL rank; NULL group
    keys are a real group (null-safe join back).

    Group-cardinality regime: the grouped primitive broadcasts a
    ≤(P + |groups|)-row offset table — built for the low-cardinality
    keys (sources, event types, cohorts) where a plain group-keyed
    window straggles. For MILLIONS of small groups the plain
    ``Window.partitionBy(group)`` rank is already well-distributed and
    is the right tool instead (same regime note as
    operators/ranking.py).
    """
    from flyq_spark.operators.ranking import grouped_prefix_sums

    counted = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_rnc"))
    )
    cums = grouped_prefix_sums(
        counted,
        list(group_cols),
        [F.col(value_col).asc()],
        {"_rncum": F.col("_rnc")},
        totals={"_rncum": "_rnn"},
    )
    rk = F.col("_rncum") - F.col("_rnc") + 1
    ppm = F.when(F.col("_rnn") <= 1, F.lit(0).cast("long")).otherwise(
        F.call_function(
            "div",
            (rk.cast("long") - 1) * F.lit(1_000_000).cast("long"),
            F.col("_rnn").cast("long") - 1,
        )
    )
    ranked = cums.select(
        *[F.col(c).alias(f"_rg_{i}") for i, c in enumerate(group_cols)],
        F.col(value_col).alias("_rv"),
        ppm.alias(out_col),
    )
    cond = F.col(value_col) == F.col("_rv")
    for i, c in enumerate(group_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"_rg_{i}"))
    return df.join(ranked, on=cond, how="left").drop(
        "_rv", *[f"_rg_{i}" for i in range(len(group_cols))]
    )

def quantile_bins(
    df: DataFrame,
    id_col: str,
    cols: dict[str, Column],
    n_bins: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Equal-frequency discretization (sklearn KBinsDiscretizer
    strategy='quantile', the feature-engineering staple): per listed
    column, every row gets its ``<name>_bin`` ∈ 1..n_bins with bucket
    populations differing by at most one — exact NTILE semantics over
    (value, id), so bucketing is reproducible on any engine and NULLs
    land in the LAST bucket (explicit asc_nulls_last).

    Scale shape: the input is checkpointed ONCE; each column is an
    INDEPENDENT range-partitioned exact-NTILE branch over a slim
    (id, value) projection (operators/ranking.py — no single-partition
    sort, no data-sized global window), joined back on the id. Cost is
    one input materialization + per column: one range exchange of the
    slim pair, the ranking primitive's own stamped-rows
    materialization (structural, see ranking.py), and one id-key join
    shuffle."""
    from flyq_spark.operators.ranking import ntile_exact

    base = df.localCheckpoint(eager=False)
    out = base
    for name, expr in cols.items():
        slim = base.select(F.col(id_col), expr.cast("long").alias("_qv"))
        binned = ntile_exact(
            slim,
            [F.col("_qv").asc_nulls_last(), F.col(id_col).asc()],
            n_bins,
            f"{name}_bin",
            num_partitions=num_partitions,
            materialize=False,
        )
        # null-keys-impossible: id_col is the row identity
        out = out.join(binned.select(id_col, f"{name}_bin"), on=id_col)
    return out

def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value: Column,
    id_col: str,
    n_quantiles: int = 100,
) -> DataFrame:
    """Group-wise quantile normalization (the batch-effect correction
    classic — microarray normalization, cross-source score calibration
    for corpus quality signals): every row's value is replaced by the
    POOLED distribution's value at the row's within-group quantile, so
    all groups end up with (approximately) the pooled distribution and
    cross-group comparisons stop rewarding the group with the easy
    grader.

    Integer-exact formulation: within-group quantile = exact NTILE
    rank q ∈ 1..n_quantiles over (value, id); the pooled reference for
    q is the LOWER exact quantile of the pooled values at fraction
    q/n_quantiles (inverted-CDF, rank ceil(q·N/n_quantiles)) — both
    sides pure integer rank arithmetic, reproducible on any engine.

    Scale shape: the within-group quantiles ride the range-partitioned
    grouped exact NTILE (operators/ranking.py — no window keyed by the
    group column, which is one N/|groups|-row sort task when the group
    is low-cardinality; NTILE is row-level by definition, ties split
    across buckets by id). The pooled reference needs only the value
    at t target RANKS, so it runs over the DISTINCT value counts — a
    distinct-sized prefix-sum pass, never a second data-sized
    exchange — and reduces to an n_quantiles-row broadcast table. The
    slim source is checkpointed once and feeds both branches."""
    from flyq_spark.operators.ranking import grouped_ntile, grouped_prefix_sums

    t = int(n_quantiles)
    if t < 1:
        raise ValueError(f"n_quantiles must be >= 1: {n_quantiles}")
    src = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        value.cast("long").alias("_v"),
    ).where(F.col("_v").isNotNull()).localCheckpoint(eager=False)
    ranked_in_group = grouped_ntile(
        src,
        ["_g"],
        [F.col("_v").asc(), F.col("_id").asc()],
        t,
        "_q",
        materialize=False,
    )
    # materialize=True (r13): the pooled counted table is an aggregation
    # (over the src checkpoint) — with materialize=False the range
    # sampler and the exchange each ran it, i.e. two aggregation passes
    # over src per call. The primitive's lazy input checkpoint runs it
    # once. (ranked_in_group above keeps materialize=False correctly:
    # its input IS the src checkpoint, re-read not recomputed.)
    pooled = grouped_prefix_sums(
        src.groupBy("_v").agg(F.count(F.lit(1)).cast("long").alias("_c")),
        [],
        [F.col("_v").asc()],
        {"_cum": F.col("_c")},
        totals={"_cum": "_n"},
    )
    # lower exact quantile at fraction q/t = value at rank
    # ceil(q*N/t). The distinct value with count c and cumulative
    # count cum holds ranks (cum−c, cum], so it is that target exactly
    # for the q in (floor((cum−c)t/N), floor(cum·t/N)] — disjoint
    # intervals that partition 1..t as cum walks the order, so each q
    # appears ONCE and the filter+explode emits exactly t rows (never
    # N*t): the reference table is built in one linear pass over the
    # DISTINCT value ranks.
    qhi = F.expr(f"(_cum * {t}) DIV _n")
    qlo = F.expr(f"((_cum - _c) * {t}) DIV _n")
    ref = (
        pooled.where(qhi > qlo)
        .select(
            F.explode(F.sequence(qlo + 1, qhi)).alias("_q"),
            F.col("_v").alias("_ref_v"),
        )
    )
    return (
        ranked_in_group.join(F.broadcast(ref), on="_q")
        .select(
            F.col("_g").alias(group_col),
            F.col("_id").alias(id_col),
            F.col("_v").alias("value_raw"),
            F.col("_q").cast("long").alias("quantile"),
            F.col("_ref_v").cast("long").alias("value_normalized"),
        )
    )
