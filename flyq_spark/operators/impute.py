"""Missing-value imputation by group statistic [EXT].

The data-prep staple: fill a column's NULLs with a statistic of the
non-null values in the row's group — median (robust default), mean, or
mode. All three statistics are computed with the repo's exact-integer
discipline (no collect_list, no approx unless asked):

- ``median``: exact LOWER median via rank-within-group window + count
  selection (the same scalable shape as the gate's
  median_order_by_segment — a group-sized driver array is the
  anti-pattern at scale). Matches DuckDB ``quantile_disc(0.5)``.
- ``mean``: integer mean ``div(sum, cnt)`` (truncating IntegralDivide)
  for integral columns — callers wanting fractional means scale to
  cents upstream, keeping the result hash-stable across engines.
- ``mode``: most frequent value, ties broken to the SMALLEST value
  (deterministic — an unspecified tie-break is a silent
  nondeterminism at any scale).

Plan shape: one statistics frame per call (group-key-sized), joined
back on the group key — AQE broadcasts it when small; the fact side
never shuffles for mean/mode (their stats are pure groupBys). Median's
window sorts WITHIN groups — for a pathological single giant group,
pre-aggregate to (key, value, count) first; documented, not hidden.

The reference has no NULL semantics at all (values are opaque bytes);
this is [EXT] data-platform surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_STRATEGIES = ("median", "mean", "mode")


def group_statistic(
    df: DataFrame,
    keys: tuple[str, ...],
    col: str,
    strategy: str = "median",
) -> DataFrame:
    """Per-group fill statistic over NON-NULL values: one row per group
    present in ``df``, column ``_fill`` (NULL for all-NULL groups)."""
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
        return (
            counted.groupBy(*keys)
            .agg(F.min(F.struct((-F.col("_c")).alias("_nc"), F.col(col).alias("_v"))).alias("_m"))
            .select(*keys, F.col("_m._v").alias("_fill"))
            .join(df.select(*keys).distinct(), list(keys), "right")
        )
    # median (exact, lower convention)
    w = Window.partitionBy(*keys).orderBy(col)
    ranked = nn.withColumn("_rk", F.row_number().over(w))
    counts = nn.groupBy(*keys).agg(F.count("*").alias("_n"))
    med = (
        ranked.join(counts, list(keys))
        .where(
            F.col("_rk")
            == F.call_function(
                "div", F.col("_n") + F.lit(1).cast("long"), F.lit(2).cast("long")
            )
        )
        .groupBy(*keys)
        .agg(F.min(col).alias("_fill"))
    )
    return med.join(df.select(*keys).distinct(), list(keys), "right")


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
    out = df.join(stats, list(keys), "left")
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

    Plan: ONE shuffle on the group key serves the rank window, the
    group-count window, and the bound-attach (the bounds aggregate and
    the row frame share partitioning, and AQE plans the |groups|-sized
    bounds side as a broadcast). Appends ``lo_bound``, ``hi_bound``,
    ``<value_col>_w`` (clamped), and ``was_clamped``."""
    from flyq_spark.operators.util import exact_ceil_frac

    if not (0 < lo_permille <= hi_permille < 1000):
        raise ValueError(
            f"need 0 < lo <= hi < 1000 permille, got {lo_permille}, {hi_permille}"
        )
    v = F.col(value_col)
    w = Window.partitionBy(*keys)
    ranked = (
        df.where(v.isNotNull())
        .select(*keys, v.alias("_v"))
        .withColumn("_rn", F.row_number().over(w.orderBy(F.col("_v").asc())))
        .withColumn("_n", F.count(F.lit(1)).over(w))
    )
    bounds = ranked.groupBy(*keys).agg(
        F.max(
            F.when(F.col("_rn") == exact_ceil_frac(F.col("_n"), lo_permille / 1000), F.col("_v"))
        ).cast("long").alias("lo_bound"),
        F.max(
            F.when(F.col("_rn") == exact_ceil_frac(F.col("_n"), hi_permille / 1000), F.col("_v"))
        ).cast("long").alias("hi_bound"),
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

    Scale shape: one group-key window (rank) sharing its shuffle+sort
    with the group-count window; NULL values pass through with NULL
    rank. Group cardinality bounds the sort, the classic hot-key
    caveat: for a single global group prefer
    ``profile.exact_global_quantiles`` + a bucket join.
    """
    w = Window.partitionBy(*group_cols)
    # NULLS LAST so null rows never shift non-null ranks (and DuckDB's
    # default ORDER BY agrees, keeping the oracle replay verbatim)
    rk = F.rank().over(w.orderBy(F.col(value_col).asc_nulls_last()))
    n = F.count(F.when(F.col(value_col).isNotNull(), 1)).over(w)
    ppm = F.when(
        F.col(value_col).isNull(), F.lit(None).cast("long")
    ).otherwise(
        F.when(n <= 1, F.lit(0).cast("long")).otherwise(
            F.call_function(
                "div",
                (rk.cast("long") - 1) * F.lit(1_000_000).cast("long"),
                n.cast("long") - 1,
            )
        )
    )
    return df.withColumn(out_col, ppm)

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
    one materialization + per column: one range exchange of the slim
    pair + one id-key join shuffle."""
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

    Scale shape: within-group ranks are ordinary windows PARTITIONED
    by group (data-distributed; group skew is the usual caveat); the
    pooled reference comes from the range-partitioned global rank
    (operators/ranking.py — no single-partition sort), reduced to an
    n_quantiles-row broadcast table. One group-key shuffle + one
    broadcast join."""
    from flyq_spark.operators.ranking import global_row_number

    t = int(n_quantiles)
    if t < 1:
        raise ValueError(f"n_quantiles must be >= 1: {n_quantiles}")
    src = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        value.cast("long").alias("_v"),
    ).where(F.col("_v").isNotNull())
    wg = Window.partitionBy("_g").orderBy(F.col("_v").asc(), F.col("_id").asc())
    ranked_in_group = src.withColumn("_q", F.ntile(t).over(wg))
    pooled = global_row_number(
        src.select("_v"),
        [F.col("_v").asc()],
        rank_col="_r",
        total_col="_n",
    )
    # lower exact quantile at fraction q/t = value at rank
    # ceil(q*N/t). Row r is that target exactly for the q in
    # (floor((r-1)t/N), floor(rt/N)] — disjoint intervals that
    # partition 1..t as r walks the order, so each q appears ONCE and
    # the filter+explode emits exactly t rows (never N*t): the
    # reference table is built in one linear pass over the ranks.
    qhi = F.expr(f"(_r * {t}) DIV _n")
    qlo = F.expr(f"((_r - 1) * {t}) DIV _n")
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
