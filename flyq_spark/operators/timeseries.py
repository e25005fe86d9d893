"""Time-series resampling / gap-fill [EXT].

The reference's log rows carry event-time timestamps
(flyq-protocol/src/message.rs `timestamp`); the standard analytics ask
over such a stream is a REGULAR time series — one row per (key,
bucket) even where no event landed, with missing values carried
forward (LOCF, the TimescaleDB `time_bucket_gapfill` + `locf`
capability). Spark has `window()` for the bucketing but nothing for
the densification; this operator composes it from DataFrame
primitives.

Plan shape, and why it survives 100 TB: the fact table is touched by
exactly ONE partial-aggregated groupBy((keys, bucket)) — the grid is
generated from the per-key [min, max] bucket span AFTER aggregation,
so its row count is keys × span/interval, independent of fact-table
size. The forward-fill window partitions by key over that grid, never
over raw events. Dense keys with multi-year spans at second
granularity are the one hazard (grid explosion) — `max_buckets_per_key`
guards it with an explicit error instead of an OOM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts_col: Column, interval_s: int) -> Column:
    """Tumbling-bucket start in epoch SECONDS — exact integer FLOOR
    division on microseconds (no IEEE double in the path). Spark's
    ``div`` truncates toward zero, which for pre-epoch timestamps
    would put the bucket start AFTER the event; the remainder
    correction makes it a true floor at any sign."""
    from flyq_spark.operators.util import floor_div

    step_us = F.lit(int(interval_s) * 1_000_000).cast("long")
    micros = F.unix_micros(ts_col)
    return floor_div(micros, step_us) * F.lit(int(interval_s)).cast("long")


def resample_locf(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    interval_s: int,
    aggs: dict[str, Column],
    fill: tuple[str, ...] = (),
    zero_fill: tuple[str, ...] = (),
    max_buckets_per_key: int = 10_000_000,
) -> DataFrame:
    """Aggregate into fixed buckets, densify each key's span, and fill
    gaps: columns in ``fill`` get last-observation-carried-forward
    (NULL before the first observation); columns in ``zero_fill`` get
    0 (the natural fill for counts); everything else stays NULL on gap
    rows. Adds ``bucket_start_s`` (epoch seconds) and ``is_observed``.

    Rows with NULL timestamps have no position on the time axis and
    are excluded up front (documented, not silent: they can neither
    bucket nor carry forward)."""
    if interval_s <= 0:
        raise ValueError(f"interval_s must be positive, got {interval_s}")
    overlap = set(fill) & set(zero_fill)
    if overlap:
        raise ValueError(f"columns in both fill and zero_fill: {sorted(overlap)}")
    for name in (*fill, *zero_fill):
        if name not in aggs:
            raise ValueError(f"fill column {name!r} is not an agg output")
    step = int(interval_s)
    observed = (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("bucket_start_s", time_bucket(F.col(ts_col), step))
        .groupBy(*keys, "bucket_start_s")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    span = observed.groupBy(*keys).agg(
        F.min("bucket_start_s").alias("_lo"),
        F.max("bucket_start_s").alias("_hi"),
    )
    guarded = span.withColumn(
        "_n",
        F.call_function(
            "div", F.col("_hi") - F.col("_lo"), F.lit(step).cast("long")
        )
        + F.lit(1),
    ).withColumn(
        "bucket_start_s",
        F.explode(
            F.when(
                F.col("_n") <= F.lit(int(max_buckets_per_key)),
                F.sequence(
                    F.col("_lo"), F.col("_hi"), F.lit(step).cast("long")
                ),
            ).otherwise(
                F.raise_error(
                    F.format_string(
                        "resample_locf: key span needs %s buckets > "
                        f"max_buckets_per_key={int(max_buckets_per_key)}; "
                        "raise the interval or the cap",
                        F.col("_n").cast("string"),
                    )
                )
            )
        ),
    )
    grid = guarded.select(*keys, "bucket_start_s")
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_start_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the observed flag must not key off an agg column's NULL pattern
    # (max over all-NULL inputs is NULL on an observed row) — carry an
    # explicit marker through the one grid join instead. The key
    # equality is null-SAFE: a NULL group key is a real group (its rows
    # aggregated together above), and a plain on-name join would read
    # every one of its observed buckets as a gap.
    marks = [f"_rk_{i}" for i in range(len(keys))]
    obs_m = observed.withColumn("_obs", F.lit(True)).select(
        *[F.col(k).alias(m) for k, m in zip(keys, marks)],
        F.col("bucket_start_s").alias("_rb"),
        "_obs",
        *aggs,
    )
    cond = F.col("bucket_start_s") == F.col("_rb")
    for k, m in zip(keys, marks):
        cond = cond & grid[k].eqNullSafe(F.col(m))
    out = grid.join(obs_m, on=cond, how="left").drop("_rb", *marks)
    cols: list[Column] = [F.col(c) for c in keys] + [F.col("bucket_start_s")]
    for name in aggs:
        c = F.col(name)
        if name in fill:
            c = F.last(name, ignorenulls=True).over(w)
        elif name in zero_fill:
            c = F.coalesce(c, F.lit(0))
        cols.append(c.alias(name))
    cols.append(F.coalesce(F.col("_obs"), F.lit(False)).alias("is_observed"))
    return out.select(*cols)


def seasonal_naive_backtest(
    series: DataFrame,
    keys: tuple[str, ...],
    bucket_col: str,
    value_col: str,
    season: int,
) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every forecasting
    pipeline scores against: predict each bucket's value as the value
    ``season`` buckets earlier (same hour yesterday / same day last
    week), then report per-key exact-integer error aggregates:
    ``n_scored`` (buckets with both actual and prediction),
    ``sum_abs_err`` (MAE numerator — divide by n_scored downstream;
    keeping the ratio out keeps the row hash-exact).

    REQUIRES a DENSE series (compose with :func:`resample_locf`):
    ``lag(season)`` counts ROWS, so a gap row that was never
    densified would silently shift the season alignment. One window
    per key over the bucket-sized series — never the fact table."""
    if season < 1:
        raise ValueError(f"season must be >= 1, got {season}")
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    scored = series.withColumn(
        "_pred", F.lag(value_col, season).over(w)
    ).withColumn(
        "_abs_err",
        F.abs(F.col(value_col).cast("long") - F.col("_pred").cast("long")),
    )
    return scored.groupBy(*keys).agg(
        F.count("_abs_err").alias("n_scored"),
        F.sum("_abs_err").alias("sum_abs_err"),
    )


def series_similarity_topk(
    series: DataFrame,
    keys: tuple[str, ...],
    bucket_col: str,
    value_col: str,
    query: DataFrame,
    k: int = 10,
    min_overlap: int = 2,
) -> DataFrame:
    """Whole-series similarity search (the distributed time-series
    similarity-search shape: EDBT'19's streaming-similarity problem
    restricted to aligned fixed buckets): rank keys by exact
    sum-of-squared-differences against a QUERY series over their
    overlapping buckets. Integer value columns stay integer end-to-end
    — no float summation order to diverge on, so the ranking replays
    exactly on any engine. Keys sharing fewer than ``min_overlap``
    buckets with the query are dropped (distance over near-empty
    overlap is noise, and 0-overlap "distance 0" would rank first).

    Plan: the query series (one key's buckets — small by construction)
    broadcast-joins the corpus on the bucket key; one groupBy(keys)
    computes ssd/overlap; one top-k sort on the key-cardinality
    aggregate. The fact-scale series crosses the join ONCE; nothing is
    pairwise across keys. Output: keys + n_overlap + ssd, ascending
    ssd with the key tuple as the deterministic tie-break, limited to
    ``k``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    q = F.broadcast(
        query.select(
            F.col(bucket_col).alias("_qb"), F.col(value_col).alias("_qv")
        ).where(F.col(value_col).isNotNull())
    )
    # squared diffs and their sum run in DECIMAL(38,0): exact for any
    # long inputs (a bare long product wraps silently at |diff| >~ 3e9),
    # with a LOUD error if the final ssd exceeds int64 instead of a
    # wrapped-negative "best match"
    diff = (
        F.col(value_col).cast("decimal(19,0)")
        - F.col("_qv").cast("decimal(19,0)")
    )
    joined = (
        series.where(F.col(value_col).isNotNull())
        # null-keys-impossible: a NULL bucket has no time-axis
        # position and cannot overlap the query
        .join(q, F.col(bucket_col) == F.col("_qb"))
        .withColumn("_d2", (diff * diff).cast("decimal(38,0)"))
    )
    ssd_dec = F.sum("_d2")
    ssd = F.when(
        ssd_dec > F.lit(2**63 - 1).cast("decimal(38,0)"),
        F.raise_error(
            F.lit(
                "series_similarity_topk: ssd exceeds int64 — rescale the "
                "value column upstream"
            )
        ).cast("long"),
    ).otherwise(ssd_dec.cast("long"))
    agg = (
        joined.groupBy(*keys)
        .agg(
            F.count("*").alias("n_overlap"),
            ssd.alias("ssd"),
        )
        .where(F.col("n_overlap") >= F.lit(min_overlap))
    )
    order = [F.col("ssd").asc()] + [F.col(c).asc() for c in keys]
    return agg.orderBy(*order).limit(k)


def series_dtw_topk(
    series: DataFrame,
    keys: tuple[str, ...],
    bucket_col: str,
    value_col: str,
    query: DataFrame,
    k: int = 10,
    band: int | None = None,
) -> DataFrame:
    """Dynamic-time-warping similarity search — the alignment-tolerant
    counterpart of :func:`series_similarity_topk` (a lagged-but-similar
    series scores near under DTW where bucket-aligned SSD punishes
    every shifted bucket). Classic O(n·m) DP per key against ONE
    broadcast query series, with an optional Sakoe-Chiba ``band``
    (|i-j| <= band) that both bounds cost and forbids pathological
    warps. Integer inputs give exact integer distances (squared local
    cost) — deterministic on any engine, though the DP itself is not
    SQL-expressible (rows-only gate by documented necessity).

    Plan: per-key series gather is one groupBy(collect_list) — valid
    for BUCKET series (key × span rows, the resample_locf output
    shape), not raw events; the DP runs in an Arrow-batched
    applyInPandas kernel per key, embarrassingly parallel. The query
    series is collected driver-side (one key's buckets — model-sized,
    the same contract as the ANN codebooks)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if band is not None and band < 0:
        raise ValueError(f"band must be >= 0, got {band}")
    qrows = (
        query.where(F.col(value_col).isNotNull())
        .orderBy(bucket_col)
        .select(value_col)
        .collect()
    )
    qv = np.array([r[value_col] for r in qrows], dtype=np.int64)
    if qv.size == 0:
        raise ValueError("query series has no non-null values")

    key_fields = [series.schema[c] for c in keys]
    schema = T.StructType(
        key_fields
        + [
            T.StructField("n_points", T.LongType(), False),
            T.StructField("dtw", T.LongType(), False),
        ]
    )
    m = qv.size

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        sv = pdf.sort_values("_b")["_v"].to_numpy(dtype=np.int64)
        n = sv.size
        # int64-exactness guard (Python ints, no wrap): the worst path
        # accumulates (n+m) steps of at most (max|sv|+max|qv|)² each —
        # numpy would wrap SILENTLY past int64 and a wrapped-negative
        # distance would rank first
        worst = (int(np.abs(sv).max(initial=0)) + int(np.abs(qv).max())) ** 2
        if worst * (n + m) >= 2**62:
            raise ValueError(
                "series_dtw_topk: value magnitudes too large for exact "
                "int64 DTW — rescale the value column upstream"
            )
        big = np.iinfo(np.int64).max // 4
        dp = np.full((n + 1, m + 1), big, dtype=np.int64)
        dp[0, 0] = 0
        w = band if band is not None else max(n, m)
        for i in range(1, n + 1):
            lo = max(1, i - w)
            hi = min(m, i + w)
            for j in range(lo, hi + 1):
                c = (sv[i - 1] - qv[j - 1]) ** 2
                dp[i, j] = c + min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])
        out = {c: [pdf[c].iloc[0]] for c in keys}
        out["n_points"] = [int(n)]
        out["dtw"] = [int(dp[n, m])]
        return pd.DataFrame(out)

    gathered = (
        series.where(F.col(value_col).isNotNull())
        .select(
            *keys,
            F.col(bucket_col).alias("_b"),
            F.col(value_col).cast("long").alias("_v"),
        )
        .groupBy(*keys)
        .applyInPandas(kernel, schema)
        .where(F.col("dtw") < F.lit(np.iinfo(np.int64).max // 4))
    )
    order = [F.col("dtw").asc()] + [F.col(c).asc() for c in keys]
    return gathered.orderBy(*order).limit(k)


def cusum_alarms(
    series: DataFrame,
    keys: tuple[str, ...],
    bucket_col: str,
    value_col: str,
    ref: int,
    threshold: int,
    two_sided: bool = True,
) -> DataFrame:
    """CUSUM changepoint detection (Page's cumulative-sum control
    chart) over a bucket series — the sequential drift detector a
    metrics pipeline runs on gap-filled counters: the upper statistic
    S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (xᵢ − ref)) alarms when sustained drift above
    ``ref`` accumulates past ``threshold`` (and S⁻ symmetrically below
    when ``two_sided``).

    The max(0,·) recurrence looks sequential but solves in closed form:
    S⁺ᵢ = cumᵢ − min(cum₀..ᵢ) where cum is the plain prefix sum of
    (x − ref) — two window passes, ALL integer arithmetic, so the whole
    detector is oracle-replayable (unlike iterative formulations).
    NULL values break the accumulation (documented: a gap with no LOCF
    fill contributes nothing and resets nothing — filter or fill
    upstream; here NULL rows are excluded before the windows so the
    statistic skips them).

    REQUIRES unique (keys, bucket) rows (the resample_locf output
    shape): the running windows order by the bucket alone, so duplicate
    buckets would make the statistic order-nondeterministic — feed a
    densified/aggregated series, not raw events.

    Output: one row per ALARMED bucket — (keys, bucket, value, s_pos,
    s_neg, alarm ∈ {'high','low'}) — plus none for in-control buckets;
    key-partitioned windows over the bucket-sized series."""
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = series.where(F.col(value_col).isNotNull()).withColumn(
        "_cum",
        F.sum(F.col(value_col).cast("long") - F.lit(int(ref)).cast("long")).over(w),
    )
    s_pos = F.col("_cum") - F.min(F.least(F.col("_cum"), F.lit(0).cast("long"))).over(w)
    s_neg = F.max(F.greatest(F.col("_cum"), F.lit(0).cast("long"))).over(w) - F.col("_cum")
    out = base.withColumn("s_pos", s_pos).withColumn("s_neg", s_neg)
    alarm = F.when(F.col("s_pos") > F.lit(int(threshold)), F.lit("high"))
    if two_sided:
        alarm = alarm.when(F.col("s_neg") > F.lit(int(threshold)), F.lit("low"))
    return (
        out.withColumn("alarm", alarm)
        .where(F.col("alarm").isNotNull())
        .select(*keys, bucket_col, value_col, "s_pos", "s_neg", "alarm")
    )


def group_trend(
    df: DataFrame,
    key_cols: list[str],
    x_col: Column | str,
    y_col: Column | str,
) -> DataFrame:
    """Per-key least-squares TREND over integer (x, y) observations,
    exact end-to-end — "is this metric rising or falling, per key,
    across a 100 TB history" as one aggregation.

    Emits the closed-form slope as an exact integer ratio:
    ``slope = slope_num / slope_den`` with
    ``slope_num = n·Σxy − Σx·Σy`` and ``slope_den = n·Σx² − (Σx)²``
    (slope_den = 0 ⟺ fewer than two distinct x — emitted as-is, the
    caller's "no trend defined" signal; never divided here, so no
    float and no divide-by-zero can appear). Intercept follows
    client-side as (Σy·slope_den − slope_num·Σx) / (n·slope_den).

    Scale shape: ONE map-side-combined groupBy over the observations —
    five counters per key, no window, no sort, no second pass.
    Arithmetic is ANSI long: rebase x near zero (e.g. days since the
    series start, not epoch days) so n·Σx·y stays under 2^63 — an
    overflow raises rather than wrap-signing the slope.
    """
    x = F.col(x_col).cast("long") if isinstance(x_col, str) else x_col.cast("long")
    y = F.col(y_col).cast("long") if isinstance(y_col, str) else y_col.cast("long")
    agg = (
        df.select(*key_cols, x.alias("_x"), y.alias("_y"))
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_x").alias("sum_x"),
            F.sum("_y").alias("sum_y"),
            F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        )
    )
    return agg.select(
        *key_cols,
        "n",
        "sum_x",
        "sum_y",
        (F.col("n") * F.col("_sxy") - F.col("sum_x") * F.col("sum_y")).alias(
            "slope_num"
        ),
        (F.col("n") * F.col("_sxx") - F.col("sum_x") * F.col("sum_x")).alias(
            "slope_den"
        ),
    )


def ohlc_bars(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    tie_col: str,
    value_col: Column | str,
    bucket_s: int,
) -> DataFrame:
    """Open/High/Low/Close bars per key per time bucket — the
    canonical downsample for any metric stream (finance bars, sensor
    rollups, rate dashboards), exact end-to-end.

    open/close are the value at the bucket's first/last observation
    in (ts, tie) order — min/max over (ts_us, tie, value) structs, so
    ONE map-side-combined groupBy computes everything (no window, no
    sort, no self-join; the same mergeable-struct trick as
    cdc.golden_record). high/low/n_obs ride the same aggregation.
    Pass an integer-scaled value for engine-portable exactness.

    Output: key_cols + (bucket_start_us, open, high, low, close,
    n_obs)."""
    from flyq_spark.operators.util import floor_div

    if bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1: {bucket_s}")
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).alias(
        "_v"
    )
    us = F.unix_micros(F.col(ts_col))
    step = F.lit(int(bucket_s) * 1_000_000).cast("long")
    base = df.select(
        *key_cols,
        (floor_div(us, step) * step).alias("bucket_start_us"),
        us.alias("_us"),
        F.col(tie_col).alias("_tie"),
        v,
    ).where(F.col("_v").isNotNull())
    first = F.min(F.struct(F.col("_us"), F.col("_tie"), F.col("_v")))
    last = F.max(F.struct(F.col("_us"), F.col("_tie"), F.col("_v")))
    return base.groupBy(*key_cols, "bucket_start_us").agg(
        first.getField("_v").alias("open"),
        F.max("_v").alias("high"),
        F.min("_v").alias("low"),
        last.getField("_v").alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )
