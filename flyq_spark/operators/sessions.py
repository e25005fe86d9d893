"""Event-stream analytics: sessionization + time windows [EXT].

Batch forms of the stream analytics surface over the ``events`` table.
The Structured Streaming variants (withWatermark + window/session_window)
live in flyq_spark/streaming; these batch forms share semantics and are
oracle-replayable as plain SQL (gaps-and-islands for sessions, date_trunc
for windows), which is how the driver's DuckDB gate checks them.

Scale notes: sessionize is two windows over the same (user) partitioning
— one shuffle total; tumbling/sliding aggs are single hash aggregations
(sliding emits one row per covered window via an explode of window
starts: shuffle grows by the overlap factor, the unavoidable cost of
overlapping windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap
    from the previous event of the same user exceeds ``gap_minutes``.

    Output: (user_id, session_id, session_start_us, session_end_us,
    n_events) with session_id numbered 1..k per user in time order.
    """
    by_user = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(ts_col).over(by_user)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_us)
    ).cast("long")
    with_sess = events.withColumn(
        "session_id",
        F.sum(is_new).over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sess.groupBy(
        F.col(user_col).alias("user_id"), "session_id"
    ).agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("session_start_us"),
        F.max(F.unix_micros(F.col(ts_col))).alias("session_end_us"),
        F.count("*").cast("long").alias("n_events"),
    )


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    unit: str = "hour",
) -> DataFrame:
    """Tumbling-window aggregate at calendar granularity. date_trunc keeps
    the window start oracle-replayable (F.window's struct is Spark-only).
    min/max are order-exact aggregates (no float summation ambiguity)."""
    return events.groupBy(
        F.unix_micros(F.date_trunc(unit, F.col(ts_col))).alias("window_start_us"),
        F.col(key_col),
    ).agg(
        F.count("*").cast("long").alias("cnt"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width_hours: int = 2,
    slide_hours: int = 1,
) -> DataFrame:
    """Sliding-window counts (width 2h, slide 1h by default): each event
    contributes to width/slide windows — produced by exploding the list
    of covering window starts, then one hash aggregation."""
    n_windows = width_hours // slide_hours
    starts = F.array(
        *[
            F.unix_micros(F.date_trunc("hour", F.col(ts_col)))
            - F.lit(i * slide_hours * 3_600_000_000)
            for i in range(n_windows)
        ]
    )
    return (
        events.select(F.explode(starts).alias("window_start_us"))
        .groupBy("window_start_us")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def top_events_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Window top-k: each user's k highest-value events (deterministic
    tie-break on event_id). Narrow per-user window, one shuffle."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("user_id", "event_id", "event_type", "value", "rnk")
    )


def dedup_events(
    events: DataFrame, key_cols: tuple[str, ...] = ("user_id", "event_type")
) -> DataFrame:
    """Keep-first exact dedup on an event key: min event_id per key —
    deterministic survivor (dropDuplicates picks an arbitrary row; a
    keep-first rule is replayable and idempotent)."""
    return events.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.min("event_id").alias("event_id")
    )


def _funnel_match_ok(st, ev, n, steps_arr, max_gap_seconds):
    """THE greedy-matcher eligibility condition, shared by funnel_steps
    and funnel_user_times so the counts gate and the latency gate can
    never diverge semantically: next expected step type, strictly later
    than the previous match, optionally within the first-touch-anchored
    gap window (see funnel_steps' inline note on why a blown window
    does NOT re-anchor)."""
    ok = (
        (st["k"] < F.lit(n))
        & (ev["tp"] == F.element_at(steps_arr, st["k"] + 1))
        & (st["t"].isNull() | (ev["ts"] > st["t"]))
    )
    if max_gap_seconds is not None:
        ok = ok & (
            st["t"].isNull()
            | (
                ev["ts"].cast("long")
                <= st["t"].cast("long") + F.lit(max_gap_seconds)
            )
        )
    return ok


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each step k, how many users
    performed step 1, then step 2 STRICTLY LATER, ... then step k
    strictly later still — greedy first-occurrence matching (user's
    step-k time = earliest step-k event after their step-(k-1) time),
    which is the standard funnel semantics and, in the UNBOUNDED form,
    provably maximizes the number of users completing each prefix.
    With ``max_gap_seconds`` each step must also land within the gap of
    the previous step's match — first-touch anchored, no backtracking
    (see the inline note for why that differs from exists-any-
    completion).

    Plan: ONE scan (filtered to the funnel's event types before the
    shuffle) + ONE user-key shuffle: each user's relevant events are
    collected time-sorted and a higher-order ``aggregate`` fold runs
    the greedy matcher JVM-side — greedy scan-in-time-order is provably
    equivalent to iterated earliest-next-step matching. Per-user state
    is (step pointer, last matched ts); the per-user array holds only
    step-typed events (a pathological single user generating a large
    share of all step events would need pre-aggregation to (user, type,
    ts) minima first — at that point the funnel answer for them is
    degenerate anyway). Counts come from one final tiny aggregation,
    stack-unpivoted; the whole funnel is one lazy two-shuffle plan.

    Output: (step_idx, step, n_users) — n_users completing the prefix
    through that step; conversion ratios are left to the caller (two
    exact integers divide wherever they land)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).alias("k"), F.lit(None).cast("timestamp").alias("t")
    )

    def advance(st, ev):
        # SEMANTICS of the bounded window (applied in _funnel_match_ok):
        # first-touch anchored, no backtracking — each step matches at
        # its earliest eligible time given prior matches, and a blown
        # window does NOT re-anchor on a later step-1 (greedy is NOT
        # exists-any-completion under windows: for A@0, A@50, B@55,
        # gap 10 the first-touch funnel fails at B while re-anchoring
        # would succeed; first-touch is the deterministic, attribution-
        # friendly convention and is what replays in SQL).
        ok = _funnel_match_ok(st, ev, n, steps_arr, max_gap_seconds)
        return F.when(
            ok, F.struct((st["k"] + 1).alias("k"), ev["ts"].alias("t"))
        ).otherwise(st)

    reached = (
        # NULL-ts events are excluded up front — an event with no time
        # cannot participate in a time-ordered funnel. Without this, the
        # fold's st.t-isNull() "no match yet" escape would let a NULL-ts
        # step-1 event match and make every later step unconditionally
        # time-eligible, silently inflating conversions.
        events.where(
            F.col(type_col).isin(*steps) & F.col(ts_col).isNotNull()
        )
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp"))
                )
            ).alias("_seq")
        )
        .select(F.aggregate("_seq", init, advance)["k"].alias("_reached"))
    )
    wide = reached.agg(
        *[
            F.count(F.when(F.col("_reached") >= k, 1))
            .cast("long")
            .alias(f"_n{k}")
            for k in range(1, n + 1)
        ]
    )
    quoted = [s.replace("'", "\\'") for s in steps]
    stack_expr = ", ".join(
        f"{k}, '{quoted[k - 1]}', _n{k}" for k in range(1, n + 1)
    )
    return wide.select(
        F.expr(
            f"stack({n}, {stack_expr}) AS (step_idx, step, n_users)"
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their FIRST
    event; for each (cohort_week, week_offset), how many of that
    cohort's users were active ``week_offset`` weeks later. The classic
    product-analytics retention matrix, computed with exact integer
    arithmetic so it replays identically on any engine.

    Plan, three narrow integer-keyed shuffles (user, (user, week),
    (cohort, offset) — each carries one timestamp/int pair per row):

    1. cohort assignment: ``groupBy(user).min(ts)`` truncated to the
       ISO week (``date_trunc('week')`` — Monday start on every
       engine) — map-side combined;
    2. activity: distinct (user, week) pairs, then a join back to the
       cohort table on the user key and a final count per
       (cohort_week, week_offset). Week offsets are day-difference / 7
       — both weeks are Monday-truncated so the division is exact.

    The per-user state is one timestamp; no window over the full event
    history, no collect. Output: (cohort_week, week_offset, n_users)
    with n_users BIGINT-exact (each user contributes at most one row
    per week via the distinct)."""
    cohort = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    weekly = events.select(
        F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("_wk")
    ).distinct()
    return (
        # null-keys-impossible: user_col is the actor identity; inner
        # join excludes NULL-user events from retention by design
        weekly.join(cohort, on=user_col)
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("_wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def rfm_segments(
    events: DataFrame,
    ref_ts,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_c: Column | None = None,
    n_tiles: int = 4,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary), the classic
    customer-analytics operator: per user — days since last event
    (relative to the DETERMINISTIC ``ref_ts`` literal, never now()),
    event count, summed integer value — each scored into ``n_tiles``
    NTILE buckets where tile 1 is BEST (most recent / most frequent /
    highest value), ties broken by user id so the segmentation is
    reproducible on any engine.

    Plan: one groupBy(user) for the three metrics, checkpointed ONCE,
    then three INDEPENDENT range-partitioned exact-NTILE branches
    (operators/ranking.py, materialize=False — they share the one
    materialization) joined back on the user key. No global sort
    anywhere: each score is a repartitionByRange + P parallel in-range
    sorts + a broadcast offset table, so a billion-user aggregate
    tiles in P-way parallel tasks instead of one single-partition
    window per metric; branching instead of chaining keeps it at one
    materialization + three range exchanges + three user-key join
    shuffles of the slim (user, score) outputs. The integer NTILE
    formula is bucket-for-bucket identical to the SQL window function,
    so results are unchanged."""
    from pyspark.sql import Column as _Column

    if value_c is None:
        value_c = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    if not isinstance(value_c, _Column):
        raise ValueError(
            f"value_c must be a Column expression, got {type(value_c).__name__}"
        )
    per_user = events.groupBy(user_col).agg(
        F.datediff(F.lit(ref_ts).cast("timestamp"), F.max(ts_col)).alias(
            "recency_days"
        ),
        F.count("*").alias("frequency"),
        F.sum(value_c).alias("monetary_c"),
    )
    # NULL metrics (a user with only NULL timestamps/values) rank WORST
    # on every axis, explicitly: Spark's bare asc() is NULLS FIRST while
    # DuckDB's is NULLS LAST — without the explicit variants the two
    # engines would tile NULL users at opposite ends
    from flyq_spark.operators.ranking import ntile_exact

    base = per_user.localCheckpoint(eager=False)
    orders = {
        "r_score": [F.col("recency_days").asc_nulls_last(), F.col(user_col).asc()],
        "f_score": [F.col("frequency").desc_nulls_last(), F.col(user_col).asc()],
        "m_score": [F.col("monetary_c").desc_nulls_last(), F.col(user_col).asc()],
    }
    out = base
    for score, order in orders.items():
        branch = ntile_exact(base, order, n_tiles, score, materialize=False)
        # null-keys-impossible: user_col is the actor identity
        out = out.join(branch.select(user_col, score), on=user_col)
    return out.select(
        user_col,
        "recency_days",
        "frequency",
        "monetary_c",
        "r_score",
        "f_score",
        "m_score",
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_baskets: int = 1,
    max_items_per_basket: int = 10_000,
) -> DataFrame:
    """Market-basket co-occurrence (the support-counting core of
    Apriori): for every unordered item pair, in how many DISTINCT
    baskets they appear together, alongside each item's own basket
    support. ``min_baskets`` filters the pair output; items compare
    as strings in the pair ordering (item_a < item_b).

    Scale shape: (basket, item) pairs dedup FIRST (map-side combined
    distinct — a user clicking the same product 1M times contributes
    one row), then the pair expansion self-joins on the basket key:
    cost is Σ k_b² over per-basket distinct-item counts k_b. That sum,
    not row count, is the operator's true size — so baskets with more
    than ``max_items_per_basket`` distinct items are EXCLUDED (the
    standard Apriori practice for degenerate baskets: a crawler
    touching the whole catalog says nothing about affinity and would
    quadratically dominate the join). The exclusion is a documented
    semantic, mirrored in the oracle, not a silent truncation."""
    if min_baskets < 1:
        raise ValueError(f"min_baskets must be >= 1, got {min_baskets}")
    if max_items_per_basket < 2:
        raise ValueError(
            f"max_items_per_basket must be >= 2, got {max_items_per_basket}"
        )
    bi = df.select(basket_col, item_col).distinct()
    sizes = bi.groupBy(basket_col).agg(F.count("*").alias("_k"))
    ok = sizes.where(F.col("_k") <= max_items_per_basket).select(basket_col)
    # null-keys-impossible: basket_col is the basket identity
    bi = bi.join(ok, basket_col, "left_semi")
    support = bi.groupBy(item_col).agg(F.count("*").alias("_sup"))
    a = bi.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("item_a"))
    b = bi.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_baskets"))
        .where(F.col("n_baskets") >= F.lit(min_baskets))
    )
    return (
        pairs.join(
            support.select(
                F.col(item_col).alias("item_a"), F.col("_sup").alias("support_a")
            ),
            "item_a",
        )
        .join(
            support.select(
                F.col(item_col).alias("item_b"), F.col("_sup").alias("support_b")
            ),
            "item_b",
        )
        .select("item_a", "item_b", "n_baskets", "support_a", "support_b")
    )


def attribute_conversions(
    events: DataFrame,
    conversion_types: tuple[str, ...],
    touch_types: tuple[str, ...],
    lookback_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch marketing attribution: each conversion event is
    credited to the most recent touch event by the same user within a
    ``lookback_s``-second window (the standard last-click model; a
    conversion with no in-window touch stays unattributed, NULL touch).

    This is exactly a backward as-of join with tolerance, so it reuses
    ``asof_join``'s single-shuffle window composition: one shuffle on
    the user key, no per-conversion scan of the touch history, no range
    explosion — the shape that holds when both streams are 100 TB.

    Output: conversion rows plus ``touch_type_asof``/``touch_ts_asof``
    and an ``attributed`` flag."""
    from flyq_spark.operators.asof import asof_join

    overlap = set(conversion_types) & set(touch_types)
    if overlap:
        # a type in both sets would let a conversion attribute to ITSELF
        # (same-ts inclusive match) — surface the modeling error loudly
        raise ValueError(f"types cannot be both conversion and touch: {sorted(overlap)}")
    conv = events.where(F.col(type_col).isin(*conversion_types))
    touch = events.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col),
        F.col(ts_col),
        F.col(type_col).alias("touch_type"),
        F.col(ts_col).alias("touch_ts"),
    )
    out = asof_join(
        conv,
        touch,
        key_col=user_col,
        ts_col=ts_col,
        value_cols=["touch_type", "touch_ts"],
        tolerance_s=lookback_s,
    )
    return out.withColumn("attributed", F.col("touch_ts_asof").isNotNull())


def funnel_user_times(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel completion detail — the row-level companion of
    ``funnel_steps`` (which returns only prefix counts): for each user
    who performed step 1, how far they got, when they entered, when
    their last matched step happened, and the entry-to-exit latency.
    Greedy first-occurrence semantics IDENTICAL to funnel_steps by
    construction — both folds share ``_funnel_match_ok`` (including the
    optional first-touch-anchored ``max_gap_seconds`` window); in the
    unbounded form greedy == iterated earliest-next-step, so the oracle
    replays it as chained min-after aggregations.

    Same plan shape: one type-filtered scan + one user-key shuffle +
    a JVM-side higher-order fold carrying (step pointer, first ts,
    last ts). Output: (user, steps_completed, t_first_us, t_last_us,
    latency_us) — timestamps as exact epoch micros, latency NULL until
    the user completes at least two steps."""
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).alias("k"),
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t"),
    )

    def advance(st, ev):
        ok = _funnel_match_ok(st, ev, n, steps_arr, max_gap_seconds)
        return F.when(
            ok,
            F.struct(
                (st["k"] + 1).alias("k"),
                F.coalesce(st["t1"], ev["ts"]).alias("t1"),
                ev["ts"].alias("t"),
            ),
        ).otherwise(st)

    folded = (
        events.where(F.col(type_col).isin(*steps) & F.col(ts_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp"))
                )
            ).alias("_seq")
        )
        .select(user_col, F.aggregate("_seq", init, advance).alias("_st"))
        .where(F.col("_st.k") >= 1)
    )
    t1 = F.unix_micros(F.col("_st.t1"))
    tl = F.unix_micros(F.col("_st.t"))
    return folded.select(
        user_col,
        F.col("_st.k").cast("long").alias("steps_completed"),
        t1.alias("t_first_us"),
        tl.alias("t_last_us"),
        F.when(F.col("_st.k") >= 2, tl - t1).alias("latency_us"),
    )


def sessionize_capped(
    events: DataFrame,
    gap_minutes: int = 30,
    max_duration_minutes: int = 240,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Sessionization with BOTH an inactivity gap and a maximum session
    duration (the Amplitude/GA4 rule): a new session starts when the
    gap from the previous event exceeds ``gap_minutes`` OR the event
    would stretch the current session past ``max_duration_minutes``
    from ITS OWN start. The duration rule makes the recurrence
    non-WINDOW-expressible — each session's start depends on where the
    previous cap fired — so, like the funnel matcher, it runs as a
    JVM-side higher-order ``aggregate`` fold over the time-sorted
    per-user array (one user-key shuffle, no Python).

    The recurrence IS linear, so a recursive CTE can replay it — the
    r8 gate oracle does exactly that (recursion depth = events/user:
    right for a fixture-scale oracle, wrong as a cluster plan, which
    is why the fold stays the execution path). Also pinned against an
    independent Python model in pytest. Gap-only callers should keep
    using ``sessionize`` (window-expressible). Output matches
    sessionize's shape: (user_id, session_id, session_start_us,
    session_end_us, n_events)."""
    if gap_minutes <= 0 or max_duration_minutes <= 0:
        raise ValueError("gap and max duration must be positive minutes")
    gap_us = gap_minutes * 60 * 1_000_000
    cap_us = max_duration_minutes * 60 * 1_000_000
    # state: (session ordinal, session start, prev ts, emitted list of
    # per-event session ordinals) — the fold tags each event, then
    # explode + aggregate builds the session rows
    init = F.struct(
        F.lit(0).cast("long").alias("sid"),
        F.lit(None).cast("long").alias("start"),
        F.lit(None).cast("long").alias("prev"),
        F.array().cast("array<long>").alias("tags"),
    )

    def advance(st, ts_us):
        fresh = (
            st["start"].isNull()
            | ((ts_us - st["prev"]) > F.lit(gap_us))
            | ((ts_us - st["start"]) > F.lit(cap_us))
        )
        sid = F.when(fresh, st["sid"] + 1).otherwise(st["sid"])
        start = F.when(fresh, ts_us).otherwise(st["start"])
        return F.struct(
            sid.alias("sid"),
            start.alias("start"),
            ts_us.alias("prev"),
            F.concat(st["tags"], F.array(sid)).alias("tags"),
        )

    # only the timestamp feeds the fold — equal-ts events get identical
    # session assignment whatever their order, so no tie column rides
    # along (it would double the per-user collect payload for nothing)
    per_user = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(F.unix_micros(F.col(ts_col)))
            ).alias("_seq")
        )
        .select(
            F.col(user_col).alias("user_id"),
            F.col("_seq").alias("_ts"),
            F.aggregate(
                "_seq", init, lambda st, us: advance(st, us)
            )["tags"].alias("_tags"),
        )
    )
    tagged = per_user.select(
        "user_id",
        F.explode(F.arrays_zip("_ts", "_tags")).alias("_z"),
    ).select(
        "user_id",
        F.col("_z._ts").alias("_us"),
        F.col("_z._tags").alias("session_id"),
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.min("_us").alias("session_start_us"),
        F.max("_us").alias("session_end_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def attribute_multi_touch(
    events: DataFrame,
    conversion_types: tuple[str, ...],
    touch_types: tuple[str, ...],
    lookback_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every touch
    in the lookback window shares a conversion's credit — 40% to the
    first touch, 40% to the last, the middle 20% split across the rest
    (100% / 50-50 for one/two touches). Credit is EXACT integer ppm:
    the middle share uses integer division with the remainder assigned
    to the LAST touch, so every conversion's credits sum to exactly
    1,000,000 — deterministic on any engine, no float leakage.

    Plan: one user-key equi-join (conversions × touches of the same
    user, filtered to the window — candidate volume is bounded by
    per-user event counts, never a time cross join) + one window over
    the conversion key ordering touches (ts, id). Conversions with no
    in-window touch produce no rows (the single-touch ``attribution``
    operator reports those as unattributed).

    Output: (conv_<id>, user, touch_<id>, touch_type, n_touches,
    touch_rank, credit_ppm)."""
    overlap = set(conversion_types) & set(touch_types)
    if overlap:
        raise ValueError(f"types cannot be both conversion and touch: {sorted(overlap)}")
    if lookback_s <= 0:
        raise ValueError(f"lookback_s must be positive: {lookback_s}")
    conv = events.where(F.col(type_col).isin(*conversion_types)).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias(f"conv_{id_col}"),
        F.unix_micros(F.col(ts_col)).alias("_cts"),
    )
    touch = events.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias(f"touch_{id_col}"),
        F.col(type_col).alias("touch_type"),
        F.unix_micros(F.col(ts_col)).alias("_tts"),
    )
    j = conv.join(touch, on="_u").where(
        (F.col("_tts") <= F.col("_cts"))
        & (
            F.col("_cts") - F.col("_tts")
            <= F.lit(lookback_s).cast("long") * F.lit(1_000_000).cast("long")
        )
    )
    w = Window.partitionBy(f"conv_{id_col}")
    ordered = w.orderBy(F.col("_tts").asc(), F.col(f"touch_{id_col}").asc())
    ranked = j.withColumn(
        "touch_rank", F.row_number().over(ordered).cast("long")
    ).withColumn("n_touches", F.count(F.lit(1)).over(w).cast("long"))
    n = F.col("n_touches")
    rk = F.col("touch_rank")
    mid_each = F.call_function("div", F.lit(200_000).cast("long"), n - 2)
    mid_rem = F.lit(200_000).cast("long") - mid_each * (n - 2)
    credit = (
        F.when(n == 1, F.lit(1_000_000).cast("long"))
        .when(n == 2, F.lit(500_000).cast("long"))
        .when(rk == 1, F.lit(400_000).cast("long"))
        .when(rk == n, F.lit(400_000).cast("long") + mid_rem)
        .otherwise(mid_each)
    )
    return ranked.select(
        f"conv_{id_col}",
        F.col("_u").alias(user_col),
        f"touch_{id_col}",
        "touch_type",
        "n_touches",
        "touch_rank",
        credit.alias("credit_ppm"),
    )


def debounce_events(
    df: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    tie_col: str,
    min_gap_s: int,
) -> DataFrame:
    """Telemetry debounce: per key, drop an event arriving within
    ``min_gap_s`` seconds of the PREVIOUS event (duplicate clicks,
    retry storms, double-fired beacons). The gap is measured to the
    immediately preceding event in (ts, tie) order — a bursty run
    collapses to its first event plus any event that follows a
    quiet gap, the standard lag-window debounce.

    (The stricter variant — measure the gap to the previous KEPT
    event — is a fold recurrence like ``sessionize_capped`` and has
    no window form; use that operator's pattern when re-anchoring on
    survivors matters. This window form is exactly SQL-replayable.)

    One key-shuffle window; exact integer microsecond arithmetic.
    Output: the surviving rows (all original columns).
    """
    if min_gap_s <= 0:
        raise ValueError(f"min_gap_s must be positive: {min_gap_s}")
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tie_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    keep = prev.isNull() | (us - prev >= F.lit(min_gap_s).cast("long") * 1_000_000)
    return df.withColumn("_keep", keep).where(F.col("_keep")).drop("_keep")
