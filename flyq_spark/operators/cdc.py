"""Change-data-capture / warehouse-merge operators [EXT].

The reference is an append-only log broker (FlyQ segments,
flyq-storage/src/segment.rs); downstream warehouses consume that log as
a CHANGE STREAM. These operators are the standard landing patterns for
it on Spark — the Delta-Lake MERGE / dimension-history capabilities,
expressed engine-agnostically so they replay as plain SQL:

- ``apply_changes``: latest-wins upsert/delete merge of a change batch
  into a snapshot (the MERGE INTO shape, CDC "op" column honored);
- ``scd2_history``: slowly-changing-dimension type-2 interval history
  (valid_from / valid_to per attribute run) from an event stream.

Both are single-key-shuffle plans: every window and aggregation shares
the one exchange on the merge key. No collect, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Latest-wins CDC merge: apply a change batch (rows carrying an
    ``op`` column, ``'u'`` upsert / ``'d'`` delete) onto a snapshot.

    Semantics (the Kafka-Connect / Debezium sink contract): for every
    key, order snapshot ∪ changes by (ts, change-over-snapshot); the
    newest row wins; if it is a delete the key disappears. Snapshot
    rows rank as upserts at their stored timestamp, and a change at the
    SAME timestamp beats the snapshot (re-delivered batches converge —
    the merge is idempotent: applying the same batch twice is a no-op).
    ``ts_col`` should be a per-key-unique change LSN: two CHANGE rows
    sharing both key and ts have no defined order — fold a sequence
    number into ts upstream if the source can emit same-ts duplicates.

    Plan: unionByName with a source-priority literal, ONE window on the
    key (row_number by ts desc, priority desc), filter rank 1 and op !=
    'd'. One shuffle on the merge key, no join at all — cheaper than
    the join-form MERGE whenever the change batch isn't tiny; at 100 TB
    the shuffle carries |snapshot| + |changes| rows exactly once.
    Output: the merged snapshot (op/priority columns dropped)."""
    data_cols = [c for c in snapshot.columns]
    snap = snapshot.withColumn(op_col, F.lit("u")).withColumn("_pri", F.lit(0))
    chg = changes.select(*data_cols, op_col).withColumn("_pri", F.lit(1))
    unioned = snap.unionByName(chg)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col("_pri").desc()
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) != "d"))
        .select(*data_cols)
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: collapse an event
    stream into attribute VALIDITY INTERVALS — one row per run of equal
    consecutive ``attr_col`` values per key, with ``valid_from`` (first
    event of the run) and ``valid_to`` (start of the next run; NULL
    while current).

    Plan, one key-shuffle total (all three windows share the
    (key, ts, tie) sort):

    1. change points: rows where the attribute differs from its lag
       (or the first row) — a filter, not an aggregation, so the run's
       FIRST timestamp is preserved;
    2. valid_to: lead(valid_from) over the surviving change points —
       intervals tile the timeline with no gaps by construction;
    3. deterministic ordering ties on ``tie_col`` (events can share a
       timestamp; without the tie-break run detection would be
       partition-order-dependent).

    Output: (key, attr, valid_from, valid_to). The streaming analog is
    ``transformWithStateInPandas`` keeping the last attribute per key;
    this batch form replays the full history."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    changed = F.col(attr_col) != F.lag(attr_col).over(w)
    points = df.select(key_col, attr_col, ts_col, tie_col).withColumn(
        "_chg", F.coalesce(changed, F.lit(True))
    ).where(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    return points.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Derive a CHANGE BATCH from two snapshots — the inverse of
    ``apply_changes`` (when a source can't emit CDC, diff its daily
    snapshots; the Debezium "snapshot diff" / Delta CHANGE-feed-
    backfill pattern): emits ``op='u'`` rows carrying the NEW values
    for keys that appeared or changed, and ``op='d'`` rows carrying the
    old values for keys that vanished. Unchanged keys emit nothing.

    Roundtrip contract (property-tested): ``apply_changes(old,
    diff_snapshots(old, new)) == new``, PROVIDED ``ts_col`` is
    non-decreasing per key across snapshots (true of any LSN/updated-at
    column; a changed row whose new ts went BACKWARD would lose the
    merge to the snapshot it is meant to replace — same-ts changes are
    fine, change-beats-snapshot priority covers them).

    Plan: ONE full-outer equi-join on the key (AQE-skew-splittable),
    change detection via null-safe struct comparison of the non-key
    columns (one codegen'd expression regardless of column count). No
    window, no collect. Output: data columns + ``op``."""
    data_cols = list(old.columns)
    if list(new.columns) != data_cols:
        raise ValueError(
            f"snapshot schemas differ: {data_cols} vs {list(new.columns)}"
        )
    val_cols = [c for c in data_cols if c not in key_cols]
    # presence is detected by marker literals, NOT key nullness: the
    # join condition is null-safe (NULL keys are legal and match each
    # other), so a NULL key would read as "absent" and misclassify the
    # row (an unchanged NULL-key row must emit nothing, a vanished one
    # must emit 'd')
    o = old.withColumn("_in_o", F.lit(1)).alias("o")
    n = new.withColumn("_in_n", F.lit(1)).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    joined = o.join(n, on=cond, how="full_outer")
    in_old = F.col("o._in_o").isNotNull()
    in_new = F.col("n._in_n").isNotNull()
    same = F.struct(*[F.col(f"o.{c}") for c in val_cols]).eqNullSafe(
        F.struct(*[F.col(f"n.{c}") for c in val_cols])
    )
    op = (
        F.when(~in_old, F.lit("u"))           # added
        .when(~in_new, F.lit("d"))            # removed
        .when(~same, F.lit("u"))              # changed
        .otherwise(F.lit(None))               # unchanged -> dropped
    )
    side = lambda c: F.when(in_new, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}"))
    return (
        joined.withColumn(op_col, op)
        .where(F.col(op_col).isNotNull())
        .select(*[side(c).alias(c) for c in data_cols], op_col)
    )


def point_in_time_join(
    queries: DataFrame,
    history: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    suffix: str = "_pit",
) -> DataFrame:
    """Point-in-time (feature-store) join: each query row picks the
    history version whose validity interval contains its timestamp —
    ``valid_from <= ts < valid_to`` with an open-ended current version
    (NULL valid_to). The correctness property that prevents label
    leakage when generating training features against an SCD2 table:
    a query must see the value as of ITS time, never a later one.

    Composition: a backward as-of join on ``valid_from`` (SCD2
    intervals are disjoint per key, so the latest version starting at
    or before ts IS the candidate containing interval) + a validity
    check that nulls the match when the candidate's ``valid_to`` had
    already passed — which happens exactly when history before a
    retention cutoff was truncated. One user-key shuffle (the as-of
    window composition), no range explosion.

    Output: query rows + ``<col><suffix>`` for each value col, plus
    ``pit_matched``."""
    # zero-length intervals ([t, t): same-timestamp version churn, which
    # scd2_history emits for same-ts events) cover NO query instant and
    # MUST be dropped before the as-of: they tie with the real version
    # on valid_from, and the as-of carry among tied timestamps is
    # unspecified — the stale row could shadow the covering one
    # (order-dependent wrong results, caught by review repro)
    live = history.where(
        F.col(valid_to).isNull() | (F.col(valid_to) > F.col(valid_from))
    )
    hist = live.select(
        F.col(key_col),
        F.col(valid_from).alias(ts_col),
        F.col(valid_to).alias("_vto"),
        F.lit(True).alias("_hit"),  # marker: NULL value cols are data
        *[F.col(c) for c in value_cols],
    )
    from flyq_spark.operators.asof import asof_join

    out = asof_join(
        queries,
        hist,
        key_col=key_col,
        ts_col=ts_col,
        value_cols=value_cols + ["_vto", "_hit"],
        suffix=suffix,
    )
    ts_is_timestamp = dict(queries.dtypes)[ts_col].startswith("timestamp")
    q_ts = (
        F.unix_micros(F.col(ts_col))
        if ts_is_timestamp
        else F.col(ts_col).cast("long")
    )
    vto = F.col(f"_vto{suffix}")
    vto_us = (
        F.unix_micros(vto) if dict(out.dtypes)[f"_vto{suffix}"].startswith("timestamp") else vto.cast("long")
    )
    # matched iff a version was found AND (open-ended OR ts < valid_to)
    found = F.coalesce(F.col(f"_hit{suffix}"), F.lit(False))
    in_interval = vto.isNull() | (q_ts < vto_us)
    matched = found & in_interval
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.when(matched, F.col(f"{c}{suffix}"))
        )
    return out.withColumn("pit_matched", matched.cast("boolean")).drop(
        f"_vto{suffix}", f"_hit{suffix}"
    )


def golden_record(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    fields: dict[str, "F.Column"],
) -> DataFrame:
    """FIELD-LEVEL survivorship merge — the MDM "golden record": one
    row per key where EACH field independently carries the value from
    the most recent row (by ``order_cols``, lexicographic) in which
    that field was non-null. ``apply_changes`` is row-level
    latest-wins; this is its column-level refinement — a sparse update
    feed (every source system fills only its own columns) still
    converges to a complete record instead of the latest row's nulls
    clobbering older facts.

    Scale shape: ONE map-side-combined groupBy — per field,
    ``max(struct(order..., value))`` over rows where the field is
    non-null (struct comparison is lexicographic, so the order columns
    decide and the value rides along). No window, no sort, no join;
    partial aggregation means each executor ships one candidate struct
    per (key, field), not its rows. Order columns must be non-null and
    totally ordering (add a unique tiebreaker like the event id —
    otherwise ties resolve by the VALUE bytes, which is deterministic
    but surprising).

    Output: key_cols + one survivor column per field (NULL iff the
    field was null in every row of the key) + ``n_rows``.
    """
    return golden_record_finalize(
        golden_record_state(df, key_cols, order_cols, fields), list(fields)
    )


def golden_record_state(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_cols: tuple[str, ...],
    fields: dict[str, "F.Column"],
) -> DataFrame:
    """The MERGEABLE state behind :func:`golden_record`: per key,
    ``n_rows`` plus one ``{name}__st`` struct per field — the
    max(struct(order..., value)) candidate with its order columns
    still attached, so two states merge losslessly (max of maxes;
    the finalized form cannot merge because it has forgotten WHEN
    each survivor was observed). This is what the streaming view
    persists; :func:`golden_record_merge` folds states and
    :func:`golden_record_finalize` projects the survivor values."""
    if not fields:
        raise ValueError("golden_record needs at least one field")
    ords = [F.col(c) for c in order_cols]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for name, expr in fields.items():
        tagged = F.when(expr.isNotNull(), F.struct(*ords, expr.alias("_v")))
        aggs.append(F.max(tagged).alias(f"{name}__st"))
    return df.groupBy(*key_cols).agg(*aggs)


def golden_record_merge(
    states: DataFrame, key_cols: tuple[str, ...], field_names: list[str]
) -> DataFrame:
    """Fold a union of state frames into one: n_rows add, survivor
    structs take the max (same lexicographic (order..., value)
    comparison the per-batch aggregation used — merge order cannot
    matter). One key-cardinality shuffle over state rows only."""
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")]
    for name in field_names:
        aggs.append(F.max(f"{name}__st").alias(f"{name}__st"))
    return states.groupBy(*key_cols).agg(*aggs)


def golden_record_finalize(
    state: DataFrame, field_names: list[str]
) -> DataFrame:
    """Project the survivor VALUES out of a state frame (NULL where a
    field was never observed non-null)."""
    keep = [c for c in state.columns if not c.endswith("__st")]
    return state.select(
        *keep,
        *[F.col(f"{n}__st").getField("_v").alias(n) for n in field_names],
    )
