"""Incremental aggregate-view maintenance [EXT].

The reference is an append-only log (flyq-storage/src/segment.rs);
the canonical downstream use is a continuously-maintained aggregate
(a materialized view) that each consumed batch UPDATES rather than
recomputes. These operators are that pattern on Spark, engine-agnostic
(no Delta/Iceberg dependency): the view is itself a DataFrame of
per-key mergeable state, and maintenance is

    state' = merge(state, summarize(batch))

so the 100 TB base table is scanned ONCE ever; every later batch costs
O(|batch|) plus one equi-key shuffle whose width is the KEY cardinality,
not the fact-table size.

State layout per measure ``m`` (all distributive / algebraic):
``m_sum``, ``m_cnt`` (non-null count), ``m_min``, ``m_max`` — plus one
shared ``n_rows``. Averages derive at read time (``m_sum / m_cnt``);
holding the ratio itself would not merge.

Retractions (CDC deletes flowing into the view) are supported for the
sum/count state only: a delete contributes negated partials, and a key
whose ``n_rows`` reaches zero leaves the view. ``m_min`` / ``m_max``
are NOT retractable — the classic IVM limitation: removing the current
minimum requires knowing the runner-up, which bounded state cannot.
``merge_retractions`` therefore refuses min/max columns rather than
silently returning stale extrema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: state columns produced per measure
_STATE_SUFFIXES = ("sum", "cnt", "min", "max")


def _state_cols(measures: dict[str, Column] | dict[str, str]) -> list[str]:
    out = ["n_rows"]
    for name in measures:
        out.extend(f"{name}_{s}" for s in _STATE_SUFFIXES)
    return out


def summarize(
    df: DataFrame,
    keys: tuple[str, ...],
    measures: dict[str, Column],
    approx_distinct: dict[str, Column] | None = None,
    lgk: int = 12,
) -> DataFrame:
    """One partial-aggregated pass over a batch → per-key mergeable
    state. ``measures`` maps a state name to the value expression it
    summarizes (e.g. ``{"value_c": (col("value")*100).cast("long")}``).
    ``approx_distinct`` adds mergeable DISTINCT-count state — an
    Apache DataSketches HLL sketch per (key, expression), stored as a
    ``{name}_hll`` binary column: exact distinct counting is the one
    classic aggregate that does NOT merge (|A ∪ B| ≠ |A| + |B|), and
    the sketch is the standard bounded-state answer (~1.5 KiB at
    lgk=12, ±~1.6% regardless of cardinality).

    Plan: a single hash aggregate with map-side combine — at any scale
    the shuffle carries one row per (map task, live key)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, expr in measures.items():
        aggs.extend(
            [
                F.sum(expr).alias(f"{name}_sum"),
                F.count(expr).alias(f"{name}_cnt"),
                F.min(expr).alias(f"{name}_min"),
                F.max(expr).alias(f"{name}_max"),
            ]
        )
    for name, expr in (approx_distinct or {}).items():
        aggs.append(F.hll_sketch_agg(expr, F.lit(lgk)).alias(f"{name}_hll"))
    return df.groupBy(*keys).agg(*aggs)


def merge_increment(
    state: DataFrame,
    delta_state: DataFrame,
    keys: tuple[str, ...],
    measures: tuple[str, ...] | list[str],
) -> DataFrame:
    """Merge two state frames (existing view + a new batch's summary)
    into the updated view. Both sides must carry the ``summarize``
    state layout for ``measures``; keys present on only one side pass
    through (full-outer semantics via union + re-aggregate).

    sum/cnt/n_rows add; min of mins; max of maxes. One equi-key
    shuffle over |state| + |delta keys| rows — never the base table."""
    cols = list(keys) + _state_cols(dict.fromkeys(measures))
    hlls = [c for c in state.columns if c.endswith("_hll")]
    for c in hlls:
        if c not in delta_state.columns:
            raise ValueError(f"state has {c} but delta_state does not")
    # the mismatch must raise in BOTH directions — silently dropping a
    # delta-side sketch would lose distinct-count state forever
    for c in delta_state.columns:
        if c.endswith("_hll") and c not in hlls:
            raise ValueError(f"delta_state has {c} but state does not")
    cols += hlls
    unioned = state.select(*cols).unionByName(delta_state.select(*cols))
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs.extend(
            [
                F.sum(f"{m}_sum").alias(f"{m}_sum"),
                F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
                F.min(f"{m}_min").alias(f"{m}_min"),
                F.max(f"{m}_max").alias(f"{m}_max"),
            ]
        )
    for c in hlls:
        aggs.append(F.hll_union_agg(c).alias(c))
    return unioned.groupBy(*keys).agg(*aggs)


def merge_retractions(
    state: DataFrame,
    changes: DataFrame,
    keys: tuple[str, ...],
    measures: dict[str, Column],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch (``op`` = ``'i'`` insert / ``'d'`` delete) to
    a sum/count view. Deletes contribute negated partials; a key whose
    row count reaches zero is dropped from the view. The state frame
    must carry ``n_rows`` + ``{m}_sum``/``{m}_cnt`` per measure and
    must NOT be asked to maintain min/max (see module docstring).

    The delete rows must restate the measure values being removed
    (the Debezium "before" image) — the view holds no per-row detail
    to look them up from; that absence is exactly what makes it
    O(keys) instead of O(rows)."""
    for m in measures:
        for banned in ("min", "max"):
            if f"{m}_{banned}" in state.columns:
                raise ValueError(
                    f"state carries {m}_{banned}: min/max are not "
                    "retractable — maintain a sum/count-only view for "
                    "CDC sources, or rebuild extrema offline"
                )
    hlls = [c for c in state.columns if c.endswith("_hll")]
    if hlls:
        raise ValueError(
            f"state carries HLL sketches {hlls}: sketches are not "
            "retractable (an HLL cannot forget) — keep approx-distinct "
            "state in an insert-only view"
        )
    # any op code outside the i/d contract is a row-level error — an
    # 'u' (Debezium update) silently treated as insert would double-count
    sign = (
        F.when(F.col(op_col) == "d", F.lit(-1))
        .when(F.col(op_col) == "i", F.lit(1))
        .otherwise(
            F.raise_error(
                F.format_string(
                    "merge_retractions: op must be 'i' or 'd', got '%s' — "
                    "split updates into a delete of the before-image plus "
                    "an insert of the after-image",
                    F.col(op_col),
                )
            ).cast("int")
        )
    )
    aggs = [F.sum(sign).alias("n_rows")]
    for name, expr in measures.items():
        aggs.extend(
            [
                F.sum(sign.cast("long") * expr).alias(f"{name}_sum"),
                F.sum(
                    F.when(expr.isNotNull(), sign).otherwise(F.lit(0))
                ).alias(f"{name}_cnt"),
            ]
        )
    delta = changes.groupBy(*keys).agg(*aggs)
    cols = list(keys) + ["n_rows"]
    for m in measures:
        cols.extend([f"{m}_sum", f"{m}_cnt"])
    merged_aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        merged_aggs.extend(
            [
                F.sum(f"{m}_sum").alias(f"{m}_sum"),
                F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
            ]
        )
    merged = (
        state.select(*cols)
        .unionByName(delta.select(*cols))
        .groupBy(*keys)
        .agg(*merged_aggs)
    )
    # retracting a key's last non-null value must restore sum to NULL,
    # not 0 — the invariant is retraction == recompute-without-those-rows,
    # and summarize() over no values yields a NULL sum
    fixed = [
        (
            F.when(F.col(f"{m}_cnt") > 0, F.col(c)).alias(c)
            if c.endswith("_sum") and (m := c[: -len("_sum")]) in measures
            else F.col(c)
        )
        for c in cols
    ]
    return merged.select(*fixed).where(F.col("n_rows") > 0)


def read_view(
    state: DataFrame,
    measures: tuple[str, ...] | list[str],
    avg_scale: int | None = None,
) -> DataFrame:
    """Presentation pass over a state frame: derive ``{m}_avg`` from
    the mergeable partials (NULL when the non-null count is zero).
    With ``avg_scale`` the average is an exact scaled integer
    (``m_sum * scale // m_cnt`` — IntegralDivide, no IEEE double);
    without it, a plain double division. Pure projection, no shuffle."""
    out = state
    for c in [c for c in state.columns if c.endswith("_hll")]:
        out = out.withColumn(
            c[: -len("_hll")] + "_approx_distinct",
            F.hll_sketch_estimate(F.col(c)),
        )
    for m in measures:
        if avg_scale is not None:
            num = F.col(f"{m}_sum").cast("long") * F.lit(avg_scale).cast(
                "long"
            )
            avg = F.when(
                F.col(f"{m}_cnt") > 0,
                F.call_function("div", num, F.col(f"{m}_cnt").cast("long")),
            )
        else:
            avg = F.when(
                F.col(f"{m}_cnt") > 0,
                F.col(f"{m}_sum") / F.col(f"{m}_cnt"),
            )
        out = out.withColumn(f"{m}_avg", avg)
    return out
