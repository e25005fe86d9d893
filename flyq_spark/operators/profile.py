"""Exact table profiling [EXT] — the data-quality pass a pipeline runs
before trusting a new drop of data.

``DataFrame.summary()`` exists but is not engine-replayable (approximate
percentiles, float formatting); this is the exact, oracle-checkable
form: per column — row count, null count, exact distinct count, min and
max — emitted in long format (one row per column).

Scale shape: ONE aggregation pass computes every column's stats
(Catalyst expands multi-distinct into one Expand + two-stage aggregate —
still a single scan of the data, map-side partial everything), then a
zero-shuffle ``stack`` unpivots the 1-row wide result. Nothing is ever
per-column re-scanned. Callers pass profile-SAFE expressions (integers
or strings): cast timestamps to epoch micros and money to integer cents
upstream so min/max stringify identically on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Profile the given named expressions. Output: (col_name, n_rows,
    n_nulls, n_distinct, min_v, max_v) with min/max as strings."""
    proj = df.select(*[expr.alias(name) for name, expr in cols.items()])
    aggs = []
    for name in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{name}__rows"),
            F.sum(F.col(name).isNull().cast("long")).cast("long").alias(f"{name}__nulls"),
            F.count_distinct(F.col(name)).cast("long").alias(f"{name}__distinct"),
            F.min(F.col(name)).cast("string").alias(f"{name}__min"),
            F.max(F.col(name)).cast("string").alias(f"{name}__max"),
        ]
    wide = proj.agg(*aggs)
    stack_expr = ", ".join(
        f"'{name}', {name}__rows, {name}__nulls, {name}__distinct, "
        f"{name}__min, {name}__max"
        for name in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_v, max_v)"
        )
    )
