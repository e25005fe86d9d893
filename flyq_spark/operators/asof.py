"""As-of (time-travel) join [EXT] — an operator Spark lacks natively.

``asof_join(left, right)``: for every left row, attach the most recent
right row of the same key with ``right.ts <= left.ts`` (backward
direction, inclusive — the semantics of pandas ``merge_asof`` and
DuckDB ``ASOF JOIN``, which the oracle uses to check this).

Two implementations:

- **window composition** (default, the scale path): union both sides
  tagged, one window per key ordered by (ts, side) carrying
  ``last(right_value, ignorenulls=True)`` forward, keep left rows. One
  shuffle by key — the same cost as any keyed join — no per-group
  Python, no range explosion. Right rows sort before left rows at equal
  timestamps so "inclusive" holds.
- **pandas cogroup** (``asof_join_pandas``): per-key
  ``pd.merge_asof`` via ``applyInPandas`` — the escape hatch when the
  carried payload is many columns (the window form carries one struct).

At 100 TB: both shuffle by key once; the window form additionally
requires per-key ordering (fine — keys are users/instruments, not the
whole table; a global as-of would need range bucketing instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join; left columns preserved, matched
    right ``value_cols`` appended as ``<col><suffix>`` (NULL when no
    right row precedes).

    ``tolerance_s`` bounds the lookback (pandas ``merge_asof``
    tolerance): a match older than ``tolerance_s`` seconds before the
    left row is nulled out — the attribution-window semantics. Exact to
    the microsecond for timestamp columns (compared in ``unix_micros``,
    never truncated seconds). Ties: among right rows at one (key, ts)
    the carried row is unspecified — give the right side unique
    timestamps per key (true in any event log with a monotonic source)
    or pre-aggregate first."""
    ts_is_timestamp = dict(left.dtypes)[ts_col].startswith("timestamp")
    payload_cols = [F.col(c) for c in value_cols]
    if tolerance_s is not None:
        ats = (
            F.unix_micros(F.col(ts_col))
            if ts_is_timestamp
            else F.col(ts_col).cast("long")
        )
        payload_cols = [ats.alias("_ats")] + payload_cols
    payload = F.struct(*payload_cols)
    l_tag = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        )
    )
    r_tag = (
        right.select(
            F.col(key_col),
            F.col(ts_col),
            payload.alias("_payload"),
        )
        .withColumn("_is_left", F.lit(0))
    )
    # align schemas: right side lacks the other left columns
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))
    # right rows (_is_left=0) order before left rows at equal ts -> inclusive
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_is_left") == 1).drop("_is_left", "_payload")
    if tolerance_s is not None:
        lts = (
            F.unix_micros(F.col(ts_col))
            if ts_is_timestamp
            else F.col(ts_col).cast("long")
        )
        in_window = (lts - F.col("_match._ats")) <= F.lit(
            tolerance_s * 1_000_000 if ts_is_timestamp else tolerance_s
        ).cast("long")
        out = out.withColumn(
            "_match", F.when(in_window, F.col("_match"))
        )
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_match.{c}"))
    return out.drop("_match")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """pd.merge_asof per key via cogrouped applyInPandas (Arrow batches;
    both sides shuffled by key once)."""
    import pandas as pd

    out_schema = left.schema
    from pyspark.sql import types as T

    right_types = dict(right.dtypes)
    fields = list(out_schema.fields) + [
        T.StructField(
            f"{c}{suffix}",
            right.schema[c].dataType,
            True,
        )
        for c in value_cols
    ]
    schema = T.StructType(fields)
    left_cols = left.columns

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in fields])
        l_sorted = l_pdf.sort_values(ts_col)
        if r_pdf.empty:  # no right rows for this key -> all NULL matches
            merged = l_sorted.copy()
            for c in value_cols:
                merged[f"{c}{suffix}"] = None
        else:
            r_sorted = r_pdf[[ts_col] + value_cols].sort_values(ts_col)
            merged = pd.merge_asof(
                l_sorted,
                r_sorted.rename(columns={c: f"{c}{suffix}" for c in value_cols}),
                on=ts_col,
                direction="backward",
            )
        return merged[[f.name for f in fields]]

    return (
        left.groupBy(key_col)
        .cogroup(right.groupBy(key_col))
        .applyInPandas(merge, schema=schema)
    )
