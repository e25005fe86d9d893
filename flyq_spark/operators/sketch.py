"""Custom mergeable-summary sketches [EXT].

The driver's custom-operator guidance names "a novel sketch" as the
canonical case for going beyond built-ins. Spark ships HLL and KLL but
no frequent-items sketch; this module adds a distributed MISRA-GRIES
heavy-hitters operator with the production two-pass shape:

1. sketch pass: each partition compresses its token stream into at most
   ``k`` (item, lower-bound-count) counters — the classic MG decrement,
   vectorized per Arrow batch (pandas value_counts, then one dict merge
   + compression per batch, never a per-token Python loop). MG summaries
   are MERGEABLE: the union of per-partition candidate sets provably
   contains every item with true frequency > n/k, so a fixed per-
   partition memory budget still yields a global guarantee.
2. verify pass: the candidate set (≤ k · partitions tiny rows, in
   practice ≪ that) broadcasts back; ONE filtered groupBy computes the
   candidates' EXACT counts and applies the threshold.

The output is therefore exact — the sketch only prunes the key space —
which is what makes a sketch-based operator oracle-checkable: the gate
compares it against a plain GROUP BY ... HAVING in DuckDB. At 100 TB
the exact pass aggregates only candidate keys (map-side combine drops
everything else before the exchange), while the naive form shuffles the
entire vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_compress(counter: dict, k: int) -> None:
    """In-place Misra-Gries compression to at most k counters."""
    if len(counter) <= k:
        return
    # subtract the (k+1)-th largest count from everyone; drop <= 0
    vals = sorted(counter.values(), reverse=True)
    dec = vals[k]
    for key in list(counter):
        c = counter[key] - dec
        if c > 0:
            counter[key] = c
        else:
            del counter[key]


def heavy_hitters(
    df: DataFrame,
    item_col: Column | str,
    min_fraction: float = 0.005,
    k: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters via a Misra-Gries candidate pass + exact
    verify: all items whose frequency is >= ceil(min_fraction * n),
    with their exact counts. ``k`` defaults to ceil(2 / min_fraction),
    which guarantees the MG candidate union is a superset of every
    qualifying item (MG error <= n/k <= min_fraction·n/2 < threshold).

    Output: (item, n_occurrences) — BIGINT-exact, engine-replayable."""
    if k is None:
        k = int(2.0 / min_fraction) + 1
    items = df.select(
        (F.col(item_col) if isinstance(item_col, str) else item_col).alias("item")
    )

    def partials(iterator):
        import pandas as pd

        counter: dict = {}
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            for item, cnt in pdf["item"].value_counts().items():
                counter[item] = counter.get(item, 0) + int(cnt)
            _mg_compress(counter, k)
        if counter:
            yield pd.DataFrame({"item": list(counter.keys())})

    # candidate schema mirrors the actual item type — hardcoding
    # 'item string' would crash Arrow (or silently retype the semi-join
    # key) for bigint/binary item columns behind the generic Column API
    item_type = items.schema["item"].dataType.simpleString()
    candidates = items.mapInPandas(
        partials, schema=f"item {item_type}"
    ).distinct()
    total = items.agg(F.count("*").cast("long").alias("_n"))
    exact = (
        items.join(F.broadcast(candidates), on="item", how="left_semi")
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(
            F.col("n_occurrences")
            >= F.ceil(F.lit(float(min_fraction)) * F.col("_n")).cast("long")
        )
        .select("item", "n_occurrences")
    )
