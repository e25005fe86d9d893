"""Python UDTF + grouped-agg UDAF surface (SURVEY §2 Part B, UDF row).

Two small, production-shaped examples completing the UDF/UDAF/UDTF API
coverage:

- ``ShingleExplode`` (UDTF): one input row -> one row per k-gram
  shingle, with position — the table-function form of the shingling
  stage dedup pipelines start from. Registered per-session via
  ``register_udtfs``; usable from SQL as
  ``SELECT * FROM shingle_explode('some text', 3)``.
- ``median_udaf`` (grouped-agg pandas UDF): exact per-group median —
  the Arrow-batched aggregate form (one value per group, no
  collect_list blowup).

Both are the *slow path* by design (Python workers): use builtin
expressions when they can express the op; reach for these shapes when
they cannot (custom tokenizers, model scoring, exotic statistics).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="pos int, shingle string")
class ShingleExplode:
    """Word k-gram shingles of a text, with shingle position."""

    def eval(self, text: str, k: int):
        if not text or k <= 0:
            return
        words = text.split()
        for i in range(max(0, len(words) - k + 1)):
            yield i, " ".join(words[i : i + k])


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median as a grouped-agg pandas UDF (Arrow transfer, one
    scalar per group)."""
    return float(v.median())


def register_udtfs(spark) -> None:
    spark.udtf.register("shingle_explode", ShingleExplode)
