"""Edit-distance fuzzy matching [EXT].

Near-duplicate detection at EDIT granularity — typo-level variants of
titles, names, or short fields that token/shingle dedup cannot see
(one character flip changes no word boundary but every shingle through
it). The scalable construction is SymSpell's delete-neighborhood
blocking (symmetric delete spelling correction, public algorithm):

    d(a, b) <= k  =>  the depth-k delete neighborhoods of a and b
                      intersect

(align the <= k edits; deleting the edited positions from both sides
yields a common string). So candidate generation is an EQUI-JOIN on
delete-variant keys — never an all-pairs comparison — and the exact
``levenshtein`` verify runs on candidates only, giving 100% recall at
the stated ``max_dist``. The same two-stage shape as the MinHash /
SimHash / pigeonhole families in :mod:`dedup`.

Scale: a string of length L generates O(L^k) variant keys (L+1 at
k=1), each carried as a 16-byte md5 — linear blowup at k=1 on short
fields, and the operator REFUSES k > 2 or unbounded field lengths
rather than letting the neighborhood explode. Designed for short
columns (titles, names, codes), which is where edit distance is
meaningful anyway; document bodies belong to the shingle/MinHash
family.

The reference has no fuzzy matching (keys are opaque bytes,
flyq-protocol/src/message.rs); this is [EXT] pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flyq_spark.operators.util import fan_out

#: neighborhood size is O(L^k); beyond 2 the blowup dominates any join
_MAX_SUPPORTED_DIST = 2


def delete_variants(col: Column, max_dist: int) -> Column:
    """Array of DISTINCT strings reachable from ``col`` by at most
    ``max_dist`` character deletions (the string itself included).
    Pure JVM higher-order functions — no Python in the path."""
    if not 0 <= max_dist <= _MAX_SUPPORTED_DIST:
        raise ValueError(
            f"max_dist must be in [0, {_MAX_SUPPORTED_DIST}], got {max_dist}"
        )
    arr = F.array(col)
    for _ in range(max_dist):
        deletes = F.flatten(
            F.transform(
                arr,
                lambda s: F.when(F.length(s) == 0, F.array()).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
                        lambda i: F.concat(
                            F.substring(s, F.lit(1), i - 1),
                            s.substr(i + 1, F.length(s)),
                        ),
                    )
                ),
            )
        )
        arr = F.array_distinct(F.concat(arr, deletes))
    return arr


def edit_distance_pairs(
    df: DataFrame,
    max_dist: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 64,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist`` — exact, via
    SymSpell delete-neighborhood candidate generation + levenshtein
    verify (see module docstring for the recall argument). NULL fields
    never match (no edit distance is defined to NULL). Fields longer
    than ``max_len`` are REJECTED with a row-level error rather than
    silently exploding the variant space — truncate or shingle long
    text upstream.

    Plan: one narrow variant explode per row (variants carried as md5
    keys), an equi-self-join on the variant key, distinct candidate
    pairs, then the verify on candidates only. The variant frame is
    NOT persisted: Spark's cache manager substitutes cached fragments
    into ANY matching plan globally, which made unrelated gate queries'
    plan shapes order-dependent — recomputing the narrow variant
    projection on each join side is the cheaper, deterministic trade.
    Output: (id_a, id_b, dist) with id_a < id_b."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    guarded = F.when(
        F.length(F.col(text_col)) > max_len,
        F.raise_error(
            F.format_string(
                f"edit_distance_pairs: field longer than max_len={max_len} "
                "(len=%s) — truncate upstream or raise max_len",
                F.length(F.col(text_col)).cast("string"),
            )
        ),
    ).otherwise(F.col(text_col))
    variants = (
        fan_out(df.where(F.col(text_col).isNotNull()))
        .select(F.col(id_col), guarded.alias("_s"))
        .select(
            id_col,
            "_s",
            F.explode(delete_variants(F.col("_s"), max_dist)).alias("_v"),
        )
        .select(id_col, "_s", F.md5(F.col("_v")).alias("_vh"))
    )
    a = variants.select(
        F.col(id_col).alias("id_a"), F.col("_s").alias("_sa"), "_vh"
    )
    b = variants.select(
        F.col(id_col).alias("id_b"), F.col("_s").alias("_sb"), "_vh"
    )
    cand = (
        a.join(b, "_vh")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.levenshtein("_sa", "_sb").alias("dist"),
    ).where(F.col("dist") <= F.lit(max_dist))
