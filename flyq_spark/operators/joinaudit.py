"""Join pre-flight auditing and runtime-filter pruning [EXT].

Two tools for the moment BEFORE a 100 TB join runs:

``join_preflight`` answers "how big is this join, and which keys are
hot?" WITHOUT materializing the join. |A ⋈ B| on an equi-key is exactly
``Σ_k cnt_A(k) · cnt_B(k)`` — two map-side-combined per-key counts and
one equi-join of the (tiny) count tables. At 100 TB this costs two
aggregation passes over key columns only (column-pruned scans), versus
an output that might be quadratically larger than either input. The
per-key `pairs` column is the skew report: a key contributing 10^9
pairs is the straggler AQE's skew split will have to carve up — or the
key you pre-aggregate/salt before joining at all.

``bloom_semi_join`` is the runtime-filter pattern (Spark's own
``spark.sql.optimizer.runtimeFilter.bloomFilter`` applies it inside
joins; here it is an explicit operator for semi-join pipelines): build
a Bloom bitmap from the small side's keys, broadcast it as a literal
array, and drop big-side rows whose key provably isn't present BEFORE
the shuffle. False positives are removed by an exact left-semi join on
the survivors, so the result is bit-identical to the plain semi-join —
the bitmap only moves work off the wire. With the default 2^17 bits the
broadcast is 16 KiB; membership is a zero-shuffle JVM projection
(xxhash64 + bit tests, whole-stage codegen).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_preflight(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    min_pairs: int = 1,
) -> DataFrame:
    """Exact per-key equi-join cardinality without running the join.

    Output: one row per join key present on BOTH sides with
    ``(key, n_left, n_right, pairs)`` where ``pairs = n_left * n_right``
    is that key's contribution to |left ⋈ right|. ``min_pairs`` bounds
    the report to keys at or above the threshold (1 = every matching
    key). NULL keys never match an equi-join and are excluded.

    Total join size = ``sum(pairs)``; the ``pairs`` ordering is the
    skew profile. Both inputs are scanned once over the key column
    only (column pruning), aggregated map-side; the final join is
    |distinct keys|-sized.
    """
    right_on = right_on or left_on
    lc = (
        left.where(F.col(left_on).isNotNull())
        .groupBy(F.col(left_on).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    rc = (
        right.where(F.col(right_on).isNotNull())
        .groupBy(F.col(right_on).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    out = lc.join(rc, on="key").withColumn(
        "pairs", F.col("n_left") * F.col("n_right")
    )
    if min_pairs > 1:
        out = out.where(F.col("pairs") >= min_pairs)
    return out


def _bloom_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions for a key by double hashing (Kirsch–Mitzenmacher:
    ``h1 + i·h2 mod m`` preserves the Bloom false-positive bound with
    TWO hash evaluations instead of k) — xxhash64 JVM-side, codegen'd.
    h2 is forced odd so it is a unit mod the power-of-two ``num_bits``
    (an even h2 would cycle positions through a subgroup)."""
    # reduce mod m BEFORE combining: ANSI mode (on by default) makes a
    # raw h1 + i*h2 long overflow a runtime error, and the reduced sum
    # h1' + i*h2' < (k+1)*m never overflows
    h1 = F.pmod(F.xxhash64(F.lit(0), key), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(F.lit(1), key), F.lit(num_bits)).bitwiseOR(
        F.lit(1).cast("long")
    )
    return [
        F.pmod(h1 + F.lit(i).cast("long") * h2, F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_on: str,
    small_on: str | None = None,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """``big LEFT SEMI JOIN small`` with a broadcast Bloom pre-filter.

    Result is EXACTLY the plain left-semi join (the bitmap admits false
    positives; the closing semi-join removes them) — the bitmap's job
    is to drop non-matching big-side rows before they are shuffled.
    With |small keys| = n, the false-positive rate is roughly
    ``(1 - e^(-kn/m))^k``; the 2^17-bit / 5-hash default is <1% up to
    ~10k distinct keys. Size ``num_bits`` to the small side — the
    bitmap is m/64 longs broadcast as a literal (16 KiB at 2^17).

    The small side's distinct keys are aggregated to bitmap words
    distributively (bit-OR partial aggregation), and only the
    word-indexed bitmap — never the keys — is collected to the driver
    (model-sized state, like a centroid matrix).
    """
    small_on = small_on or big_on
    if num_bits < 64 or num_bits & (num_bits - 1):
        # power-of-two m keeps the odd h2 a unit mod m (every key walks
        # all m positions) and makes the word math exact
        raise ValueError(f"num_bits must be a power of two >= 64: {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1: {num_hashes}")
    n_words = (num_bits + 63) // 64
    key = F.col(small_on)
    pos = F.explode(F.array(*_bloom_positions(key, num_bits, num_hashes)))
    words = (
        small.where(key.isNotNull())
        .select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("int").alias("_w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("_pos") % 64).cast("int")
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["_w"]] = r["_bits"]
    # ONE array Literal (constant in codegen) — F.array(*lits) would be
    # a per-row CreateArray over n_words children
    bitmap_lit = F.lit(bitmap)
    checks = [
        F.element_at(bitmap_lit, (p / 64).cast("int") + 1).bitwiseAND(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
            )
        )
        != 0
        for p in _bloom_positions(F.col(big_on), num_bits, num_hashes)
    ]
    prefiltered = big.where(reduce(lambda a, b: a & b, checks))
    # null-keys-impossible: faithful to inner-equi-join semantics
    return prefiltered.join(
        small.select(F.col(small_on).alias(big_on)).distinct(),
        on=big_on,
        how="left_semi",
    )


def skew_split_join(
    big: DataFrame,
    dim: DataFrame,
    big_on: str,
    dim_on: str | None = None,
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Inner equi-join with explicit hot-key splitting — the manual form
    of AQE's skew-join handling, for when the skew is known up front
    (``join_preflight`` tells you): keys whose big-side count reaches
    ``hot_threshold`` take the BROADCAST path (their dim rows replicate
    to wherever the big rows already sit — no shuffle of the hot mass),
    everything else takes the normal shuffle join. The union is
    row-for-row the plain inner join — the split is purely physical, so
    the oracle hash match against the plain join proves it
    semantics-free.

    Requires |hot keys| × dim-rows-per-key to be broadcast-sized — true
    by construction when hot keys are few (that is what makes them
    hot). NULL keys match nothing, as in any inner equi-join.
    """
    dim_on = dim_on or big_on
    counts = (
        big.where(F.col(big_on).isNotNull())
        .groupBy(F.col(big_on).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    hot = counts.where(F.col("_n") >= hot_threshold).select("_k")
    dim_keyed = dim.withColumnRenamed(dim_on, big_on) if dim_on != big_on else dim
    hot_b = F.broadcast(hot.withColumnRenamed("_k", big_on))
    # null-keys-impossible: inner-equi-join-faithful (docstring: NULL
    # keys match nothing on every path, exactly like the plain join)
    big_hot = big.join(hot_b, on=big_on, how="left_semi")
    # null-keys-impossible: inner-equi-join-faithful (see above)
    big_cold = big.join(hot_b, on=big_on, how="left_anti")
    # null-keys-impossible: inner-equi-join-faithful (see above)
    dim_hot = dim_keyed.join(hot_b, on=big_on, how="left_semi")
    # null-keys-impossible: inner-equi-join-faithful (see above)
    hot_path = big_hot.join(F.broadcast(dim_hot), on=big_on)
    # null-keys-impossible: inner-equi-join-faithful (see above)
    cold_path = big_cold.join(dim_keyed, on=big_on)
    return hot_path.unionByName(cold_path)


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    sample_den: int = 64,
) -> DataFrame:
    """SAMPLED join-cardinality estimate — ``join_preflight`` priced
    for 100 TB inputs: instead of counting every key on both sides,
    keep only keys whose 60-bit md5 lands in residue 0 mod
    ``sample_den`` (a deterministic 1/den COORDINATED key sample —
    the same keys survive on both sides, so the sampled join is a
    true sub-join) and scale the exact sampled pair count back up.

    The estimator is unbiased over the key-hash draw
    (E[den·X] = true size) and EXACT integer arithmetic end to end:
    est_pairs = den · Σ_{sampled k} cnt_l(k)·cnt_r(k). Every number
    is replayable by an engine that computes the same md5, so even
    the "estimate" hash-checks. Accuracy is the usual key-sampling
    trade: heavy keys are either in the sample (fully counted) or
    not, so variance is driven by the largest keys — when the
    preflight's job is skew DETECTION, run it at den=1 on the
    suspect keys (that is exactly ``join_preflight``).

    Scale shape: the residue filter is a zero-shuffle projection
    that drops (den−1)/den of both inputs BEFORE the per-key count
    aggregations; everything downstream costs 1/den of the exact
    preflight. NULL keys hash to NULL and fall out of the sample —
    correct, because an inner join never matches them either.
    Output: one row (sample_den, n_sampled_keys, sampled_pairs,
    est_pairs); n_sampled_keys counts sampled keys present on BOTH
    sides.
    """
    if sample_den < 1:
        raise ValueError(f"sample_den must be >= 1: {sample_den}")
    right_on = right_on or left_on

    def sampled_counts(df: DataFrame, col: str) -> DataFrame:
        h = F.conv(
            F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
        ).cast("long")
        return (
            df.select(F.col(col).alias("_k"), h.alias("_h"))
            .where(F.col("_h") % F.lit(sample_den) == 0)
            .groupBy("_k")
            .agg(F.count(F.lit(1)).alias("_c"))
        )

    lc = sampled_counts(left, left_on)
    rc = sampled_counts(right, right_on)
    pairs = lc.join(rc.withColumnRenamed("_c", "_c2"), on="_k").select(
        (F.col("_c") * F.col("_c2")).alias("_p")
    )
    return pairs.agg(
        F.lit(sample_den).cast("long").alias("sample_den"),
        F.count(F.lit(1)).cast("long").alias("n_sampled_keys"),
        F.coalesce(F.sum("_p"), F.lit(0)).cast("long").alias("sampled_pairs"),
        (F.lit(sample_den) * F.coalesce(F.sum("_p"), F.lit(0)))
        .cast("long")
        .alias("est_pairs"),
    )
