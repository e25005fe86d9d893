"""Partition routing (SURVEY A2/A3).

Reference semantics (flyq-server/src/core/topic.rs:76-93):

- keyed message  -> ``xxh3_64(key) as u32 % partition_count``
- keyless        -> round-robin cursor ``(next_partition + 1) % n`` per topic

Spark restatement:

- keyed: ``pmod(xxhash64(key), n)`` by default — JVM-side, codegen'd,
  scale-correct. Spark's ``xxhash64`` is XXH64(seed=42), not XXH3, so it is
  not bit-identical to the reference hash. When the ``xxhash`` package is
  available we offer exact XXH3 parity via an Arrow-batched Pandas UDF
  (``method="xxh3"``); it is import-gated because the package is not part
  of this environment.
- keyless: the reference's mutable cursor is foreign to a declarative plan
  (and resets to 0 on broker restart anyway, topic.rs:35), so we restate it
  deterministically: the i-th keyless message of the batch (in `seq` order)
  goes to partition ``i % n``.

Quirk Q1 (flyq-protocol/src/message.rs:83-92): a zero-length key decodes as
``None``; we treat empty keys as keyless, matching the round-trip behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

try:  # optional exact-parity path; not installed in the test container
    import xxhash  # type: ignore

    HAVE_XXHASH = True
except Exception:  # pragma: no cover
    xxhash = None
    HAVE_XXHASH = False


def _is_keyless(key: Column) -> Column:
    return key.isNull() | (F.length(key) == 0)


def _xxh3_partition_udf(n_partitions: int):
    """Bit-exact reference routing (topic.rs:90-93): xxh3_64(key) as u32 % n."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def xxh3_route(keys: pd.Series) -> pd.Series:
        return keys.map(
            lambda k: int(
                (xxhash.xxh3_64_intdigest(bytes(k)) & 0xFFFFFFFF) % n_partitions
            )
        ).astype("int32")

    return xxh3_route


def route(
    df: DataFrame,
    n_partitions: int,
    seq_col: str = "seq",
    method: str = "xxhash64",
) -> DataFrame:
    """Add a ``partition`` column. Input needs `key` and a total-order `seq`.

    ``method``: "xxhash64" (default, built-in) | "xxh3" (exact reference
    parity, needs the xxhash package) | "mod" (``pmod(crc-free numeric key)``
    is not applicable to binary keys; "mod" hashes by key length+bytes via
    xxhash64 too — kept for API symmetry).
    """
    if "partition" in df.columns:
        return df
    if n_partitions == 1:
        return df.withColumn("partition", F.lit(0))

    keyless = _is_keyless(F.col("key"))
    if method == "xxh3":
        if not HAVE_XXHASH:
            raise RuntimeError("method='xxh3' requires the xxhash package")
        keyed_part = _xxh3_partition_udf(n_partitions)(F.col("key"))
    else:
        keyed_part = F.pmod(F.xxhash64(F.col("key")), F.lit(n_partitions)).cast("int")

    # Round-robin over the keyless subset, in arrival (`seq`) order. The
    # window is per-batch and keyless rows only — at scale this is one
    # narrow shuffle over the keyless minority; keyed rows never shuffle
    # here (routing is a pure projection).
    rr_rank = F.row_number().over(
        Window.partitionBy(F.lit(0)).orderBy(F.col(seq_col))
    )
    keyless_df = (
        df.where(keyless)
        .withColumn("partition", ((rr_rank - 1) % n_partitions).cast("int"))
    )
    keyed_df = df.where(~keyless).withColumn("partition", keyed_part)
    return keyed_df.unionByName(keyless_df)
