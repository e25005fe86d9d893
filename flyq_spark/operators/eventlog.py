"""Deterministic events→log construction (A1 dataflow form).

The driver's oracle gate compares Spark DataFrames against DuckDB SQL over
the same parquet fixtures, so the oracle-checked produce path must be
re-computable by a plain SQL engine. This module builds the FlyQ log shape
from the ``events`` table with:

- keyed routing ``partition = key % n`` (routing method "mod" — the oracle
  cannot evaluate xxhash64/xxh3; the hash-based methods are covered by
  pytest instead, operators/routing.py);
- arrival order ``seq = event_id`` (driver fixtures guarantee event_id is
  a dense 0..N-1 arrival sequence);
- dense offsets ``row_number() over (partition by partition order by seq)
  - 1`` — exactly the engine's assignment (operators/offsets.py, reference
  flyq-server/src/core/partition_state.rs:27-29).

Column names are oracle-safe (``partition``/``offset``/``key``/``value``
are SQL keywords in DuckDB): part_id, seq, msg_key, msg_ts, msg_value.

At scale this is one shuffle by ``part_id`` (which any partitioned write
needs anyway); routing itself is a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flyq_spark.io import read_table

N_PARTITIONS = 4


def events_log(spark: SparkSession, sf_dir: str, n_partitions: int = N_PARTITIONS) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    routed = ev.select(
        F.pmod(F.col("user_id"), F.lit(n_partitions)).cast("long").alias("part_id"),
        F.col("event_id").alias("seq"),
        F.col("user_id").alias("msg_key"),
        F.col("ts").alias("msg_ts"),
        F.col("props").alias("msg_value"),
        F.col("event_type"),
        F.col("value").alias("metric"),
    )
    w = Window.partitionBy("part_id").orderBy("seq")
    return routed.withColumn(
        "msg_offset", (F.row_number().over(w) - 1).cast("long")
    )


# The identical construction as a DuckDB CTE, shared by every oracle SQL
# string in __spark_entry__.py so engine and oracle can never drift.
EVENTS_LOG_CTE = f"""
log AS (
  SELECT
    user_id % {N_PARTITIONS}                    AS part_id,
    event_id                                    AS seq,
    user_id                                     AS msg_key,
    ts                                          AS msg_ts,
    props                                       AS msg_value,
    event_type,
    value                                       AS metric,
    row_number() OVER (PARTITION BY user_id % {N_PARTITIONS} ORDER BY event_id) - 1
                                                AS msg_offset
  FROM events
)
""".strip()
