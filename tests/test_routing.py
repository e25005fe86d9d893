"""Routing tests (A2/A3) — semantics + the scale contract (routing must be
a pure projection: no Exchange, no Window in the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flyq_spark.operators.routing import route


def _messages_df(spark, n=20, keyed=True):
    df = spark.range(n).select(
        F.col("id").alias("seq"),
        (
            F.encode((F.col("id") % 5).cast("string"), "utf-8")
            if keyed
            else F.lit(None).cast("binary")
        ).alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
    )
    return df


def test_keyed_routing_stable_and_in_range(spark):
    routed = route(_messages_df(spark), 4)
    rows = routed.select("key", "partition").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(bytes(r["key"]), set()).add(r["partition"])
    assert all(len(ps) == 1 for ps in by_key.values())
    assert all(0 <= p < 4 for ps in by_key.values() for p in ps)


def test_round_robin_exact_assignment_and_cursor(spark):
    """Keyless: partition = (cursor + seq) % n — the deterministic
    restatement of topic.rs:80-83, with the cursor persisted across
    batches (stronger than the reference, which resets on restart)."""
    routed = route(_messages_df(spark, n=8, keyed=False), 4, rr_cursor=0)
    got = {r["seq"]: r["partition"] for r in routed.collect()}
    assert got == {i: i % 4 for i in range(8)}
    shifted = route(_messages_df(spark, n=8, keyed=False), 4, rr_cursor=2)
    got = {r["seq"]: r["partition"] for r in shifted.collect()}
    assert got == {i: (2 + i) % 4 for i in range(8)}


def test_empty_key_routes_as_keyless(spark):
    """Quirk Q1 (message.rs:83-92): empty-bytes key == no key."""
    df = spark.range(4).select(
        F.col("id").alias("seq"),
        F.encode(F.lit(""), "utf-8").alias("key"),
        F.lit(b"v").alias("value"),
    )
    routed = route(df, 4)
    got = {r["seq"]: r["partition"] for r in routed.collect()}
    assert got == {i: i % 4 for i in range(4)}


def test_routing_plan_is_pure_projection(spark):
    """The scale contract: no Exchange (shuffle) and no Window in the
    routing plan — a 100 TB keyless batch must not serialize anywhere."""
    routed = route(_messages_df(spark, n=100, keyed=False), 8)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Window" not in plan


def test_single_partition_short_circuit(spark):
    routed = route(_messages_df(spark, n=5), 1)
    assert {r["partition"] for r in routed.collect()} == {0}


def test_unknown_method_raises(spark):
    with pytest.raises(ValueError, match="unknown routing method"):
        route(_messages_df(spark), 4, method="xxh64-typo")


def test_existing_partition_column_raises_without_overwrite(spark):
    df = _messages_df(spark).withColumn("partition", F.lit(0))
    with pytest.raises(ValueError, match="partition"):
        route(df, 4)
    rerouted = route(df, 4, overwrite=True)
    assert len({r["partition"] for r in rerouted.collect()}) > 1


def test_mod_method_matches_numeric_mod(spark):
    df = spark.range(12).select(
        F.col("id").alias("seq"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
    )
    routed = route(df, 4, method="mod")
    got = {r["seq"]: r["partition"] for r in routed.collect()}
    assert got == {i: i % 4 for i in range(12)}


def test_xxh3_routing_bit_exact_without_c_package(spark):
    """method='xxh3' must work in this container (no xxhash package) via
    the pure-Python XXH3 fallback, and every executor-side assignment
    must equal the driver-side reference formula
    (xxh3_64(key) as u32) % n  — flyq topic.rs:90-93."""
    from flyq_spark.functions.hashing import flyq_partition_for_key
    from flyq_spark.operators.routing import route

    keys = [f"user-{i}".encode() for i in range(64)] + [b"\x00\xff" * 9]
    df = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "key binary, seq long"
    )
    got = {
        bytes(r["key"]): r["partition"]
        for r in route(df, 8, method="xxh3").collect()
    }
    assert got == {k: flyq_partition_for_key(k, 8) for k in keys}
