"""Bucketing evidence: pre-bucketed tables joined on the bucket key must
not shuffle either side — the co-located join the 100 TB design leans on
for repeated joins against the same key (SURVEY §2 Part B scans row)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li"))
        .mode("overwrite")
        .saveAsTable("bt_lineitem")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "ord"))
        .mode("overwrite")
        .saveAsTable("bt_orders")
    )
    yield spark.table("bt_lineitem"), spark.table("bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    bt_li, bt_ord = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = bt_li.join(bt_ord, bt_li.l_orderkey == bt_ord.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces both shuffles
        # and the result is right
        n = joined.count()
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        assert n == li.count()  # every lineitem has its order
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
