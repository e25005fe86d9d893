"""Distributed ranking (operators/ranking.py): the range-partitioned
global row_number / exact NTILE must be value-identical to the naive
single-partition window functions for ANY row count, tile count, and
partition count — including N < tiles, N smaller than the partition
count (empty ranges), ties broken by the caller's tiebreak column, and
NULL ordering keys."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flyq_spark.operators.ranking import global_row_number, ntile_exact


def _frame(spark, n, with_nulls=False):
    rows = []
    for i in range(n):
        v = None if (with_nulls and i % 7 == 3) else (i * 37) % 11
        rows.append((i, v))
    return spark.createDataFrame(rows, "id long, v int")


@pytest.mark.parametrize("n,parts", [(0, 4), (1, 4), (3, 8), (97, 4), (200, 3)])
def test_global_row_number_matches_window(spark, n, parts):
    df = _frame(spark, n)
    order = [F.col("v").asc_nulls_last(), F.col("id").asc()]
    got = {
        r["id"]: (r["rank"], r["tot"])
        for r in global_row_number(
            df, order, rank_col="rank", total_col="tot", num_partitions=parts
        ).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["id"]: (r["rank"], n)
        for r in df.select(
            "id", F.row_number().over(w).cast("long").alias("rank")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize(
    "n,tiles,parts",
    [(0, 4, 4), (1, 4, 4), (3, 5, 4), (4, 4, 2), (97, 4, 8), (100, 7, 3), (23, 1, 4)],
)
def test_ntile_exact_matches_window_ntile(spark, n, tiles, parts):
    df = _frame(spark, n, with_nulls=True)
    order = [F.col("v").desc_nulls_last(), F.col("id").asc()]
    got = {
        r["id"]: r["q"]
        for r in ntile_exact(df, order, tiles, "q", num_partitions=parts).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["q"]
        for r in df.select("id", F.ntile(tiles).over(w).alias("q")).collect()
    }
    assert got == want


def test_ntile_exact_rejects_bad_tiles(spark):
    with pytest.raises(ValueError):
        ntile_exact(_frame(spark, 5), [F.col("id").asc()], 0, "q")


def test_ranking_plan_has_no_data_sized_global_window(spark):
    """The ONLY partition-less window in the plan must order by the
    _gpid offset-table marker (≤ num_partitions rows); every other
    window must carry a partition spec."""
    from tools.plan_snapshot import partitionless_specs

    df = ntile_exact(
        _frame(spark, 50),
        [F.col("v").asc_nulls_last(), F.col("id").asc()],
        4,
        "q",
        num_partitions=4,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = [
        fa for fa in partitionless_specs(plan) if not fa.startswith("_gpid#")
    ]
    assert bad == [], bad


def test_global_prefix_sums_matches_window(spark):
    """Prefix sums over a total order must equal the naive running
    window, including negative deltas and multiple sum columns."""
    from flyq_spark.operators.ranking import global_prefix_sums

    rows = [(i, (i * 37) % 11 - 5, (i * 13) % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: (r["cx"], r["cy"])
        for r in global_prefix_sums(
            df,
            [F.col("id").asc()],
            {"cx": F.col("x"), "cy": F.col("y")},
            num_partitions=7,
        ).collect()
    }
    w = (
        Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: (r["cx"], r["cy"])
        for r in df.select(
            "id",
            F.sum("x").over(w).alias("cx"),
            F.sum("y").over(w).alias("cy"),
        ).collect()
    }
    assert got == want


def test_prefix_sums_plan_has_no_data_sized_global_window(spark):
    from flyq_spark.operators.ranking import global_prefix_sums
    from tools.plan_snapshot import partitionless_specs

    df = spark.createDataFrame(
        [(i, i % 5) for i in range(50)], "id long, x long"
    )
    out = global_prefix_sums(
        df, [F.col("id").asc()], {"cx": F.col("x")}, num_partitions=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    bad = [fa for fa in partitionless_specs(plan) if not fa.startswith("_gpid#")]
    assert bad == [], bad


def _gframe(spark, n, n_groups=4, with_null_group=False):
    rows = []
    for i in range(n):
        g = None if (with_null_group and i % 11 == 5) else f"g{i % n_groups}"
        rows.append((i, (i * 37) % 13, g))
    return spark.createDataFrame(rows, "id long, v int, g string")


@pytest.mark.parametrize(
    "n,parts,nullg", [(0, 4, False), (1, 4, False), (97, 4, True), (200, 3, True)]
)
def test_grouped_row_number_matches_window(spark, n, parts, nullg):
    """grouped_row_number must be value-identical to
    row_number()/count() OVER (PARTITION BY g ORDER BY ...) including
    NULL group keys (a real group) and empty input."""
    from flyq_spark.operators.ranking import grouped_row_number

    df = _gframe(spark, n, with_null_group=nullg)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: (r["rk"], r["n"])
        for r in grouped_row_number(
            df, ["g"], order, rank_col="rk", total_col="n", num_partitions=parts
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    wt = Window.partitionBy("g")
    want = {
        r["id"]: (r["rk"], r["n"])
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rk"),
            F.count(F.lit(1)).over(wt).cast("long").alias("n"),
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,tiles,parts", [(3, 5, 4), (97, 4, 8), (100, 7, 3)])
def test_grouped_ntile_matches_window_ntile(spark, n, tiles, parts):
    from flyq_spark.operators.ranking import grouped_ntile

    df = _gframe(spark, n, with_null_group=True)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["q"]
        for r in grouped_ntile(
            df, ["g"], order, tiles, "q", num_partitions=parts
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        r["id"]: r["q"]
        for r in df.select("id", F.ntile(tiles).over(w).alias("q")).collect()
    }
    assert got == want


def test_grouped_prefix_sums_matches_window(spark):
    """Per-group running sums (negative deltas, NULL group key, carry
    across Arrow batches, group totals) must equal the naive windows."""
    from flyq_spark.operators.ranking import grouped_prefix_sums

    rows = [
        (i, (i * 37) % 11 - 5, None if i % 13 == 7 else f"g{i % 3}")
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, x long, g string")
    got = {
        r["id"]: (r["cx"], r["tx"])
        for r in grouped_prefix_sums(
            df,
            ["g"],
            [F.col("id").asc()],
            {"cx": F.col("x")},
            totals={"cx": "tx"},
            num_partitions=7,
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("g")
    want = {
        r["id"]: (r["cx"], r["tx"])
        for r in df.select(
            "id",
            F.sum("x").over(w).alias("cx"),
            F.sum("x").over(wt).alias("tx"),
        ).collect()
    }
    assert got == want


def test_grouped_prefix_sums_batch_boundary_carry(spark):
    """Force multi-batch Arrow streams (maxRecordsPerBatch=16) so the
    kernel's cross-batch carry and group-boundary reset both exercise:
    one giant group spanning many batches + group flips inside one
    partition."""
    from flyq_spark.operators.ranking import grouped_prefix_sums

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        rows = [(i, 1, "big" if i < 400 else f"s{i % 5}") for i in range(500)]
        df = spark.createDataFrame(rows, "id long, x long, g string")
        got = {
            r["id"]: r["cx"]
            for r in grouped_prefix_sums(
                df, ["g"], [F.col("id").asc()], {"cx": F.col("x")},
                num_partitions=3,
            ).collect()
        }
        w = (
            Window.partitionBy("g")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r["id"]: r["cx"]
            for r in df.select("id", F.sum("x").over(w).alias("cx")).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_grouped_prefix_sums_int64_overflow_raises(spark):
    """Crash-don't-wrap: a prefix sum crossing the int64 line raises
    loudly (the window SUM this kernel replaced crashed under ANSI;
    a silent numpy wrap would corrupt every downstream rank). Values
    BELOW the line — including past the cheap 2^62 bound, where the
    exact Python-int re-walk takes over — still compute exactly."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from flyq_spark.operators.ranking import grouped_prefix_sums

    big = 2**62
    safe = spark.createDataFrame(
        [(1, big, "g"), (2, big - 1, "g"), (3, -big, "g"), (4, 5, "g")],
        "id long, x long, g string",
    )
    got = {
        r["id"]: r["cx"]
        for r in grouped_prefix_sums(
            safe, ["g"], [F.col("id").asc()], {"cx": F.col("x")},
            num_partitions=1,
        ).collect()
    }
    assert got == {1: big, 2: 2 * big - 1, 3: big - 1, 4: big + 4}

    # crossing 2^63 - 1 mid-group: must raise, not wrap negative
    bad = spark.createDataFrame(
        [(1, big, "g"), (2, big, "g"), (3, 1, "g")],
        "id long, x long, g string",
    )
    with pytest.raises((PythonException, Py4JJavaError), match="int64"):
        grouped_prefix_sums(
            bad, ["g"], [F.col("id").asc()], {"cx": F.col("x")},
            num_partitions=1,
        ).collect()

    # an overflow in group A must not be masked by a reset into group B
    bad2 = spark.createDataFrame(
        [(1, big, "a"), (2, big, "a"), (3, 1, "b")],
        "id long, x long, g string",
    )
    with pytest.raises((PythonException, Py4JJavaError), match="int64"):
        grouped_prefix_sums(
            bad2, ["g"], [F.col("id").asc()], {"cx": F.col("x")},
            num_partitions=1,
        ).collect()


def test_grouped_plans_have_no_data_sized_windows(spark):
    """Grouped primitives may only window over offset tables: every
    window spec must be partitioned by _gg_* marker copies (≤(P+G)
    rows) — no window keyed by the raw group column, and the only
    partition-less specs must order by _gpid."""
    import re

    from flyq_spark.operators.ranking import grouped_prefix_sums, grouped_row_number
    from tools.plan_snapshot import partitionless_specs, window_specs

    df = spark.createDataFrame(
        [(i, i % 4, i % 3) for i in range(100)], "id long, x long, g int"
    )
    for out in (
        grouped_row_number(df, ["g"], [F.col("id").asc()], num_partitions=4),
        grouped_prefix_sums(
            df, ["g"], [F.col("id").asc()], {"cx": F.col("x")}, num_partitions=4
        ),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        bad = [
            fa for fa in partitionless_specs(plan) if not fa.startswith("_gpid#")
        ]
        assert bad == [], bad
        for spec in window_specs(plan):
            first = spec.split(",")[0].strip()
            # partitioned specs must key on the _gg_* offset-table copies
            if " ASC" not in first and " DESC" not in first:
                assert re.match(r"_gg_\d+#", first), spec[:80]


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_grouped_prefix_sums_randomized_vs_python_model(spark, seed):
    """Seeded randomized differential: random group counts (incl. NULL
    and single-row groups), negative deltas, duplicate values broken by
    id, random partition counts — grouped_prefix_sums and
    grouped_row_number vs a pure-Python fold of the sorted rows."""
    import random

    from flyq_spark.operators.ranking import (
        grouped_prefix_sums,
        grouped_row_number,
    )

    rng = random.Random(seed)
    n = rng.randint(1, 400)
    groups = [None, "a", "b", "c", "dd"][: rng.randint(1, 5)]
    rows = [
        (i, rng.choice(groups), rng.randint(-50, 50))
        for i in range(n)
    ]
    parts = rng.choice([1, 2, 3, 8, 50])
    df = spark.createDataFrame(rows, "id long, g string, x long")

    # python model: per-group cumsum / rank in id order
    cum: dict = {}
    cnt: dict = {}
    want_ps, want_rn = {}, {}
    for i, g, x in rows:  # already id-ordered
        cum[g] = cum.get(g, 0) + x
        cnt[g] = cnt.get(g, 0) + 1
        want_ps[i] = cum[g]
        want_rn[i] = cnt[g]
    tot = dict(cnt)

    got_ps = {
        r["id"]: r["cx"]
        for r in grouped_prefix_sums(
            df, ["g"], [F.col("id").asc()], {"cx": F.col("x")},
            num_partitions=parts,
        ).collect()
    }
    assert got_ps == want_ps

    got_rn = {
        r["id"]: (r["rk"], r["nt"])
        for r in grouped_row_number(
            df, ["g"], [F.col("id").asc()], rank_col="rk", total_col="nt",
            num_partitions=parts,
        ).collect()
    }
    assert got_rn == {i: (want_rn[i], tot[g]) for i, g, _ in rows}


def test_grouped_prefix_agg_max_min_matches_window(spark):
    """Running max/min (grouped_prefix_agg) vs the naive cumulative
    windows: per-group extremes with negative values, NULL group keys,
    group totals, and forced 16-row Arrow batches so cross-batch carry
    combines via maximum/minimum rather than addition."""
    from flyq_spark.operators.ranking import grouped_prefix_agg

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        rows = [
            (i, ((i * 37) % 23) - 11, None if i % 13 == 7 else f"g{i % 3}")
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "id long, x long, g string")
        got = {
            r["id"]: (r["mx"], r["mn"], r["gmax"])
            for r in grouped_prefix_agg(
                df,
                ["g"],
                [F.col("id").asc()],
                {"mx": ("max", F.col("x")), "mn": ("min", F.col("x"))},
                totals={"mx": "gmax"},
                num_partitions=5,
            ).collect()
        }
        w = (
            Window.partitionBy("g")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy("g")
        want = {
            r["id"]: (r["mx"], r["mn"], r["gmax"])
            for r in df.select(
                "id",
                F.max("x").over(w).alias("mx"),
                F.min("x").over(w).alias("mn"),
                F.max("x").over(wt).alias("gmax"),
            ).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    with pytest.raises(ValueError):
        grouped_prefix_agg(
            df, ["g"], [F.col("id").asc()], {"z": ("median", F.col("x"))}
        )
