"""KS drift (exact integer two-sample Kolmogorov-Smirnov) and
equal-frequency binning (operators/profile.py ks_drift,
operators/impute.py quantile_bins): statistics pinned against scipy-
style hand computations and the naive window formulations."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_ks_identical_distributions_is_zero(spark):
    from flyq_spark.operators.profile import ks_drift

    a = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5] * 4], "c long")
    r = ks_drift(a, a, F.col("c")).collect()[0]
    assert (r["ks_num"], r["ks_den"]) == (0, 400)


def test_ks_known_value(spark):
    """A = {1,2,3,4}, B = {3,4,5,6}: CDF gap peaks at v=2 (2/4 - 0/4),
    ks = 1/2 -> ks_num = 2*4*? ... exact: |cum_a*n_b - cum_b*n_a| at
    v=2 is |2*4 - 0*4| = 8 over den 16."""
    from flyq_spark.operators.profile import ks_drift

    a = spark.createDataFrame([(1,), (2,), (3,), (4,)], "c long")
    b = spark.createDataFrame([(3,), (4,), (5,), (6,)], "c long")
    r = ks_drift(a, b, F.col("c")).collect()[0]
    assert (r["n_a"], r["n_b"], r["ks_num"], r["ks_den"], r["at_value"]) == (
        4, 4, 8, 16, 2,
    )


def test_ks_detects_variance_drift_mean_blind(spark):
    """Same mean, doubled spread: a moment check on the mean sees
    nothing, KS fires."""
    from flyq_spark.operators.profile import ks_drift

    a = spark.createDataFrame([(v,) for v in range(40, 61)], "c long")
    b = spark.createDataFrame([(v,) for v in range(30, 71)], "c long")
    r = ks_drift(a, b, F.col("c")).collect()[0]
    assert r["ks_num"] > 0
    # means identical (50), so a mean-drift check is blind by design


def test_quantile_bins_match_window_ntile(spark):
    from flyq_spark.operators.impute import quantile_bins

    rows = [(i, (i * 37) % 23, None if i % 9 == 4 else (i * 5) % 17)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: (r["x_bin"], r["y_bin"])
        for r in quantile_bins(
            df, "id", {"x": F.col("x"), "y": F.col("y")}, n_bins=7,
            num_partitions=5,
        ).collect()
    }
    wx = Window.orderBy(F.col("x").asc_nulls_last(), F.col("id").asc())
    wy = Window.orderBy(F.col("y").asc_nulls_last(), F.col("id").asc())
    want = {
        r["id"]: (r["x_bin"], r["y_bin"])
        for r in df.select(
            "id",
            F.ntile(7).over(wx).alias("x_bin"),
            F.ntile(7).over(wy).alias("y_bin"),
        ).collect()
    }
    assert got == want


def test_quantile_normalize_properties(spark):
    """After normalization every group draws its values from the SAME
    pooled reference set, the map is monotone within a group, and the
    reference at centile 100 is the pooled maximum."""
    from flyq_spark.operators.impute import quantile_normalize

    rows = (
        [(i, "a", i * 2) for i in range(100)]  # evens 0..198
        + [(1000 + i, "b", 500 + i * 3) for i in range(50)]  # shifted
    )
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = quantile_normalize(df, "g", F.col("v"), "id", n_quantiles=10).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["g"], []).append(r)
    pooled_sorted = sorted(v for _, _, v in rows)
    ref_values = {r["value_normalized"] for r in out}
    # references come from the pooled distribution
    assert ref_values <= set(pooled_sorted)
    assert max(ref_values) == max(pooled_sorted)  # centile 10/10 = max
    for g, rs in by_group.items():
        rs.sort(key=lambda r: (r["value_raw"], r["id"]))
        norm = [r["value_normalized"] for r in rs]
        assert norm == sorted(norm), f"non-monotone map in group {g}"
        # both groups use the same 10-row reference table
        assert {r["quantile"] for r in rs} == set(range(1, 11))
    # cross-group calibration: group b's raw values all exceed group
    # a's median, but its normalized LOW centiles now sit at pooled-low
    # values shared with group a
    a_norm = {r["quantile"]: r["value_normalized"] for r in by_group["a"]}
    b_norm = {r["quantile"]: r["value_normalized"] for r in by_group["b"]}
    assert a_norm == b_norm  # identical reference per centile


def test_ks_by_group_consistent_with_pairwise(spark):
    """On a 2-group input, each group's KS-vs-complement must equal
    the pairwise ks_drift of the two groups (symmetric statistic)."""
    from flyq_spark.operators.profile import ks_by_group, ks_drift

    a_vals = [1, 2, 2, 3, 7]
    b_vals = [3, 4, 5, 5, 6, 9]
    df = spark.createDataFrame(
        [("a", v) for v in a_vals] + [("b", v) for v in b_vals],
        "g string, v long",
    )
    pair = ks_drift(
        spark.createDataFrame([(v,) for v in a_vals], "c long"),
        spark.createDataFrame([(v,) for v in b_vals], "c long"),
        F.col("c"),
    ).collect()[0]
    rows = {r["g"]: r for r in ks_by_group(df, "g", F.col("v")).collect()}
    for g in ("a", "b"):
        assert rows[g]["ks_num"] == pair["ks_num"], g
        assert rows[g]["ks_den"] == pair["ks_den"], g
    assert (rows["a"]["n_g"], rows["a"]["n_rest"]) == (5, 6)


def test_ks_by_group_zero_for_identical_groups(spark):
    from flyq_spark.operators.profile import ks_by_group

    vals = [1, 2, 3, 4] * 3
    df = spark.createDataFrame(
        [("x", v) for v in vals] + [("y", v) for v in vals],
        "g string, v long",
    )
    for r in ks_by_group(df, "g", F.col("v")).collect():
        assert r["ks_num"] == 0, r


def test_streaming_ks_drift_parity(spark, tmp_path):
    """Streaming drift composition (r9): per-value counts maintained by
    aggregate_view_sink keyed by the value column (state = |distinct v|
    rows, never the stream), read back and fed to ks_drift_counted —
    the (n_a, n_b, ks_num, ks_den, at_value) row must be identical to
    batch ks_drift over the raw rows, including after a REPLAYED
    micro-batch (exactly-once view merge) and across a base
    compaction."""
    from flyq_spark.operators.profile import ks_drift, ks_drift_counted
    from flyq_spark.streaming.sink import (
        aggregate_view_sink,
        read_aggregate_view,
    )

    live_rows = [(i, (i * 7) % 23) for i in range(600)]
    ref_rows = [(i, (i * 5) % 19) for i in range(500)]
    live = spark.createDataFrame(live_rows, "id long, v long")
    ref = spark.createDataFrame(ref_rows, "id long, v long")

    sink = aggregate_view_sink(str(tmp_path / "view"), ("v",), {}, compact_every=2)
    batches = [live_rows[:200], live_rows[200:400], live_rows[400:]]
    for bid, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, "id long, v long"), bid)
    # replay the last batch (Structured Streaming re-delivers the same
    # data for the same batch_id after a pre-commit crash): the view's
    # overwrite-own-delta discipline must not double-count
    sink(spark.createDataFrame(batches[2], "id long, v long"), 2)

    view = read_aggregate_view(spark, str(tmp_path / "view"), ("v",), ())
    counts = view.select("v", F.col("n_rows").alias("cnt"))
    ref_counts = ref.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    got = [tuple(r) for r in ks_drift_counted(counts, ref_counts).collect()]
    want = [tuple(r) for r in ks_drift(live, ref, F.col("v")).collect()]
    assert got == want
    assert got[0][0] == 600 and got[0][1] == 500  # n_a, n_b
