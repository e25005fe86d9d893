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
