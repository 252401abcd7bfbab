"""psi_drift + zscore_outliers (operators/profile.py, r6)."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_psi_identical_distributions_is_zero(spark):
    from radohydro_spark.operators.profile import psi_drift

    df = spark.range(0, 1000).select((F.col("id") % 100).cast("double").alias("v"))
    out = psi_drift(df, df, "v", n_buckets=10).collect()
    assert len(out) == 10
    assert all(abs(r["psi_contrib"]) < 1e-12 for r in out)
    assert all(r["n_old"] == r["n_new"] == 100 for r in out)


def test_psi_detects_shift(spark):
    from radohydro_spark.operators.profile import psi_drift

    rng = np.random.RandomState(3)
    old = spark.createDataFrame(
        [(float(x),) for x in rng.normal(50, 10, 2000)], "v double"
    )
    new = spark.createDataFrame(
        [(float(x),) for x in rng.normal(70, 10, 2000)], "v double"
    )
    rows = psi_drift(old, new, "v", n_buckets=10).collect()
    psi = sum(r["psi_contrib"] for r in rows)
    assert psi > 0.25  # a 2-sigma mean shift is a screaming drift signal
    # out-of-range new values clamp into the top bucket, not vanish
    assert sum(r["n_new"] for r in rows) == 2000


def test_psi_matches_closed_form(spark):
    from radohydro_spark.operators.profile import psi_drift

    old = spark.createDataFrame([(float(v),) for v in range(10)], "v double")
    new = spark.createDataFrame(
        [(float(v),) for v in [0, 0, 0, 9, 9, 9]], "v double"
    )
    rows = {r["bucket"]: r for r in psi_drift(old, new, "v", n_buckets=5).collect()}
    # old: buckets 0..4 get 2 each (width 9/5=1.8); new: 3 at v=0 -> b0, 3 at v=9 -> b4
    assert rows[0]["n_old"] == 2 and rows[0]["n_new"] == 3
    p_o, p_n = 0.2, 0.5
    assert abs(rows[0]["psi_contrib"] - (p_o - p_n) * math.log(p_o / p_n)) < 1e-9
    eps = 1e-6
    for b in (1, 2, 3):
        assert rows[b]["n_new"] == 0
        assert abs(
            rows[b]["psi_contrib"] - (0.2 - eps) * math.log(0.2 / eps)
        ) < 1e-9


def test_zscore_outliers_flags_planted_anomaly(spark):
    from radohydro_spark.operators.profile import zscore_outliers

    rng = np.random.RandomState(7)
    base = [("g", round(float(x), 2)) for x in rng.normal(100, 5, 500)]
    planted = [("g", 500.0), ("g", -300.0)]
    df = spark.createDataFrame(base + planted, "grp string, v double")
    row = zscore_outliers(df, "v", ["grp"], z=3.0).collect()[0]
    assert row["n"] == 502
    assert row["n_outliers"] >= 2  # the planted pair, maybe a tail sample
    assert abs(row["mean_value"] - np.mean([v for _, v in base + planted])) < 0.5


def test_zscore_constant_group_no_outliers(spark):
    from radohydro_spark.operators.profile import zscore_outliers

    df = spark.createDataFrame([("g", 5.0)] * 50, "grp string, v double")
    row = zscore_outliers(df, "v", ["grp"]).collect()[0]
    assert row["n_outliers"] == 0
    assert row["stddev_value"] == 0.0
