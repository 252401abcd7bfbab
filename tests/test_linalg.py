"""Distributed Gram / PCA power iteration (operators/linalg.py, r9)."""

import numpy as np
import pytest

from pyspark.sql import functions as F


def _vectors(rows):
    return [(i, [float(x) for x in v]) for i, v in enumerate(rows)]


def test_gram_matrix_matches_numpy(spark):
    from radohydro_spark.operators.linalg import gram_matrix_int

    rng = np.random.RandomState(7)
    m = rng.uniform(-0.5, 0.5, size=(40, 6))
    df = spark.createDataFrame(
        _vectors(m), "vec_id long, embedding array<double>"
    )
    got = {
        (r["i"], r["j"]): r["c"]
        for r in gram_matrix_int(df, "embedding", dims=6).collect()
    }
    q = (np.sign(m) * np.floor(np.abs(m) * 1000 + 0.5)).astype(np.int64)
    want = q.T @ q
    for i in range(6):
        for j in range(6):
            assert got[(i, j)] == want[i, j]


def test_power_iteration_finds_planted_direction(spark):
    """Vectors concentrated along axis 2 (plus small noise on axis 0)
    must yield a top component dominated by dim 2, unit-normalized."""
    from radohydro_spark.operators.linalg import pca_top_component

    rng = np.random.RandomState(3)
    n = 200
    m = np.zeros((n, 4))
    m[:, 2] = rng.uniform(0.3, 0.5, size=n)  # dominant direction
    m[:, 0] = rng.uniform(-0.05, 0.05, size=n)  # weak noise
    df = spark.createDataFrame(
        _vectors(m), "vec_id long, embedding array<double>"
    )
    out = {
        r["dim"]: r["loading"]
        for r in pca_top_component(spark, df, "embedding", dims=4).collect()
    }
    assert abs(out[2]) > 0.99
    assert abs(out[0]) < 0.15 and abs(out[1]) < 0.05 and abs(out[3]) < 0.05
    assert sum(v * v for v in out.values()) == pytest.approx(1.0, abs=1e-4)


def test_pca_deterministic_across_runs(spark):
    """Integer arithmetic end-to-end: two runs produce IDENTICAL
    loadings (no float-reassociation drift), regardless of partitioning."""
    from radohydro_spark.operators.linalg import pca_top_component

    rng = np.random.RandomState(11)
    m = rng.uniform(-0.5, 0.5, size=(120, 8))
    df1 = spark.createDataFrame(
        _vectors(m), "vec_id long, embedding array<double>"
    )
    df2 = df1.repartition(13)  # different physical layout
    a = [tuple(r) for r in pca_top_component(spark, df1, dims=8).collect()]
    b = [tuple(r) for r in pca_top_component(spark, df2, dims=8).collect()]
    assert a == b


def test_gram_shuffle_is_dimension_sized(spark):
    """The exchange above the Gram aggregation moves d² partial rows per
    input batch, never corpus-sized data — asserted via the plan shape
    (mapInPandas before the single aggregate exchange)."""
    from radohydro_spark.operators.linalg import gram_matrix_int

    df = spark.createDataFrame(
        _vectors(np.ones((50, 4)) * 0.25), "vec_id long, embedding array<double>"
    )
    plan = (
        gram_matrix_int(df, "embedding", dims=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert plan.count("Exchange") == 1  # only the (i, j) aggregate shuffle
