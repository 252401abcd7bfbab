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


def test_pca_zero_matrix_raises_loudly(spark):
    """All-zero quantized input has no principal direction — must raise,
    never emit 0/0 NaN loadings."""
    from radohydro_spark.operators.linalg import pca_top_component

    df = spark.createDataFrame(
        [(0, [0.0001, -0.0002]), (1, [0.0, 0.0003])],
        "vec_id long, embedding array<double>",
    )  # every |x|*1000 < 0.5 -> quantizes to zero
    with pytest.raises(ValueError, match="quantization resolution"):
        pca_top_component(spark, df, "embedding", dims=2)


def test_power_iteration_tracks_numpy_eigenvector():
    """Hypothesis: on random symmetric PSD integer matrices, the
    integer-renormalized power iteration aligns with numpy's dominant
    eigenvector (|cosine| -> 1) whenever the spectrum has a clear gap."""
    from hypothesis import given, settings, strategies as st

    from radohydro_spark.operators.linalg import power_iterate_int

    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=0, max_value=2**31 - 1), st.integers(2, 6))
    def inner(seed, d):
        rng = np.random.RandomState(seed)
        b = rng.randint(-50, 51, size=(d, d))
        c = (b @ b.T).astype(np.int64)  # symmetric PSD
        evals, evecs = np.linalg.eigh(c.astype(np.float64))
        # convergence error ~ (lambda2/lambda1)^k: at 40 iterations a 0.85
        # ratio still leaves cos > 0.999; anything tighter-gapped than
        # that is a legitimately ambiguous direction — skip
        if evals[-1] <= 0 or (d > 1 and evals[-2] / evals[-1] > 0.85):
            return
        gram = {(i, j): int(c[i, j]) for i in range(d) for j in range(d)}
        v = np.array(power_iterate_int(gram, d, iterations=40), dtype=np.float64)
        if not v.any():
            return  # iterate annihilated (start orthogonal to range)
        cos = abs(v @ evecs[:, -1]) / np.linalg.norm(v)
        assert cos > 0.99, (seed, d, cos, evals)

    inner()


def test_power_iteration_integer_bounds_hold():
    """Hypothesis: iterate magnitudes stay within the documented 2^(cap+1)
    bound for any PSD matrix whose entries fit the Gram bound — the
    invariant that keeps C·v inside BIGINT."""
    from hypothesis import given, settings, strategies as st

    from radohydro_spark.operators.linalg import power_iterate_int

    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=0, max_value=2**31 - 1))
    def inner(seed):
        rng = np.random.RandomState(seed)
        d = rng.randint(2, 8)
        b = rng.randint(-1000, 1001, size=(d, d))
        c = (b @ b.T).astype(object)  # exact python ints
        gram = {(i, j): int(c[i, j]) for i in range(d) for j in range(d)}
        v = power_iterate_int(gram, d, iterations=6, cap_bits=20)
        assert all(abs(x) <= 1 << 21 for x in v), (seed, v)

    inner()


# --- label_centroids (r11) ---


def test_label_centroids_hand_case(spark):
    from radohydro_spark.operators.linalg import label_centroids

    rows = [
        ("a", [1.0, 2.0]),
        ("a", [3.0, 4.0]),
        ("b", [-1.0, 0.5]),
    ]
    df = spark.createDataFrame(rows, "label string, v array<double>")
    got = {
        (r["label"], r["dim"]): (r["n_vecs"], r["centroid"])
        for r in label_centroids(df, "v", "label").collect()
    }
    assert got == {
        ("a", 0): (2, 2.0),
        ("a", 1): (2, 3.0),
        ("b", 0): (1, -1.0),
        ("b", 1): (1, 0.5),
    }


def test_label_centroids_quantization_is_exact_for_representable(spark):
    from radohydro_spark.operators.linalg import label_centroids

    # values exactly representable at 1e-6 granularity survive the
    # quantize -> sum -> divide round trip bit-for-bit
    rows = [("x", [0.000001, -0.5]), ("x", [0.000003, 1.5])]
    df = spark.createDataFrame(rows, "label string, v array<double>")
    got = {
        r["dim"]: r["centroid"]
        for r in label_centroids(df, "v", "label").collect()
    }
    assert got[0] == 0.000002 and got[1] == 0.5
