"""Property tests (SURVEY.md §5.4): weight-sum, mass conservation,
clip-window invariance, pivot round-trip, and hypothesis-driven geometry
properties of the rect-clip kernel.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from radohydro_spark.geometry.clip import polygon_area, rect_clip_polygon_area
from radohydro_spark.geometry.wkb import wkb_polygon
from radohydro_spark.operators.aggregate import pivot_wide
from radohydro_spark.operators.spatial import spatial_intersect, window_predicate
from radohydro_spark.operators.weights import apply_nan_policy, basin_weights
from radohydro_spark.plans.pipeline import precip_timeseries
from radohydro_spark.sources.synthetic import (
    GRID,
    synthetic_basins,
    synthetic_cells,
    synthetic_obs,
)


def test_weights_sum_to_one_per_basin(spark):
    frags = apply_nan_policy(
        spatial_intersect(synthetic_cells(spark), synthetic_basins(spark)),
        synthetic_obs(spark),
    )
    sums = (
        basin_weights(frags)
        .groupBy("basin_id")
        .agg(F.sum("weight").alias("s"))
        .collect()
    )
    assert len(sums) == 4
    for r in sums:
        assert r.s == pytest.approx(1.0, abs=1e-12)


def test_mass_conservation_clean_basin(spark):
    """For a basin whose cells are all clean and fully inside the grid,
    rainfall equals sum(w_i * v_i)/10 — cross-check total mass against a
    direct fragment-level recomputation."""
    cells, basins, obs = synthetic_cells(spark), synthetic_basins(spark), synthetic_obs(spark)
    frags = apply_nan_policy(spatial_intersect(cells, basins), obs)
    w = basin_weights(frags)
    direct = (
        obs.join(w, ["cell_row", "cell_col"])
        .groupBy("basin_id", "ts")
        .agg((F.sum(F.col("weight") * F.col("value")) / 10.0).alias("direct"))
    )
    res = precip_timeseries(obs, cells, basins, round_decimals=None)
    joined = res.join(direct, ["basin_id", "ts"]).collect()
    assert len(joined) == 96
    for r in joined:
        if r.rainfall_mm is not None:
            assert r.rainfall_mm == pytest.approx(r.direct, rel=1e-12)


def test_clip_window_invariance(spark):
    """Growing the buffered window beyond 2 cells never changes results
    (the buffer exists for edge renormalization, not correctness)."""
    cells, basins, obs = synthetic_cells(spark), synthetic_basins(spark), synthetic_obs(spark)
    base = {
        (r.basin_id, r.ts): r.rainfall_mm
        for r in precip_timeseries(obs, cells, basins).collect()
    }
    windowed = {
        (r.basin_id, r.ts): r.rainfall_mm
        for r in precip_timeseries(
            obs, cells, basins, clip_window=(0, GRID.n_rows - 1, 0, GRID.n_cols - 1)
        ).collect()
    }
    assert base == windowed


def test_pivot_roundtrip(spark):
    res = precip_timeseries(
        synthetic_obs(spark), synthetic_cells(spark), synthetic_basins(spark)
    )
    wide = pivot_wide(res)
    ts_cols = [c for c in wide.columns if c != "basin_id"]
    assert len(ts_cols) == GRID.n_ts
    # melt back long and compare
    back = wide.unpivot("basin_id", ts_cols, "ts_str", "rainfall_mm").select(
        "basin_id",
        F.to_timestamp("ts_str", "yyMMddHHmm").alias("ts"),
        "rainfall_mm",
    )
    a = {(r.basin_id, r.ts): r.rainfall_mm for r in res.collect()}
    b = {(r.basin_id, r.ts): r.rainfall_mm for r in back.collect()}
    assert a == b


@settings(max_examples=200, deadline=None)
@given(
    l=st.floats(-10, 10),
    b=st.floats(-10, 10),
    w=st.floats(0.01, 10),
    h=st.floats(0.01, 10),
    pts=st.lists(
        st.tuples(st.floats(-15, 15), st.floats(-15, 15)), min_size=3, max_size=8
    ),
)
def test_rect_clip_area_bounds(l, b, w, h, pts):
    """For a SIMPLE ring (angle-sorted around the centroid → star-shaped),
    the clipped area lies in [0, min(rect area, polygon area)].  Shoelace
    double-counts self-overlap, so self-intersecting input is out of scope
    — the reference's overlay assumes valid geometry too."""
    cx = sum(p[0] for p in pts) / len(pts)
    cy = sum(p[1] for p in pts) / len(pts)
    ordered = sorted(pts, key=lambda p: math.atan2(p[1] - cy, p[0] - cx))
    ring = ordered + [ordered[0]]
    area = rect_clip_polygon_area(wkb_polygon([ring]), l, b, l + w, b + h)
    assert area >= -1e-9
    assert area <= w * h + 1e-6
    assert area <= polygon_area([ring]) + 1e-6


@settings(max_examples=100, deadline=None)
@given(
    dx=st.floats(-3, 3),
    dy=st.floats(-3, 3),
)
def test_rect_clip_translation_invariance(dx, dy):
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (0.0, 0.0)]
    a1 = rect_clip_polygon_area(wkb_polygon([ring]), 1.0, 1.0, 3.0, 2.5)
    ring2 = [(x + dx, y + dy) for x, y in ring]
    a2 = rect_clip_polygon_area(wkb_polygon([ring2]), 1.0 + dx, 1.0 + dy, 3.0 + dx, 2.5 + dy)
    assert a1 == pytest.approx(a2, abs=1e-9)


def test_wide_to_long_digit_column_shim(spark):
    """F7 parity: a reference-convention wide table (all-digits data
    columns) unpivots to the engine's long schema and round-trips."""
    from pyspark.sql import functions as F

    from radohydro_spark.operators.aggregate import pivot_wide, wide_to_long

    long0 = spark.createDataFrame(
        [(b, f"2024-01-01 {h:02d}:00:00", float(b * 10 + h)) for b in (1, 2) for h in range(3)],
        "basin_id int, ts_s string, rainfall_mm double",
    ).select("basin_id", F.to_timestamp("ts_s").alias("ts"), "rainfall_mm")
    wide = pivot_wide(long0)
    assert sum(c.isdigit() for c in wide.columns) == 3
    back = wide_to_long(wide, ["basin_id"], value_col="rainfall_mm")
    a = sorted(tuple(r) for r in long0.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


# ---- codec property tests (round 5): WAV and BMP round-trips, PQ argmin ----


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    ch=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    import numpy as np

    from radohydro_spark.sources.wav import decode_wav, encode_wav

    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32767, size=(n, ch)).astype(np.int16)
    back, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    assert back.shape == (n, ch)
    assert (back == s).all()


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, seed):
    import numpy as np

    from radohydro_spark.sources.bmp import decode_bmp, encode_bmp

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    back, channels = decode_bmp(encode_bmp(img))
    assert channels == 1
    assert (back == img).all()


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_pq_lut_scoring_matches_direct(seed):
    """ADC via LUT lookups == direct codeword-distance sums (numpy-only
    twin of the Spark kernel's math)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    m, k, ds, n = 4, 8, 4, 30
    books = rng.randn(m, k, ds)
    vecs = rng.randn(n, m, ds)
    q = rng.randn(m, ds)
    codes = np.stack(
        [((vecs[:, j, :, None] - books[j].T[None]) ** 2).sum(1).argmin(1) for j in range(m)],
        axis=1,
    )
    lut = (q * q).sum(1)[:, None] + (books * books).sum(2) - 2.0 * np.einsum(
        "jd,jcd->jc", q, books
    )
    adc = lut[np.arange(m), codes].sum(1)
    direct = np.array(
        [sum(((q[j] - books[j][codes[i, j]]) ** 2).sum() for j in range(m)) for i in range(n)]
    )
    assert np.allclose(adc, direct, atol=1e-9)
