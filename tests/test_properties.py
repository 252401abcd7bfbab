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


def test_snapshot_diff_reconstruction_law(spark):
    """old + diff == new: applying the CDC classes to the old snapshot
    reconstructs the new one exactly."""
    from pyspark.sql import functions as F

    from radohydro_spark.operators.merge import snapshot_diff

    base = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.7).alias("v"),
        (F.col("id") % 5).cast("string").alias("s"),
    )
    old = base.filter(F.col("k") % 7 != 0)
    new = base.filter(F.col("k") % 11 != 0).withColumn(
        "v", F.when(F.col("k") % 3 == 0, F.col("v") + 100).otherwise(F.col("v"))
    )
    d = snapshot_diff(old, new, ["k"])
    upserts = d.filter(F.col("change_type") != "delete").select("k", "v", "s")
    gone = d.filter(F.col("change_type") == "delete").select("k")
    rebuilt = old.join(
        d.select("k"), "k", "left_anti"  # untouched rows
    ).unionByName(upserts).join(gone, "k", "left_anti")
    assert {tuple(r) for r in rebuilt.collect()} == {
        tuple(r) for r in new.collect()
    }
    # diff of identical snapshots is empty
    assert snapshot_diff(new, new, ["k"]).count() == 0


def test_gap_fill_bounded_by_anchors(spark):
    from pyspark.sql import functions as F

    from radohydro_spark.operators.aggregate import gap_fill_linear

    df = spark.range(200).select(
        (F.col("id") % 4).cast("int").alias("basin_id"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-01 "), F.format_string("%02d", (F.col("id") / 4).cast("int") % 24), F.lit(":00:00"))
        ).alias("ts"),
        F.when((F.col("id") * 37 % 11) < 3, None)
        .otherwise((F.col("id") * 13 % 100).cast("double"))
        .alias("rainfall_mm"),
    ).dropDuplicates(["basin_id", "ts"])
    out = gap_fill_linear(df).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.basin_id, []).append(r)
    orig = {(r.basin_id, str(r.ts)): r.rainfall_mm for r in df.collect()}
    for k, rows in by_key.items():
        rows.sort(key=lambda r: str(r.ts))
        series = [orig[(k, str(r.ts))] for r in rows]
        for i, r in enumerate(rows):
            if not r.was_interpolated:
                assert r.rainfall_mm == series[i]
                continue
            prevs = [v for v in series[:i] if v is not None]
            nexts = [v for v in series[i + 1 :] if v is not None]
            lo, hi = sorted((prevs[-1], nexts[0]))
            assert lo - 1e-9 <= r.rainfall_mm <= hi + 1e-9


def test_stratified_cap_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from radohydro_spark.operators.sampling import stratified_cap

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 9).alias("src")
    )
    a = {r.doc_id for r in stratified_cap(df, "doc_id", "src", 13).collect()}
    b = {
        r.doc_id
        for r in stratified_cap(df.repartition(17), "doc_id", "src", 13).collect()
    }
    assert a == b  # survivors are a pure function of ids, not layout
