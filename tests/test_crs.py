"""CRS kernel tests (C12): RADOLAN sphere stereographic + ETRS89/UTM."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from radohydro_spark.geometry.crs import (
    RADOLAN_K0,
    transform_crs,
    transform_points,
)


def test_radolan_published_corners():
    # DWD RADOLAN-RW composite spec, 900x900 grid corner coordinates (km).
    # Published lon/lats are rounded to 4 decimals -> a few metres slack.
    corners = [
        (3.5889, 46.9526, -523.4622, -4658.6447),  # lower left
        (14.6209, 47.0705, 376.5378, -4658.6447),  # lower right
        (2.0715, 54.5877, -523.4622, -3758.6447),  # upper left
        (15.7208, 54.7405, 376.5378, -3758.6447),  # upper right
    ]
    for lon, lat, x_ref, y_ref in corners:
        x, y = transform_points(np.array([lon]), np.array([lat]), "epsg:4326", "radolan")
        assert abs(x[0] - x_ref) < 0.01, (lon, lat, x[0], x_ref)
        assert abs(y[0] - y_ref) < 0.01, (lon, lat, y[0], y_ref)


def test_radolan_k0_matches_reference_proj_string():
    # reference radohydro.py:375 pins +k=0.93301270189 (lat_ts=60 form)
    assert abs(RADOLAN_K0 - 0.93301270189) < 1e-11


def test_utm_central_meridian_properties():
    # equator at the central meridian -> (false easting, 0)
    e, n = transform_points(np.array([15.0]), np.array([0.0]), "epsg:4326", "epsg:25833")
    assert abs(e[0] - 500000.0) < 1e-6 and abs(n[0]) < 1e-6
    # scale at CM is 0.9996: d(northing)/d(arc) for a small step
    lat = np.array([50.0, 50.001])
    _, n2 = transform_points(np.array([9.0, 9.0]), lat, "epsg:4326", "epsg:25832")
    e2 = 0.00669438002290  # GRS80 first eccentricity squared
    m_radius = 6378137.0 * (1 - e2) / (1 - e2 * np.sin(np.deg2rad(50.0005)) ** 2) ** 1.5
    arc = m_radius * np.deg2rad(0.001)
    assert abs((n2[1] - n2[0]) / arc - 0.9996) < 1e-6


def test_roundtrips_over_german_extent():
    rs = np.random.RandomState(42)
    lons = rs.uniform(5.0, 16.0, 500)
    lats = rs.uniform(46.0, 56.0, 500)
    for crs in ("radolan", "epsg:25832", "epsg:25833", "epsg:32633"):
        x, y = transform_points(lons, lats, "epsg:4326", crs)
        lo, la = transform_points(x, y, crs, "epsg:4326")
        assert np.abs(lo - lons).max() < 1e-9
        assert np.abs(la - lats).max() < 1e-9


def test_utm_zone_symmetry():
    # easting is antisymmetric around the central meridian
    e_plus, _ = transform_points(np.array([10.0]), np.array([50.0]), "epsg:4326", "epsg:25832")
    e_minus, _ = transform_points(np.array([8.0]), np.array([50.0]), "epsg:4326", "epsg:25832")
    assert abs((e_plus[0] - 500000.0) + (e_minus[0] - 500000.0)) < 1e-6


def test_transform_crs_dataframe_op(spark):
    df = spark.createDataFrame(
        [(3.5889, 46.9526), (14.6209, 47.0705)], "lon double, lat double"
    )
    out = transform_crs(df, "lon", "lat", "epsg:4326", "radolan").collect()
    assert abs(out[0].x_t - -523.4622) < 0.01
    assert abs(out[1].x_t - 376.5378) < 0.01
    back = transform_crs(
        transform_crs(df, "lon", "lat", "epsg:4326", "epsg:25832"),
        "x_t",
        "y_t",
        "epsg:25832",
        "epsg:4326",
        out_x="lon2",
        out_y="lat2",
    ).collect()
    for r in back:
        assert abs(r.lon2 - r.lon) < 1e-9 and abs(r.lat2 - r.lat) < 1e-9


def test_geohash_known_vectors(spark):
    from pyspark.sql import functions as F

    from radohydro_spark.geometry.geohash import geohash

    df = spark.createDataFrame(
        [
            (57.64911, 10.40744, "u4pruy"),
            (48.669, -4.329, "gbsuv7"),
            (0.0, 0.0, "s00000"),
            (-25.382708, -49.265506, "6gkzwg"),
            (90.0, 180.0, "zzzzzz"),  # right-edge clamp
            (-90.0, -180.0, "000000"),
        ],
        "lat double, lon double, want string",
    )
    rows = df.select("want", geohash("lat", "lon", 6).alias("gh")).collect()
    for r in rows:
        assert r["gh"] == r["want"], (r["want"], r["gh"])
    # 9-char precision vector (Curitiba)
    r9 = (
        df.limit(1)
        .select(geohash(F.lit(-25.382708), F.lit(-49.265506), 9).alias("g"))
        .collect()[0]["g"]
    )
    assert r9 == "6gkzwgjzn"


def test_haversine_known_distances(spark):
    from pyspark.sql import functions as F

    from radohydro_spark.geometry.geohash import haversine_m

    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double"
    )
    m = df.select(
        haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
    ).collect()[0]["m"]
    assert 340_000 < m < 348_000  # Paris-London great-circle ~343.5 km
    z = df.select(
        haversine_m(F.col("a"), F.col("b"), F.col("a"), F.col("b")).alias("m")
    ).collect()[0]["m"]
    assert z == 0.0
