"""CRS transforms (C12) — pure-NumPy kernels, no pyproj dependency.

The reference leans on rasterio/pyproj CRS objects for exactly three
systems (SURVEY.md §1.2):

* RADOLAN polar-stereographic on a sphere of radius 6 370 040 m with
  lat_ts=60°, lon_0=10° and kilometre units — proj string at reference
  radohydro.py:375-376 (`+to_meter=1000` is the unit fix the reference
  applies post-hoc; here it's just the `to_meter` parameter), sphere
  definition at radohydro.py:50-61.
* Geographic WGS84/ETRS89 (EPSG:4326) — REGNIE's native grid
  (radohydro.py:392).
* ETRS89 / UTM zones (EPSG:258xx, default output epsg:25833,
  radohydro.py:507) — GRS80 transverse Mercator.

All transforms route through lon/lat as the hub.  Spherical stereographic
is closed-form (Snyder 1987, eqs. 21-5..21-15); the ellipsoidal transverse
Mercator uses the 4th-order Krüger-n series (Karney 2011, public-domain
formulas) — sub-millimetre against authoritative implementations over the
German extent.  ETRS89≈WGS84 datum identity is assumed, as the reference
does implicitly.

Vectorized over NumPy arrays; `transform_crs` wraps the kernel as an
Arrow-batched pandas UDF for DataFrame columns.  Dimension-sized tables
(cells, basins) can use the driver-side `transform_points` directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- sphere polar stereographic (RADOLAN native) ---------------------------

RADOLAN_R = 6370040.0  # sphere radius, reference radohydro.py:50
RADOLAN_LON0 = np.deg2rad(10.0)
RADOLAN_LAT_TS = np.deg2rad(60.0)
RADOLAN_K0 = (1.0 + np.sin(RADOLAN_LAT_TS)) / 2.0  # == +k=0.93301270189
RADOLAN_TO_METER = 1000.0  # grid coordinates are kilometres


def _stere_fwd(lon_deg, lat_deg):
    lam = np.deg2rad(np.asarray(lon_deg, dtype="float64"))
    phi = np.deg2rad(np.asarray(lat_deg, dtype="float64"))
    rho = 2.0 * RADOLAN_R * RADOLAN_K0 * np.tan(np.pi / 4.0 - phi / 2.0)
    x = rho * np.sin(lam - RADOLAN_LON0)
    y = -rho * np.cos(lam - RADOLAN_LON0)
    return x / RADOLAN_TO_METER, y / RADOLAN_TO_METER


def _stere_inv(x_km, y_km):
    x = np.asarray(x_km, dtype="float64") * RADOLAN_TO_METER
    y = np.asarray(y_km, dtype="float64") * RADOLAN_TO_METER
    rho = np.hypot(x, y)
    phi = np.pi / 2.0 - 2.0 * np.arctan(rho / (2.0 * RADOLAN_R * RADOLAN_K0))
    lam = RADOLAN_LON0 + np.arctan2(x, -y)
    return np.rad2deg(lam), np.rad2deg(phi)


# --- GRS80 transverse Mercator (ETRS89 / UTM) ------------------------------

_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_UTM_K0 = 0.9996
_UTM_FE = 500000.0

_N = _GRS80_F / (2.0 - _GRS80_F)
# rectifying-radius and Krüger alpha/beta coefficients to n^4 (Karney 2011)
_A_CAP = _GRS80_A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64)
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440,
    61 * _N**3 / 240 - 103 * _N**4 / 140,
    49561 * _N**4 / 161280,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440,
    17 * _N**3 / 480 - 37 * _N**4 / 840,
    4397 * _N**4 / 161280,
)
_E2 = _GRS80_F * (2.0 - _GRS80_F)


def _tm_fwd(lon_deg, lat_deg, lon0_deg: float):
    lam = np.deg2rad(np.asarray(lon_deg, dtype="float64") - lon0_deg)
    phi = np.deg2rad(np.asarray(lat_deg, dtype="float64"))
    e = np.sqrt(_E2)
    # conformal latitude
    t = np.sinh(
        np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi))
    )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA):
        k = 2 * (j + 1)
        xi += a * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta += a * np.cos(k * xi_p) * np.sinh(k * eta_p)
    easting = _UTM_FE + _UTM_K0 * _A_CAP * eta
    northing = _UTM_K0 * _A_CAP * xi
    return easting, northing


def _tm_inv(x, y, lon0_deg: float):
    xi = np.asarray(y, dtype="float64") / (_UTM_K0 * _A_CAP)
    eta = (np.asarray(x, dtype="float64") - _UTM_FE) / (_UTM_K0 * _A_CAP)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA):
        k = 2 * (j + 1)
        xi_p -= b * np.sin(k * xi) * np.cosh(k * eta)
        eta_p -= b * np.cos(k * xi) * np.sinh(k * eta)
    t = np.sinh(eta_p)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # conformal -> geodetic latitude: fixed point of
    #   sin(phi) = tanh( artanh(sin chi) + e * artanh(e * sin phi) )
    e = np.sqrt(_E2)
    s_phi = np.sin(chi)
    base = np.arctanh(np.sin(chi))
    for _ in range(8):
        s_phi = np.tanh(base + e * np.arctanh(e * s_phi))
    phi = np.arcsin(np.clip(s_phi, -1.0, 1.0))
    lam = np.arctan2(t, np.cos(xi_p))
    return np.rad2deg(lam) + lon0_deg, np.rad2deg(phi)


# --- CRS registry / public API ---------------------------------------------


def _utm_lon0(epsg: int) -> float:
    zone = epsg % 100  # 25832 -> 32, 32633 -> 33
    return zone * 6.0 - 183.0


def _to_lonlat(x, y, crs: str):
    crs = crs.lower()
    if crs in ("epsg:4326", "wgs84", "etrs89"):
        return np.asarray(x, dtype="float64"), np.asarray(y, dtype="float64")
    if crs == "radolan":
        return _stere_inv(x, y)
    if crs.startswith("epsg:258") or crs.startswith("epsg:326"):
        return _tm_inv(x, y, _utm_lon0(int(crs.split(":")[1])))
    raise ValueError(f"unsupported CRS: {crs}")


def _from_lonlat(lon, lat, crs: str):
    crs = crs.lower()
    if crs in ("epsg:4326", "wgs84", "etrs89"):
        return np.asarray(lon, dtype="float64"), np.asarray(lat, dtype="float64")
    if crs == "radolan":
        return _stere_fwd(lon, lat)
    if crs.startswith("epsg:258") or crs.startswith("epsg:326"):
        return _tm_fwd(lon, lat, _utm_lon0(int(crs.split(":")[1])))
    raise ValueError(f"unsupported CRS: {crs}")


def transform_points(x, y, src: str, dst: str):
    """Driver-side vectorized transform: arrays in ``src`` -> arrays in
    ``dst``.  Use for dimension-sized tables (cells, basins)."""
    lon, lat = _to_lonlat(x, y, src)
    return _from_lonlat(lon, lat, dst)


def reproject_wkb(
    df: DataFrame, src: str, dst: str, geom_col: str = "geom"
) -> DataFrame:
    """Reproject a WKB geometry column between CRSs (the engine form of the
    reference's ``to_crs`` on basins/cells, geotools/geotools.py:75,
    207-208).  Pandas UDF: parse rings -> transform vertex arrays ->
    re-encode; vertex counts are dimension-scale so this never dominates."""
    import numpy as np

    @F.pandas_udf("binary")
    def _re(geoms: pd.Series) -> pd.Series:
        from radohydro_spark.geometry.wkb import parse_wkb_polygons, wkb_multipolygon

        out = []
        for blob in geoms:
            polys = parse_wkb_polygons(bytes(blob))
            new_polys = []
            for rings in polys:
                new_rings = []
                for ring in rings:
                    xs = np.array([p[0] for p in ring])
                    ys = np.array([p[1] for p in ring])
                    xt, yt = transform_points(xs, ys, src, dst)
                    new_rings.append(list(zip(xt.tolist(), yt.tolist())))
                new_polys.append(new_rings)
            out.append(wkb_multipolygon(new_polys))
        return pd.Series(out)

    return df.withColumn(geom_col, _re(F.col(geom_col)))


def transform_crs(
    df: DataFrame, x_col: str, y_col: str, src: str, dst: str,
    out_x: str = "x_t", out_y: str = "y_t",
) -> DataFrame:
    """C12 as a DataFrame op: append transformed coordinate columns via an
    Arrow-batched pandas UDF (SURVEY.md §2.10 kernel 4)."""

    @F.pandas_udf("struct<x: double, y: double>")
    def _tx(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        xo, yo = transform_points(x.to_numpy(), y.to_numpy(), src, dst)
        return pd.DataFrame({"x": xo, "y": yo})

    tmp = df.withColumn("_xy", _tx(F.col(x_col), F.col(y_col)))
    return tmp.withColumn(out_x, F.col("_xy.x")).withColumn(
        out_y, F.col("_xy.y")
    ).drop("_xy")
