"""Geohash binning + haversine distance as pure column expressions.

The spatial bucketing / proximity pair every geo pipeline needs beyond
exact geometry: geohash prefixes give hierarchical spatial GROUP BY keys
(the geo analogue of date partitioning — prefix-share ⇒ proximity), and
haversine gives great-circle meters on the sphere.

Both are closed-form integer/float arithmetic — no UDF, no loop: the
geohash bit interleave is an unrolled sum of bit extractions that
Catalyst folds into one codegen'd expression, so a 100 TB scan pays one
projection.  The DuckDB oracles mirror the identical arithmetic, making
both hash-exact cross-engine.

Geohash (public algorithm, Niemeyer 2008): scale lat to [0, 2^b) over
[-90, 90] and lon over [-180, 180], interleave bits lon-first, emit
base32 (0-9 b-z minus a/i/l/o) 5 bits per character.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
EARTH_RADIUS_M = 6_371_000.0


def geohash(lat: Column | str, lon: Column | str, precision: int = 6) -> Column:
    """Geohash string of ``precision`` characters (≤ 12) from degree
    lat/lon columns — one folded integer expression per character."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    total_bits = precision * 5
    lon_bits = (total_bits + 1) // 2  # lon first on even positions
    lat_bits = total_bits // 2
    lat_i = F.floor((la + 90.0) / 180.0 * (1 << lat_bits)).cast("long")
    lon_i = F.floor((lo + 180.0) / 360.0 * (1 << lon_bits)).cast("long")
    # clamp the right-edge cases lat=90 / lon=180 into the last cell
    lat_i = F.least(lat_i, F.lit((1 << lat_bits) - 1))
    lon_i = F.least(lon_i, F.lit((1 << lon_bits) - 1))
    # interleaved value: bit k (0 = most significant) comes from lon if k
    # even else lat; build as a sum of shifted extracted bits
    terms = []
    for k in range(total_bits):
        out_shift = total_bits - 1 - k
        if k % 2 == 0:
            src, src_shift = lon_i, lon_bits - 1 - (k // 2)
        else:
            src, src_shift = lat_i, lat_bits - 1 - (k // 2)
        terms.append(
            F.shiftleft(
                F.shiftright(src, src_shift).bitwiseAND(F.lit(1)), out_shift
            )
        )
    inter = terms[0]
    for t in terms[1:]:
        inter = inter + t
    # 5 bits per base32 character
    chars = []
    for c in range(precision):
        idx = F.shiftright(inter, (precision - 1 - c) * 5).bitwiseAND(
            F.lit(31)
        )
        chars.append(F.substring(F.lit(_BASE32), 1, 32).substr(idx + 1, F.lit(1)))
    return F.concat(*chars)


def geohash_sql(lat: str, lon: str, precision: int = 6) -> str:
    """The DuckDB twin of :func:`geohash` — identical arithmetic rendered
    as SQL, so oracles stay exact."""
    total_bits = precision * 5
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    lat_i = (
        f"least(CAST(floor(({lat} + 90.0) / 180.0 * {1 << lat_bits}) AS BIGINT), "
        f"{(1 << lat_bits) - 1})"
    )
    lon_i = (
        f"least(CAST(floor(({lon} + 180.0) / 360.0 * {1 << lon_bits}) AS BIGINT), "
        f"{(1 << lon_bits) - 1})"
    )
    terms = []
    for k in range(total_bits):
        out_shift = total_bits - 1 - k
        if k % 2 == 0:
            src, src_shift = lon_i, lon_bits - 1 - (k // 2)
        else:
            src, src_shift = lat_i, lat_bits - 1 - (k // 2)
        # full parens: DuckDB/Postgres bind + tighter than <<, so a bare
        # "a << 3 + b << 1" would nest the shifts exponentially
        terms.append(f"((({src} >> {src_shift}) & 1) << {out_shift})")
    inter = "(" + " + ".join(terms) + ")"
    chars = [
        f"substring('{_BASE32}', CAST((({inter} >> {(precision - 1 - c) * 5}) & 31) "
        "AS INT) + 1, 1)"
        for c in range(precision)
    ]
    return " || ".join(chars)


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in meters (spherical earth, R = 6371 km) —
    the standard haversine with a clamped asin argument; expression order
    fixed so the SQL twin reproduces it bit-for-bit."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


HAVERSINE_SQL = (
    "2.0 * 6371000.0 * asin(sqrt(least("
    "sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2),"
    " 1.0)))"
)
