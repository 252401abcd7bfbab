"""Shapefile source (S8) — dependency-free ESRI .shp/.dbf reader.

The reference reads basin polygons with ``gp.read_file`` (reference
geotools/geotools.py:60-68, :196-205) and synthesizes a 1-based surrogate
``basinID`` in file order (geotools/geotools.py:213).  Basins are
dimension-sized (1..10^4 rows), so a driver-side parse feeding
``spark.createDataFrame`` is the right distribution shape: the basin table
is broadcast everywhere it is joined.

Format parsing follows the public ESRI Shapefile Technical Description
(July 1998) and the dBase III layout:

* ``.shp`` — 100-byte header; per record: 8-byte big-endian record header,
  then little-endian shape: type 5 (Polygon) / 15 (PolygonZ, Z ignored)
  with bbox, part offsets, and (x, y) point list.
* ``.dbf`` — 32-byte header (record count at offset 4, header/record sizes
  at 8/10), 32-byte field descriptors until 0x0D, fixed-width ASCII rows.

Ring semantics: shapefile outer rings wind clockwise, holes
counter-clockwise.  Rings are regrouped into polygons by winding order and
encoded as WKB (multi)polygons for the engine's geometry kernels.
"""

from __future__ import annotations

import math
import struct
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from radohydro_spark.geometry.wkb import wkb_multipolygon

Ring = list[tuple[float, float]]


def _ring_signed_area(ring: Ring) -> float:
    s = 0.0
    for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
        s += x0 * y1 - x1 * y0
    return s / 2.0


def read_shp(path: str) -> list[list[list[Ring]]]:
    """Parse a .shp file into one geometry per record: a list of polygons,
    each ``[exterior, hole, ...]`` with rings in their file orientation."""
    with open(path, "rb") as f:
        data = f.read()
    (code,) = struct.unpack(">i", data[0:4])
    if code != 9994:
        raise ValueError(f"not a shapefile: bad file code {code}")
    geoms: list[list[list[Ring]]] = []
    off = 100
    while off < len(data):
        _, content_len = struct.unpack(">ii", data[off : off + 8])
        off += 8
        rec = data[off : off + content_len * 2]
        off += content_len * 2
        (shape_type,) = struct.unpack("<i", rec[0:4])
        if shape_type == 0:  # null shape
            geoms.append([])
            continue
        if shape_type not in (5, 15, 25):  # Polygon / PolygonZ / PolygonM
            raise ValueError(f"unsupported shape type {shape_type}")
        num_parts, num_points = struct.unpack("<ii", rec[36:44])
        parts = list(struct.unpack(f"<{num_parts}i", rec[44 : 44 + 4 * num_parts]))
        pts_off = 44 + 4 * num_parts
        flat = struct.unpack(
            f"<{num_points * 2}d", rec[pts_off : pts_off + 16 * num_points]
        )
        pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(num_points)]
        rings = [
            pts[start : (parts[j + 1] if j + 1 < num_parts else num_points)]
            for j, start in enumerate(parts)
        ]
        # regroup by winding: CW (negative signed area) opens a polygon,
        # CCW rings are holes of the last opened polygon
        polys: list[list[Ring]] = []
        for ring in rings:
            if _ring_signed_area(ring) <= 0 or not polys:
                polys.append([ring])
            else:
                polys[-1].append(ring)
        geoms.append(polys)
    return geoms


def read_dbf(path: str, encoding: str = "latin-1") -> list[dict[str, Any]]:
    """Parse dBase III attribute rows (C/N/F/D/L field types)."""
    with open(path, "rb") as f:
        data = f.read()
    n_records = struct.unpack("<I", data[4:8])[0]
    header_size, record_size = struct.unpack("<HH", data[8:12])
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off : off + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[off + 11])
        length = data[off + 16]
        decimals = data[off + 17]
        fields.append((name, ftype, length, decimals))
        off += 32
    rows = []
    off = header_size
    for _ in range(n_records):
        rec = data[off : off + record_size]
        off += record_size
        if not rec or rec[0:1] == b"*":  # deleted
            continue
        row: dict[str, Any] = {}
        pos = 1
        for name, ftype, length, decimals in fields:
            raw = rec[pos : pos + length].decode(encoding).strip()
            pos += length
            if ftype in ("N", "F"):
                if raw in ("", "*" * length):
                    row[name] = None
                elif ftype == "N" and decimals == 0:
                    row[name] = int(float(raw))
                else:
                    row[name] = float(raw)
            elif ftype == "L":
                row[name] = raw.upper() in ("T", "Y")
            elif ftype == "D":
                row[name] = f"{raw[0:4]}-{raw[4:6]}-{raw[6:8]}" if len(raw) == 8 else None
            else:
                row[name] = raw
        rows.append(row)
    return rows


def shapefile_geometry_area(polys: list[list[Ring]]) -> float:
    """Planar area: sum of |exterior| - sum |holes| per polygon."""
    total = 0.0
    for rings in polys:
        if not rings:
            continue
        total += abs(_ring_signed_area(rings[0]))
        for hole in rings[1:]:
            total -= abs(_ring_signed_area(hole))
    return total


def basins_from_shapefile(
    spark: SparkSession, path: str, id_col: str = "basin_id"
) -> DataFrame:
    """S8 + J3 — read ``<path>.shp``/``.dbf`` into the engine's basins
    DataFrame: passthrough attributes, WKB ``geom``, planar ``area``, and a
    1-based surrogate key in file order (the reference's ``basinID = range(
    1, n+1)``, geotools/geotools.py:213 — deterministic because file order
    is the ordering key)."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    geoms = read_shp(base + ".shp")
    try:
        attrs = read_dbf(base + ".dbf")
    except FileNotFoundError:
        attrs = [{} for _ in geoms]
    if len(attrs) != len(geoms):
        raise ValueError(
            f"shp/dbf record mismatch: {len(geoms)} shapes, {len(attrs)} rows"
        )
    rows = []
    for i, (polys, attr) in enumerate(zip(geoms, attrs), start=1):
        row = dict(attr)
        row[id_col] = i
        row["geom"] = wkb_multipolygon(
            [[list(r) for r in rings] for rings in polys]
        )
        row["area"] = shapefile_geometry_area(polys)
        rows.append(row)
    cols = [id_col] + [c for c in rows[0] if c not in (id_col,)]
    data = [tuple(r[c] for c in cols) for r in rows]
    if math.isnan(sum(r["area"] for r in rows)):
        raise ValueError("NaN area in shapefile geometries")
    return spark.createDataFrame(data, schema=cols)
