"""Minimal pure-Python WKB codec for Polygon / MultiPolygon.

The engine carries planar geometry as WKB BinaryType columns (SURVEY.md §1.1
D3/D4).  Only Polygon (type 3) and MultiPolygon (type 6) are needed for
parity with the reference, whose geometries are shapely boxes/polygons read
from shapefiles (reference geotools/geotools.py:142-146, :61).  No GEOS /
shapely dependency: rings are plain coordinate lists.
"""

from __future__ import annotations

import struct

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

Ring = list[tuple[float, float]]
Polygon = list[Ring]  # first ring exterior, rest holes


def wkb_polygon(rings: Polygon) -> bytes:
    """Encode one polygon (exterior + holes) as little-endian WKB."""
    out = bytearray(b"\x01")
    out += struct.pack("<II", _WKB_POLYGON, len(rings))
    for ring in rings:
        pts = list(ring)
        if pts and pts[0] != pts[-1]:
            pts.append(pts[0])
        out += struct.pack("<I", len(pts))
        for x, y in pts:
            out += struct.pack("<dd", float(x), float(y))
    return bytes(out)


def wkb_multipolygon(polygons: list[Polygon]) -> bytes:
    out = bytearray(b"\x01")
    out += struct.pack("<II", _WKB_MULTIPOLYGON, len(polygons))
    for poly in polygons:
        out += wkb_polygon(poly)
    return bytes(out)


def wkb_box(left: float, bottom: float, right: float, top: float) -> bytes:
    """Axis-aligned rectangle, the cell-footprint geometry
    (reference geotools/geotools.py:142-146 shapely ``box``)."""
    return wkb_polygon(
        [[(left, bottom), (right, bottom), (right, top), (left, top), (left, bottom)]]
    )


def _read_ring(buf: memoryview, off: int, fmt: str) -> tuple[Ring, int]:
    (n,) = struct.unpack_from(fmt + "I", buf, off)
    off += 4
    coords = struct.unpack_from(fmt + "d" * (2 * n), buf, off)
    off += 16 * n
    ring = [(coords[2 * i], coords[2 * i + 1]) for i in range(n)]
    return ring, off


def _parse_geom(buf: memoryview, off: int) -> tuple[list[Polygon], int]:
    byte_order = buf[off]
    fmt = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(fmt + "I", buf, off + 1)
    off += 5
    gtype &= 0xFF  # strip EWKB / ISO Z flags if present
    if gtype == _WKB_POLYGON:
        (nrings,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        rings: Polygon = []
        for _ in range(nrings):
            ring, off = _read_ring(buf, off, fmt)
            rings.append(ring)
        return [rings], off
    if gtype == _WKB_MULTIPOLYGON:
        (npolys,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        polys: list[Polygon] = []
        for _ in range(npolys):
            sub, off = _parse_geom(buf, off)
            polys.extend(sub)
        return polys, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def parse_wkb_polygons(wkb: bytes) -> list[Polygon]:
    """Decode WKB into a list of polygons (each a list of rings)."""
    polys, _ = _parse_geom(memoryview(wkb), 0)
    return polys
