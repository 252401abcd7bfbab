"""Exact axis-aligned-rectangle ∩ polygon area (Sutherland–Hodgman).

This is the one geometric kernel the engine needs that Spark lacks: the
reference computes intersection fragments with GEOS via
``gp.overlay(cellgrd, gdfbnd, how='intersection')`` (reference
geotools/geotools.py:215-219) and then takes fragment areas
(geotools/geotools.py:262).  Because one join side is always an axis-aligned
grid cell, the general polygon-overlay problem reduces to clipping the basin
polygon against a rectangle — a convex clip window, for which
Sutherland–Hodgman is exact on simple polygons — and taking the shoelace
area.  Holes are clipped separately and subtracted.

Pure Python/maths, no GEOS; used inside an Arrow-vectorized pandas UDF
(operators/spatial.py).
"""

from __future__ import annotations

from radohydro_spark.geometry.wkb import Polygon, Ring, parse_wkb_polygons


def _shoelace(ring: Ring) -> float:
    """Signed *2 area of a ring (positive if counter-clockwise)."""
    n = len(ring)
    if n < 3:
        return 0.0
    s = 0.0
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def polygon_area(rings: Polygon) -> float:
    """Unsigned area of exterior minus holes."""
    if not rings:
        return 0.0
    area = abs(_shoelace(rings[0]))
    for hole in rings[1:]:
        area -= abs(_shoelace(hole))
    return area / 2.0


def _clip_halfplane(ring: Ring, axis: int, bound: float, keep_leq: bool) -> Ring:
    """Clip ring against one axis-aligned half-plane."""
    if not ring:
        return []
    out: Ring = []
    n = len(ring)
    for i in range(n):
        cx, cy = ring[i]
        px, py = ring[i - 1]
        cur = (cx, cy)[axis]
        prev = (px, py)[axis]
        cur_in = cur <= bound if keep_leq else cur >= bound
        prev_in = prev <= bound if keep_leq else prev >= bound
        if cur_in != prev_in:
            t = (bound - prev) / (cur - prev)
            out.append((px + t * (cx - px), py + t * (cy - py)))
        if cur_in:
            out.append((cx, cy))
    return out


def _clip_ring_to_rect(
    ring: Ring, left: float, bottom: float, right: float, top: float
) -> Ring:
    r = ring
    if r and r[0] == r[-1]:
        r = r[:-1]
    r = _clip_halfplane(r, 0, left, keep_leq=False)
    r = _clip_halfplane(r, 0, right, keep_leq=True)
    r = _clip_halfplane(r, 1, bottom, keep_leq=False)
    r = _clip_halfplane(r, 1, top, keep_leq=True)
    return r


def rect_clip_polygon_area(
    wkb: bytes, left: float, bottom: float, right: float, top: float
) -> float:
    """Area of (rectangle ∩ polygon/multipolygon given as WKB).

    Matches the semantics of the reference's overlay-intersection fragment
    areas (geotools/geotools.py:215-219, :262) for valid simple polygons.
    """
    total = 0.0
    for rings in parse_wkb_polygons(wkb):
        if not rings:
            continue
        ext = _clip_ring_to_rect(rings[0], left, bottom, right, top)
        a = abs(_shoelace(ext)) / 2.0
        for hole in rings[1:]:
            h = _clip_ring_to_rect(hole, left, bottom, right, top)
            a -= abs(_shoelace(h)) / 2.0
        total += max(a, 0.0)
    return total
