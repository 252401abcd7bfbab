"""Vectorized axis-aligned-rectangle ∩ polygon areas (one polygon, many rects).

The scalar kernel (geometry/clip.py) runs Sutherland–Hodgman per (rect,
polygon) pair — exact, but ~100 µs of interpreted Python per fragment.  The
spatial join produces MANY rects per DISTINCT polygon (every candidate cell
of one basin), so the hot path wants the transpose: fix the polygon, sweep
all its rects in numpy.

Method — clamp-shoelace: clamping the plane onto the box
``(x,y) ↦ (clip(x,l,r), clip(y,b,t))`` is a continuous retraction that maps
the ring to a closed curve whose winding number equals the original ring's
at every point strictly inside the box.  Hence the shoelace integral of the
clamped ring (subdivided at the parameters where any clamp switches regime,
so each piece is straight) equals the signed area of ring ∩ box.  Per edge
there are ≤4 regime breakpoints (crossings of x=l, x=r, y=b, y=t), so the
whole computation is a fixed stack of numpy ops over an (edges × rects)
grid — no per-pair Python.

Exact to float rounding; cross-checked against the scalar kernel in
tests/test_geometry.py.  Replaces the per-row path of GEOS overlay areas
(reference geotools/geotools.py:215-219, :262).
"""

from __future__ import annotations

import numpy as np

from radohydro_spark.geometry.wkb import Polygon, parse_wkb_polygons

# cap on the (edges × rect-block) temporaries; blocks keep peak memory flat
# for huge polygons (10k-edge basin × 100k cells never materializes at once)
_BLOCK_CELLS = 1 << 22


def _ring_rect_signed_areas(
    xs: np.ndarray,
    ys: np.ndarray,
    l: np.ndarray,
    b: np.ndarray,
    r: np.ndarray,
    t: np.ndarray,
) -> np.ndarray:
    """Signed area of (ring ∩ rect_i) for every rect, sign = ring orientation.

    xs/ys: ring vertices (closing vertex stripped), shape (V,).
    l/b/r/t: rect bounds, shape (N,).  Returns shape (N,).
    """
    x1 = xs[:, None]
    y1 = ys[:, None]
    x2 = np.roll(xs, -1)[:, None]
    y2 = np.roll(ys, -1)[:, None]
    dx = x2 - x1
    dy = y2 - y1
    with np.errstate(divide="ignore", invalid="ignore"):
        tl = (l[None, :] - x1) / dx
        tr = (r[None, :] - x1) / dx
        tb = (b[None, :] - y1) / dy
        tt = (t[None, :] - y1) / dy
    # (6, V, N) breakpoints: segment endpoints + clamp-regime crossings,
    # NaN/inf (parallel edges) pushed to an endpoint so they subdivide nothing
    bp = np.stack(
        [
            np.zeros_like(tl),
            np.nan_to_num(np.clip(tl, 0.0, 1.0), nan=0.0, posinf=1.0, neginf=0.0),
            np.nan_to_num(np.clip(tr, 0.0, 1.0), nan=0.0, posinf=1.0, neginf=0.0),
            np.nan_to_num(np.clip(tb, 0.0, 1.0), nan=0.0, posinf=1.0, neginf=0.0),
            np.nan_to_num(np.clip(tt, 0.0, 1.0), nan=0.0, posinf=1.0, neginf=0.0),
            np.ones_like(tl),
        ]
    )
    bp.sort(axis=0)
    acc = np.zeros(l.shape[0], dtype=np.float64)
    for i in range(5):
        ta = bp[i]
        tb_ = bp[i + 1]
        xa = np.clip(x1 + ta * dx, l[None, :], r[None, :])
        ya = np.clip(y1 + ta * dy, b[None, :], t[None, :])
        xb = np.clip(x1 + tb_ * dx, l[None, :], r[None, :])
        yb = np.clip(y1 + tb_ * dy, b[None, :], t[None, :])
        acc += np.sum(xa * yb - xb * ya, axis=0)
    return acc / 2.0


def _ring_arrays(ring) -> tuple[np.ndarray, np.ndarray]:
    pts = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else ring
    xs = np.fromiter((p[0] for p in pts), dtype=np.float64, count=len(pts))
    ys = np.fromiter((p[1] for p in pts), dtype=np.float64, count=len(pts))
    return xs, ys


def polygon_rect_areas(
    polys: list[Polygon],
    l: np.ndarray,
    b: np.ndarray,
    r: np.ndarray,
    t: np.ndarray,
) -> np.ndarray:
    """Area of (multipolygon ∩ rect_i) for every rect; matches the scalar
    ``rect_clip_polygon_area`` semantics (|ext| − Σ|holes|, floored at 0 per
    polygon)."""
    n = l.shape[0]
    out = np.zeros(n, dtype=np.float64)
    for rings in polys:
        if not rings or len(rings[0]) < 3:
            continue
        part = np.zeros(n, dtype=np.float64)
        for j, ring in enumerate(rings):
            xs, ys = _ring_arrays(ring)
            if xs.shape[0] < 3:
                continue
            block = max(1, _BLOCK_CELLS // xs.shape[0])
            sgn = np.zeros(n, dtype=np.float64)
            for s in range(0, n, block):
                e = min(n, s + block)
                sgn[s:e] = _ring_rect_signed_areas(xs, ys, l[s:e], b[s:e], r[s:e], t[s:e])
            part += np.abs(sgn) if j == 0 else -np.abs(sgn)
        out += np.maximum(part, 0.0)
    return out


def rect_clip_areas_grouped(
    wkbs, l, b, r, t
) -> np.ndarray:
    """Batch entry point for the pandas UDF: group rows by identical WKB,
    parse each distinct polygon once, sweep its rects vectorized."""
    l = np.asarray(l, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    out = np.empty(l.shape[0], dtype=np.float64)
    groups: dict[bytes, list[int]] = {}
    for i, w in enumerate(wkbs):
        groups.setdefault(bytes(w), []).append(i)
    for w, idxs in groups.items():
        ix = np.asarray(idxs, dtype=np.int64)
        out[ix] = polygon_rect_areas(parse_wkb_polygons(w), l[ix], b[ix], r[ix], t[ix])
    return out
