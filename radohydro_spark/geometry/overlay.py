"""Exact area of the intersection of two ARBITRARY simple polygons.

Closes the one functional gap between the engine's J1 and the
reference's general ``gp.overlay(a, b, how='intersection')``
(reference geotools/geotools.py:215-219): the specialized kernel
(geometry/clip.py) requires one side to be an axis-aligned rectangle —
all the reference ever feeds it, since cells are ``shapely box`` by
construction (geotools/geotools.py:142-146) — while this module handles
polygon × polygon with no convexity assumption on either side.

Method — signed fan decomposition + convex clipping (no GEOS, no
triangulation robustness headaches):

For a closed ring P = (v0..v_{n-1}), the winding-number function obeys

    w_P(x) = Σ_{i=1..n-2} w_{T_i}(x),   T_i = (v0, v_i, v_{i+1})

(the standard shoelace/fan identity, valid for ANY simple or even
self-touching ring).  Integrating an indicator 1_R against both sides:

    o_P · area(P ∩ R) = Σ_i o_i · area(T_i ∩ R)

where o is the ±1 orientation sign.  Each T_i is a TRIANGLE — convex —
so ``area(T_i ∩ R)`` for an arbitrary simple ring R is exact via
Sutherland–Hodgman against the triangle's three half-planes plus a
shoelace: S-H clipping an arbitrary subject against a CONVEX window
yields a (possibly bridge-degenerate) polygon whose absolute shoelace
area equals the true intersection area, the same guarantee the rect
kernel relies on.  Degenerate fan triangles (collinear, o_i = 0)
contribute nothing and are skipped.

Holes compose by inclusion–exclusion on both sides, matching the rect
kernel's ``|exterior| − Σ|holes|`` convention:

    area(P ∩ Q) = Σ_{rp ∈ rings(P)} Σ_{rq ∈ rings(Q)} c_rp · c_rq ·
                  area(ring_rp ∩ ring_rq)

with c = +1 for exteriors and −1 for holes (holes assumed inside their
exterior and mutually disjoint — the validity contract shapefile data
carries).

Cost: O(|P| · |Q|) per polygon pair (each of the |P|−2 fan triangles
clips every Q ring once).  The operator layer (operators/spatial.py
``polygon_overlay``) runs this only on bbox-surviving candidate pairs.
"""

from __future__ import annotations

from radohydro_spark.geometry.clip import _shoelace
from radohydro_spark.geometry.wkb import Polygon, Ring, parse_wkb_polygons


def _clip_halfplane_edge(ring: Ring, ax: float, ay: float, bx: float, by: float, side: float) -> Ring:
    """Clip ``ring`` against the half-plane of directed edge (a→b) that
    contains points with ``cross(b−a, p−a) · side >= 0``."""
    if not ring:
        return []
    ex, ey = bx - ax, by - ay
    out: Ring = []
    n = len(ring)
    prev = ring[-1]
    pc = (ex * (prev[1] - ay) - ey * (prev[0] - ax)) * side
    for cur in ring:
        cc = (ex * (cur[1] - ay) - ey * (cur[0] - ax)) * side
        if (cc >= 0.0) != (pc >= 0.0):
            t = pc / (pc - cc)
            out.append(
                (prev[0] + t * (cur[0] - prev[0]), prev[1] + t * (cur[1] - prev[1]))
            )
        if cc >= 0.0:
            out.append(cur)
        prev, pc = cur, cc
    return out


def _tri_ring_area(ring: Ring, t0, t1, t2, orient: float) -> float:
    """|area(triangle (t0,t1,t2) ∩ ring)| via S-H against the triangle's
    three edges.  ``orient`` is the triangle's orientation sign (+1 CCW),
    which decides the interior side of each directed edge."""
    r = ring
    for a, b in ((t0, t1), (t1, t2), (t2, t0)):
        r = _clip_halfplane_edge(r, a[0], a[1], b[0], b[1], orient)
        if len(r) < 3:
            return 0.0
    return abs(_shoelace(r)) / 2.0


def _ring_ring_area(p: Ring, q: Ring) -> float:
    """area(simple ring p ∩ simple ring q) by fanning p into signed
    triangles and clipping q against each."""
    pp = p[:-1] if len(p) > 1 and p[0] == p[-1] else p
    qq = q[:-1] if len(q) > 1 and q[0] == q[-1] else q
    if len(pp) < 3 or len(qq) < 3:
        return 0.0
    o_p = _shoelace(pp)
    if o_p == 0.0:
        return 0.0
    sign_p = 1.0 if o_p > 0 else -1.0
    total = 0.0
    v0 = pp[0]
    for i in range(1, len(pp) - 1):
        vi, vj = pp[i], pp[i + 1]
        tw = (vi[0] - v0[0]) * (vj[1] - v0[1]) - (vj[0] - v0[0]) * (vi[1] - v0[1])
        if tw == 0.0:
            continue
        o_i = 1.0 if tw > 0 else -1.0
        a = _tri_ring_area(qq, v0, vi, vj, o_i)
        if a:
            total += o_i * a
    # the identity gives sign_p * total = area >= 0; clamp float noise
    return max(sign_p * total, 0.0)


def polygon_pair_area(p: Polygon, q: Polygon) -> float:
    """area(P ∩ Q) for two polygons given as ring lists
    [exterior, hole, hole, ...] — inclusion–exclusion over ring pairs."""
    total = 0.0
    for ip, rp in enumerate(p):
        cp = 1.0 if ip == 0 else -1.0
        for iq, rq in enumerate(q):
            cq = 1.0 if iq == 0 else -1.0
            a = _ring_ring_area(rp, rq)
            if a:
                total += cp * cq * a
    return max(total, 0.0)


def polygon_intersection_area(wkb_a: bytes, wkb_b: bytes) -> float:
    """area(A ∩ B) for WKB polygons/multipolygons — the general sibling
    of geometry.clip.rect_clip_polygon_area (multipolygon parts sum, the
    disjoint-parts contract of WKB MultiPolygon)."""
    pa = parse_wkb_polygons(wkb_a)
    pb = parse_wkb_polygons(wkb_b)
    total = 0.0
    for p in pa:
        for q in pb:
            total += polygon_pair_area(p, q)
    return total
