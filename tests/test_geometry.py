"""Unit tests for the WKB codec and the rect∩polygon clip kernel."""

import math

from radohydro_spark.geometry.clip import polygon_area, rect_clip_polygon_area
from radohydro_spark.geometry.wkb import (
    parse_wkb_polygons,
    wkb_box,
    wkb_multipolygon,
    wkb_polygon,
)


def test_wkb_roundtrip_box():
    blob = wkb_box(0, 0, 10, 5)
    polys = parse_wkb_polygons(blob)
    assert len(polys) == 1
    assert polygon_area(polys[0]) == 50.0


def test_wkb_roundtrip_multipolygon():
    p1 = [[(0, 0), (4, 0), (4, 4), (0, 4)]]
    p2 = [[(10, 10), (12, 10), (12, 12), (10, 12)]]
    polys = parse_wkb_polygons(wkb_multipolygon([p1, p2]))
    assert len(polys) == 2
    assert polygon_area(polys[0]) == 16.0
    assert polygon_area(polys[1]) == 4.0


def test_polygon_with_hole_area():
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    hole = [(2, 2), (4, 2), (4, 4), (2, 4)]
    blob = wkb_polygon([outer, hole])
    assert polygon_area(parse_wkb_polygons(blob)[0]) == 100.0 - 4.0


def test_clip_fully_inside():
    blob = wkb_box(2, 2, 4, 4)
    assert rect_clip_polygon_area(blob, 0, 0, 10, 10) == 4.0


def test_clip_fully_outside():
    blob = wkb_box(20, 20, 30, 30)
    assert rect_clip_polygon_area(blob, 0, 0, 10, 10) == 0.0


def test_clip_partial_overlap():
    # rect [5,15]x[5,15] clipped to [0,10]^2 -> 5x5
    blob = wkb_box(5, 5, 15, 15)
    assert rect_clip_polygon_area(blob, 0, 0, 10, 10) == 25.0


def test_clip_triangle():
    # right triangle (0,0)-(10,0)-(0,10); clip to [0,5]^2:
    # square minus the corner triangle above the hypotenuse x+y=10 → area 25
    tri = wkb_polygon([[(0, 0), (10, 0), (0, 10)]])
    assert math.isclose(rect_clip_polygon_area(tri, 0, 0, 5, 5), 25.0)
    # clip to [0,10]^2 recovers the full triangle
    assert math.isclose(rect_clip_polygon_area(tri, 0, 0, 10, 10), 50.0)
    # clip to [5,10]x[5,10]: only the empty side of the hypotenuse… the
    # triangle's part with x>=5,y>=5 is empty except boundary → 0
    assert math.isclose(rect_clip_polygon_area(tri, 5, 5, 10, 10), 0.0)


def test_clip_concave_polygon():
    # U-shape: 10x10 square with a 4x8 notch cut from the top middle
    u = wkb_polygon(
        [
            [
                (0, 0),
                (10, 0),
                (10, 10),
                (7, 10),
                (7, 2),
                (3, 2),
                (3, 10),
                (0, 10),
            ]
        ]
    )
    full = rect_clip_polygon_area(u, 0, 0, 10, 10)
    assert math.isclose(full, 100 - 4 * 8)
    # clip to the notch region only → 0
    assert math.isclose(rect_clip_polygon_area(u, 3, 2, 7, 10), 0.0)
    # clip to left arm
    assert math.isclose(rect_clip_polygon_area(u, 0, 0, 3, 10), 30.0)


def test_clip_polygon_with_hole():
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    hole = [(4, 4), (6, 4), (6, 6), (4, 6)]
    blob = wkb_polygon([outer, hole])
    # full window: 100 - 4
    assert math.isclose(rect_clip_polygon_area(blob, 0, 0, 10, 10), 96.0)
    # window covering half the hole: 5x10 minus half the hole (2x1... hole
    # x in [4,6]; window x in [0,5] → hole overlap 1x2=2) → 50-2=48
    assert math.isclose(rect_clip_polygon_area(blob, 0, 0, 5, 10), 48.0)
