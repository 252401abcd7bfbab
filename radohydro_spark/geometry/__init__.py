from radohydro_spark.geometry.wkb import (
    parse_wkb_polygons,
    wkb_box,
    wkb_multipolygon,
    wkb_polygon,
)
from radohydro_spark.geometry.clip import polygon_area, rect_clip_polygon_area
from radohydro_spark.geometry.crs import transform_crs, transform_points

__all__ = [
    "parse_wkb_polygons",
    "wkb_box",
    "wkb_polygon",
    "wkb_multipolygon",
    "polygon_area",
    "rect_clip_polygon_area",
    "transform_crs",
    "transform_points",
]
