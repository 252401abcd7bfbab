"""S8 shapefile source tests against the reference's own example fixtures
(read-only at /root/reference/Examples) plus an end-to-end semantic golden:
uniform rain over real basin geometry must equal the rain in every basin.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from radohydro_spark.geometry.wkb import parse_wkb_polygons
from radohydro_spark.operators.spatial import create_cell_grid
from radohydro_spark.plans.pipeline import precip_timeseries
from radohydro_spark.sources.shapefile import (
    basins_from_shapefile,
    read_dbf,
    read_shp,
)

EXAMPLES = "/root/reference/Examples"


def test_einzugsgebiet_attrs_and_areas(spark):
    b = basins_from_shapefile(spark, f"{EXAMPLES}/einzugsgebiet.shp")
    rows = b.orderBy("basin_id").collect()
    assert [r.basin_id for r in rows] == [1, 2, 3, 4, 5]
    assert [r.OBJECTID for r in rows] == [1, 2, 3, 4, 5]
    for r in rows:
        # planar area from parsed rings matches the shapefile's own
        # Shape_Area attribute (authoritative cross-check of the parser)
        assert math.isclose(r.area, r.Shape_Area, rel_tol=1e-9)
        assert parse_wkb_polygons(bytes(r.geom))  # WKB round-trips


def test_debug_fixture_cells_are_1km_rects(spark):
    b = basins_from_shapefile(spark, f"{EXAMPLES}/radohydro_debug1x3.shp")
    rows = b.orderBy("basin_id").collect()
    assert len(rows) == 3
    for r in rows:
        assert math.isclose(r.right - r.left, 1000.0, rel_tol=1e-6)


def test_dbf_types():
    rows = read_dbf(f"{EXAMPLES}/Mueglitz_Basin.dbf")
    assert len(rows) == 1
    r = rows[0]
    assert isinstance(r["AREA_QKM"], float)
    assert isinstance(r["GKZ"], str)
    assert r["DATENSTAND"] is None or "-" in r["DATENSTAND"]


def test_uniform_rain_over_reference_basins(spark):
    """SURVEY §5 semantic golden: weights sum to 1 per basin, so uniform
    rain r over the whole grid yields exactly r/10 mm in every basin —
    using the reference's real einzugsgebiet geometry."""
    basins = basins_from_shapefile(spark, f"{EXAMPLES}/einzugsgebiet.shp").select(
        "basin_id", "geom"
    )
    geoms = read_shp(f"{EXAMPLES}/einzugsgebiet.shp")
    xs = [p[0] for polys in geoms for rings in polys for p in rings[0]]
    ys = [p[1] for polys in geoms for rings in polys for p in rings[0]]
    cell = 1000.0
    ulx = math.floor(min(xs) / cell - 2) * cell
    uly = math.ceil(max(ys) / cell + 2) * cell
    n_cols = int((max(xs) - ulx) / cell) + 3
    n_rows = int((uly - min(ys)) / cell) + 3
    cells = create_cell_grid(spark, n_rows, n_cols, ulx, uly, cell, -cell)

    obs = (
        cells.select("cell_row", "cell_col")
        .crossJoin(
            spark.range(0, 3, 1, 1).select(
                F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id)").alias("ts")
            )
        )
        .withColumn("value", F.lit(70.0))
    )
    res = precip_timeseries(obs, cells, basins).collect()
    assert len(res) == 5 * 3
    for r in res:
        assert r.rainfall_mm == pytest.approx(7.0, abs=1e-9)
