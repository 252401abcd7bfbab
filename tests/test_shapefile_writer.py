"""K2/K3 shapefile WRITER tests: dependency-free .shp/.shx/.dbf emission,
round-tripped through the engine's own reader (sources/shapefile.py) and
against the reference's example fixtures (reference wide sink:
geotools/geotools.py:321-330)."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from radohydro_spark.geometry.wkb import parse_wkb_polygons, wkb_box
from radohydro_spark.sinks.shapefile_writer import (
    write_shapefile,
    write_wide_shapefile,
)
from radohydro_spark.sources.shapefile import basins_from_shapefile, read_dbf, read_shp

EXAMPLES = "/root/reference/Examples"


def _mixed_df(spark):
    rows = [
        (1, "Elbe", 12.5, True, wkb_box(0.0, 0.0, 10.0, 5.0)),
        (2, "Mueglitz im Tal", -3.25, False, wkb_box(20.0, 20.0, 22.0, 24.0)),
        (3, None, None, None, wkb_box(-5.0, -5.0, -1.0, -2.0)),
    ]
    return spark.createDataFrame(
        rows, "basin_id int, name string, score double, flag boolean, geom binary"
    )


def test_roundtrip_mixed_attribute_types(spark, tmp_path):
    path = str(tmp_path / "mixed.shp")
    write_shapefile(_mixed_df(spark), path)
    back = basins_from_shapefile(spark, path).orderBy("basin_id").collect()
    assert [r.basin_id for r in back] == [1, 2, 3]
    assert [r.name for r in back] == ["Elbe", "Mueglitz im Tal", ""]
    assert back[0].score == 12.5 and back[1].score == -3.25 and back[2].score is None
    assert back[0].flag is True and back[1].flag is False
    # geometry area survives (rect areas are exact)
    assert math.isclose(back[0].area, 50.0)
    assert math.isclose(back[1].area, 8.0)
    assert math.isclose(back[2].area, 12.0)


def test_shx_offsets_point_at_records(tmp_path, spark):
    path = str(tmp_path / "idx.shp")
    write_shapefile(_mixed_df(spark), path)
    with open(path, "rb") as f:
        shp = f.read()
    with open(path[:-4] + ".shx", "rb") as f:
        shx = f.read()
    n = (len(shx) - 100) // 8
    assert n == 3
    for i in range(n):
        off_words, words = struct.unpack_from(">ii", shx, 100 + 8 * i)
        rec_no, content_words = struct.unpack_from(">ii", shp, off_words * 2)
        assert rec_no == i + 1
        assert content_words == words


def test_reference_fixture_roundtrip(spark, tmp_path):
    """Read the reference's own einzugsgebiet fixture, re-write it with the
    engine writer, read it back: same attrs, same planar areas."""
    src = basins_from_shapefile(spark, f"{EXAMPLES}/einzugsgebiet.shp")
    path = str(tmp_path / "rt.shp")
    write_shapefile(src, path)
    back = basins_from_shapefile(spark, path)
    a = src.orderBy("basin_id").collect()
    b = back.orderBy("basin_id").collect()
    assert len(a) == len(b) == 5
    for ra, rb in zip(a, b):
        assert ra.basin_id == rb.basin_id
        assert ra.OBJECTID == rb.OBJECTID
        assert math.isclose(ra.area, rb.area, rel_tol=1e-9)
        assert math.isclose(ra.Shape_Area, rb.Shape_Area, rel_tol=1e-9)
        # ring-exact: same point sets after orientation normalization
        pa = parse_wkb_polygons(bytes(ra.geom))
        pb = parse_wkb_polygons(bytes(rb.geom))
        assert {p for poly in pa for ring in poly for p in ring} == {
            p for poly in pb for ring in poly for p in ring
        }


def test_dbf_name_truncation_and_dedup(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 2, 3, wkb_box(0, 0, 1, 1))],
        "very_long_column_a int, very_long_column_b int, short int, geom binary",
    )
    path = str(tmp_path / "trunc.shp")
    write_shapefile(df, path)
    rows = read_dbf(path[:-4] + ".dbf")
    names = list(rows[0].keys())
    assert len(names) == 3 and len(set(names)) == 3
    assert all(len(n) <= 10 for n in names)
    assert rows[0]["short"] == 3


def test_wide_shapefile_matches_reference_shape(spark, tmp_path):
    """The reference's wide sink: one %y%m%d%H%M FLOAT column per timestep
    joined onto basin geometry (geotools/geotools.py:171-176)."""
    from radohydro_spark.plans.pipeline import precip_timeseries
    from radohydro_spark.sources.synthetic import (
        synthetic_basins,
        synthetic_cells,
        synthetic_obs,
    )

    res = precip_timeseries(
        synthetic_obs(spark), synthetic_cells(spark), synthetic_basins(spark)
    )
    path = str(tmp_path / "wide.shp")
    write_wide_shapefile(res, synthetic_basins(spark), path)
    back = basins_from_shapefile(spark, path)
    # 24 digit-named data columns, reference column convention
    digit_cols = [c for c in back.columns if c.isdigit()]
    assert len(digit_cols) == 24
    assert "2401010000" in digit_cols
    # spot-check one value against the long result
    long_rows = {
        (r.basin_id, r.ts.strftime("%y%m%d%H%M")): r.rainfall_mm
        for r in res.collect()
    }
    wide_rows = back.orderBy("basin_id").collect()
    for r in wide_rows[:2]:
        for c in digit_cols[:6]:
            expect = long_rows.get((r.basin_id, c))
            got = r[c]
            if expect is None:
                assert got is None
            else:
                assert math.isclose(got, expect, abs_tol=1e-9)


def test_500_column_guard(spark, tmp_path):
    cols = ", ".join(f"c{i} int" for i in range(501))
    df = spark.createDataFrame(
        [tuple([0] * 501 + [wkb_box(0, 0, 1, 1)])], f"{cols}, geom binary"
    )
    with pytest.raises(ValueError, match="dBase"):
        write_shapefile(df, str(tmp_path / "wide.shp"))


def test_row_cap_guard_refuses_fact_sized_frames(spark, tmp_path, monkeypatch):
    # r11: the driver-side collect is dimension-sized BY CONTRACT; a
    # mis-wired fact table must raise, not OOM the driver.  Cap patched
    # low so the test stays small.
    import radohydro_spark.sinks.shapefile_writer as sw

    monkeypatch.setattr(sw, "MAX_SHAPEFILE_ROWS", 10)
    df = spark.range(11).select(
        F.col("id").alias("basin_id"),
        F.lit(wkb_box(0.0, 0.0, 1.0, 1.0)).alias("geom"),
    )
    with pytest.raises(ValueError, match="dimension-sized"):
        sw.write_shapefile(df, str(tmp_path / "big.shp"))
    # at exactly the cap it still writes
    sw.write_shapefile(df.limit(10), str(tmp_path / "ok.shp"))
    assert (tmp_path / "ok.shp").exists()
