"""End-to-end orchestration test: mirror dir + reference shapefile → CSVs.

Recreates the reference's primary `radohydro(...)` flow against a local
mirror of ESRI-ASCII rasters, using the reference's own `radohydro_debug1x3`
fixture (three exactly-cell-aligned 1 km rectangles — the reference
author's hand-verification geometry, SURVEY.md §5).
"""

from __future__ import annotations

import math
import os

from radohydro_spark.plans.pipeline import radohydro_run
from radohydro_spark.sources.shapefile import read_dbf

EXAMPLES = "/root/reference/Examples"


def _write_grid(path, ulx, uly, n_rows, n_cols, cell, value_fn, nodata=-1.0):
    with open(path, "w") as f:
        f.write(f"ncols {n_cols}\nnrows {n_rows}\n")
        f.write(f"xllcorner {ulx}\nyllcorner {uly - n_rows * cell}\n")
        f.write(f"cellsize {cell}\nNODATA_value {nodata}\n")
        for r in range(n_rows):
            f.write(" ".join(str(value_fn(r, c)) for c in range(n_cols)) + "\n")


def test_radohydro_run_debug1x3(spark, tmp_path):
    attrs = read_dbf(f"{EXAMPLES}/radohydro_debug1x3.dbf")
    cell = 1000.0
    # grid framing the three fixture cells with 2 cells of slack, aligned
    # to the fixture rect corners so each basin covers exactly one cell
    ulx = min(a["left"] for a in attrs) - 2 * cell
    uly = max(a["top"] for a in attrs) + 2 * cell
    n_cols, n_rows = 8, 8

    mirror = tmp_path / "mirror"
    mirror.mkdir()
    for h in range(4):  # hour 3 outside [start, end] — pruned by S5
        _write_grid(
            str(mirror / f"RW-20240101-{h:02d}00.asc"),
            ulx,
            uly,
            n_rows,
            n_cols,
            cell,
            lambda r, c, h=h: 10 * (r + c + h + 1),
        )

    out = tmp_path / "out"
    out.mkdir()
    result = radohydro_run(
        spark,
        start="2024-01-01 00:00:00",
        end="2024-01-01 02:00:00",
        shapefile_path=f"{EXAMPLES}/radohydro_debug1x3.shp",
        mirror_dir=str(mirror),
        out_dir=str(out),
        date_type="minutes",
        shape_crs="epsg:4326",  # fixture geometry is WGS84; attrs carry
        grid_crs="epsg:25833",  # the original UTM33 cell rects
    )
    rows = result.collect()
    assert len(rows) == 3 * 3  # 3 basins x 3 in-range hours

    # each fixture rect sits exactly on one grid cell: expected rainfall is
    # that cell's value / 10 = (row + col + h + 1)
    expected = {}
    for i, a in enumerate(attrs, start=1):
        col = round((a["left"] - ulx) / cell)
        row = round((uly - a["top"]) / cell)
        expected[i] = (row, col)
    for r in rows:
        row_, col_ = expected[r.basin_id]
        h = r.ts.hour
        # reprojected fixture rects land within ~1 m of the original UTM
        # cells -> neighbouring-cell slivers can shift the weighted mean by
        # a few hundredths of a millimetre
        assert abs(r.rainfall_mm - (row_ + col_ + h + 1)) < 0.05, (r, row_, col_)

    csvs = sorted(p for p in os.listdir(out) if p.endswith(".csv"))
    assert csvs == ["basin_1.csv", "basin_2.csv", "basin_3.csv"]
    body = open(out / "basin_1.csv").read().splitlines()
    assert len(body) == 3 + 3  # headers + 3 timesteps
    assert spark.read.parquet(str(out / "basins_wide.parquet")).count() == 3


def test_radohydro_run_regnie(spark, tmp_path):
    """REGNIE path: gzipped fixed-width day files, hard-coded lon/lat grid
    (reference radohydro.py:392-395), daily timestamps from raYYMMDD names."""
    import gzip

    import numpy as np

    from radohydro_spark.geometry.wkb import wkb_box
    from radohydro_spark.sources.regnie import REGNIE_COLS, REGNIE_ROWS, REGNIE_TRANSFORM

    def day_payload(day: int) -> bytes:
        r = np.arange(REGNIE_ROWS)[:, None]
        c = np.arange(REGNIE_COLS)[None, :]
        vals = ((r + c + day) % 1200).astype(int)
        lines = ["".join(f"{v:4d}" for v in row) for row in vals]
        lines.append("metadata trailer")  # dropped by the decoder
        return gzip.compress("\n".join(lines).encode())

    mirror = tmp_path / "regnie"
    mirror.mkdir()
    for day in (1, 2):
        (mirror / f"ra2401{day:02d}.gz").write_bytes(day_payload(day))

    # one basin covering exactly cells (row 100, cols 200..202)
    t = REGNIE_TRANSFORM
    left = t["ulx"] + 200 * t["xres"]
    right = t["ulx"] + 203 * t["xres"]
    top = t["uly"] + 100 * t["yres"]
    bottom = t["uly"] + 101 * t["yres"]
    basins = spark.createDataFrame(
        [(1, wkb_box(left, bottom, right, top))], "basin_id int, geom binary"
    )

    out = tmp_path / "out"
    out.mkdir()
    result = radohydro_run(
        spark,
        start="2024-01-01",
        end="2024-01-02",
        shapefile_path=basins,
        mirror_dir=str(mirror),
        out_dir=str(out),
        source="regnie",
        write_wide=False,
    )
    rows = {r.ts.day: r.rainfall_mm for r in result.collect()}
    for day in (1, 2):
        vals = [(100 + c + day) % 1200 for c in (200, 201, 202)]
        assert rows[day] == round(sum(vals) / 3 / 10, 3)


def test_cli_entry(spark, tmp_path, capsys):
    """python -m radohydro_spark smoke: same flow as the API test, through
    argument parsing (session is reused via getOrCreate)."""
    from radohydro_spark.__main__ import main

    attrs = read_dbf(f"{EXAMPLES}/radohydro_debug1x3.dbf")
    cell = 1000.0
    ulx = min(a["left"] for a in attrs) - 2 * cell
    uly = max(a["top"] for a in attrs) + 2 * cell
    mirror = tmp_path / "m"
    mirror.mkdir()
    _write_grid(str(mirror / "RW-20240101-0000.asc"), ulx, uly, 8, 8, cell, lambda r, c: 50)
    out = tmp_path / "o"
    out.mkdir()
    rc = main(
        [
            "--start", "2024-01-01 00:00:00",
            "--end", "2024-01-01 02:00:00",
            "--shape", f"{EXAMPLES}/radohydro_debug1x3.shp",
            "--mirror", str(mirror),
            "--out", str(out),
            "--shape-crs", "epsg:4326",
            "--grid-crs", "epsg:25833",
            "--no-wide",
        ]
    )
    assert rc == 0
    assert "wrote 3 (basin, timestep) rows" in capsys.readouterr().out
    assert len([p for p in os.listdir(out) if p.endswith(".csv")]) == 3


def test_radohydro_run_geotiff_mirror(spark, tmp_path):
    """S9 path: the same debug1x3 run from a GeoTIFF mirror must reproduce
    the ASCII-grid run bit-for-bit (shared obs contract, SURVEY.md §2 S9)."""
    import numpy as np

    from radohydro_spark.sources.geotiff import encode_geotiff

    attrs = read_dbf(f"{EXAMPLES}/radohydro_debug1x3.dbf")
    cell = 1000.0
    ulx = min(a["left"] for a in attrs) - 2 * cell
    uly = max(a["top"] for a in attrs) + 2 * cell
    n_cols = n_rows = 8

    mirror = tmp_path / "mirror_tif"
    mirror.mkdir()
    for h in range(3):
        vals = np.array(
            [[10 * (r + c + h + 1) for c in range(n_cols)] for r in range(n_rows)],
            dtype="int16",
        )
        blob = encode_geotiff(vals, ulx, uly, cell, -cell, nodata=-1.0)
        (mirror / f"RW-20240101-{h:02d}00.tif").write_bytes(blob)

    out = tmp_path / "out_tif"
    out.mkdir()
    result = radohydro_run(
        spark,
        start="2024-01-01 00:00:00",
        end="2024-01-01 02:00:00",
        shapefile_path=f"{EXAMPLES}/radohydro_debug1x3.shp",
        mirror_dir=str(mirror),
        out_dir=str(out),
        source="geotiff",
        date_type="minutes",
        shape_crs="epsg:4326",
        grid_crs="epsg:25833",
        write_wide=False,
    )
    rows = result.collect()
    assert len(rows) == 9
    expected = {}
    for i, a in enumerate(attrs, start=1):
        col = round((a["left"] - ulx) / cell)
        row = round((uly - a["top"]) / cell)
        expected[i] = (row, col)
    for r in rows:
        row_, col_ = expected[r.basin_id]
        assert abs(r.rainfall_mm - (row_ + col_ + r.ts.hour + 1)) < 0.05
