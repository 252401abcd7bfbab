"""Sinks (SURVEY.md §2.1 K1-K4).

The reference emits per-basin CSVs with bespoke two-line headers
(geotools/geotools.py:295-319), a wide shapefile capped at 500 data
columns by the dBase format (geotools/geotools.py:321-330, README.md:17),
an optional cell-grid shapefile (geotools/geotools.py:178-184), and a
GeoTIFF raster (geotools/geotools.py:369-381).

Engine mapping:

* K1  per-basin CSV     — distributed partitioned CSV write; the bespoke
                          headers are a driver post-pass over the
                          dimension-sized output directory (n_basins files).
* K2  wide vector sink  — sink-time pivot → parquet with a WKB geometry
                          column ("GeoParquet-style"): no 500-column dBase
                          cliff, no 10-char field-name truncation.
* K3  cell-grid sink    — same, over the cell dimension.
* K4  raster sink       — ESRI-ASCII grid text (the same format sources/
                          ascii_grid.py decodes, giving a lossless
                          round-trip); the clip-window raster is small by
                          construction so a driver-side render is correct
                          at any corpus scale.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radohydro_spark.operators.aggregate import pivot_wide


def write_basin_csvs(
    result: DataFrame,
    basins: DataFrame,
    out_dir: str,
    name_prefix: str = "basin",
    round_decimals: int = 3,
) -> list[str]:
    """K1 — one CSV per basin: 2 header lines (zero-padded basin id, basin
    area) then ``Time[yymmddhhmm],rainfall[mm]`` rows.

    The fact table is written by Spark (``partitionBy('basin_id')``, one
    shuffle-free task group per basin); only the header prepend + rename
    touches the driver, and that is O(n_basins) — dimension-sized.

    Zero-pad width uses ``ceil(log10(n+1))`` — the reference's ``np.ceil(
    np.log(n))`` (geotools/geotools.py:300-303) is a natural-log latent
    bug, consciously fixed here (SURVEY.md §7.3).
    """
    if "area" in basins.columns:
        meta = basins.select(
            "basin_id", F.col("area").cast("double").alias("area")
        ).collect()
        areas = {r["basin_id"]: r["area"] for r in meta}
    else:
        # dimension-sized driver pass: polygon area from the WKB geometry
        # (reference takes gdfbnd.area per output row, geotools:304)
        from radohydro_spark.geometry.clip import polygon_area
        from radohydro_spark.geometry.wkb import parse_wkb_polygons

        areas = {
            r["basin_id"]: sum(polygon_area(p) for p in parse_wkb_polygons(bytes(r["geom"])))
            for r in basins.select("basin_id", "geom").collect()
        }
    n_basins = len(areas)
    width = max(1, math.ceil(math.log10(n_basins + 1)))

    staging = os.path.join(out_dir, "_staging")
    (
        result.select(
            "basin_id",
            F.date_format("ts", "yyMMddHHmm").alias("time"),
            F.round("rainfall_mm", round_decimals).alias("rainfall"),
        )
        .repartition("basin_id")
        .sortWithinPartitions("time")
        .write.mode("overwrite")
        .partitionBy("basin_id")
        .csv(staging)
    )

    written = []
    for entry in sorted(os.listdir(staging)):
        if not entry.startswith("basin_id="):
            continue
        bid = int(entry.split("=", 1)[1])
        padded = str(bid).zfill(width)
        final = os.path.join(out_dir, f"{name_prefix}_{padded}.csv")
        parts = sorted(
            p for p in os.listdir(os.path.join(staging, entry)) if p.endswith(".csv")
        )
        with open(final, "w") as out:
            out.write(f"basinID,{padded}\n")
            out.write(f"area[m2],{areas.get(bid, float('nan'))}\n")
            out.write("Time[yymmddhhmm],rainfall[mm]\n")
            for p in parts:
                with open(os.path.join(staging, entry, p)) as f:
                    out.write(f.read())
        written.append(final)
    shutil.rmtree(staging)
    return written


def write_wide_geoparquet(
    result: DataFrame,
    basins: DataFrame,
    path: str,
    ts_fmt: str = "yyMMddHHmm",
) -> None:
    """K2 — wide per-basin table joined back onto basin geometry, written
    as parquet with a WKB ``geom`` column.  The pivot happens ONLY here at
    the sink (long format internally, SURVEY.md §7.1); unlike the dBase
    target there is no 500-column refusal (README.md:17)."""
    wide = pivot_wide(result, ts_format=ts_fmt)
    out = basins.join(wide, "basin_id", "left")
    out.write.mode("overwrite").parquet(path)


def write_cellgrid_geoparquet(cells: DataFrame, path: str) -> None:
    """K3 — cell grid with box geometry as WKB parquet (the engine form of
    the optional datacellgrid.shp dump)."""
    from radohydro_spark.geometry.wkb import wkb_box  # noqa: F401 (doc pointer)
    import pandas as pd

    def add_geom(pdf: pd.DataFrame) -> pd.DataFrame:
        from radohydro_spark.geometry.wkb import wkb_box as box

        pdf = pdf.copy()
        pdf["geom"] = [
            box(l, b, r, t)
            for l, b, r, t in zip(pdf["left"], pdf["bottom"], pdf["right"], pdf["top"])
        ]
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in cells.schema.fields)
    out = cells.mapInPandas(
        lambda it: (add_geom(pdf) for pdf in it), schema=schema + ", geom binary"
    )
    out.write.mode("overwrite").parquet(path)


def write_ascii_grid(
    raster: DataFrame,
    path: str,
    xllcorner: float,
    yllcorner: float,
    cellsize: float,
    value_col: str = "burn",
    nodata: float = -9999.0,
) -> None:
    """K4 — render a (cell_row, cell_col, value) DataFrame to an ESRI
    ASCII grid file (the GTiff writer's format-portable sibling; fill value
    matches the reference's rasterize fill, geotools/geotools.py:367).

    Collects the clip-window raster to the driver: correct by construction
    because rasters here are clip-window-sized (bbox of the basins), not
    corpus-sized.  Row 0 is the TOP row, matching the decoder in
    sources/ascii_grid.py.
    """
    rows = raster.select(
        "cell_row", "cell_col", F.col(value_col).cast("double").alias("v")
    ).collect()
    if not rows:
        raise ValueError("empty raster")
    n_rows = max(r["cell_row"] for r in rows) + 1
    n_cols = max(r["cell_col"] for r in rows) + 1
    grid = [[nodata] * n_cols for _ in range(n_rows)]
    for r in rows:
        if r["v"] is not None:
            grid[r["cell_row"]][r["cell_col"]] = r["v"]
    with open(path, "w") as f:
        f.write(f"ncols {n_cols}\n")
        f.write(f"nrows {n_rows}\n")
        f.write(f"xllcorner {xllcorner}\n")
        f.write(f"yllcorner {yllcorner}\n")
        f.write(f"cellsize {cellsize}\n")
        f.write(f"NODATA_value {nodata}\n")
        for row in grid:
            f.write(" ".join(f"{v:g}" for v in row) + "\n")


def write_geotiff(
    raster: DataFrame,
    path: str,
    ulx: float,
    uly: float,
    xres: float,
    yres: float,
    value_col: str = "burn",
    nodata: float = -9999.0,
    dtype: str = "float32",
    compress: bool = True,
) -> None:
    """K4 — render a (cell_row, cell_col, value) DataFrame to a GeoTIFF
    file (the reference's rasterio GTiff sink, geotools/geotools.py:369-381,
    via the dependency-free codec in sources/geotiff.py).

    Same collect-to-driver contract as ``write_ascii_grid``: rasters here
    are clip-window-sized, never corpus-sized.  Row 0 is the TOP row.
    """
    import numpy as np

    from radohydro_spark.sources.geotiff import encode_geotiff

    rows = raster.select(
        "cell_row", "cell_col", F.col(value_col).cast("double").alias("v")
    ).collect()
    if not rows:
        raise ValueError("empty raster")
    n_rows = max(r["cell_row"] for r in rows) + 1
    n_cols = max(r["cell_col"] for r in rows) + 1
    grid = np.full((n_rows, n_cols), nodata, dtype=dtype)
    for r in rows:
        if r["v"] is not None:
            grid[r["cell_row"], r["cell_col"]] = r["v"]
    blob = encode_geotiff(
        grid, ulx, uly, xres, yres, nodata=nodata, compress=compress
    )
    with open(path, "wb") as f:
        f.write(blob)
