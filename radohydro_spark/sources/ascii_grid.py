"""ESRI ASCII-grid decoder (S6) — raster archive member → long obs rows.

Spark-first replacement for the reference's rasterio ``MemoryFile`` decode
(reference radohydro.py:211-222, :307-321): a ``mapInPandas`` one-to-many
kernel over a manifest DataFrame of ``(fname, payload)`` rows.  The
six-line header (ncols/nrows/xllcorner/yllcorner/cellsize/NODATA_value) is
parsed in Python; the body is vectorized NumPy.  Nodata becomes NULL at
ingest (F5; reference sentinel capture radohydro.py:217, replacement
radohydro.py:448) — magic numbers never propagate.

Grid convention: ASCII grids are north-up; raster row 0 is the TOP row.
``cell_row`` keeps raster order (row 0 = top), matching the reference's
array orientation; the cell-grid generator mirrors this with negative yres.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radohydro_spark.functions.temporal import filename_to_ts
from radohydro_spark.schemas import OBS_SCHEMA

HEADER_KEYS = ("ncols", "nrows", "xllcorner", "yllcorner", "cellsize", "nodata_value")


def parse_ascii_grid(payload: bytes) -> tuple[dict, np.ndarray]:
    """Parse one ESRI ASCII grid: (header dict, 2-D float array with NaN
    nodata)."""
    text = payload.decode("ascii", errors="replace")
    lines = text.splitlines()
    header: dict[str, float] = {}
    body_start = 0
    for i, line in enumerate(lines):
        parts = line.split()
        if len(parts) == 2 and parts[0].lower() in HEADER_KEYS:
            header[parts[0].lower()] = float(parts[1])
            body_start = i + 1
        else:
            break
    ncols = int(header["ncols"])
    nrows = int(header["nrows"])
    body = " ".join(lines[body_start:])
    data = np.array(body.split(), dtype="float64").reshape(nrows, ncols)
    nodata = header.get("nodata_value")
    if nodata is not None:
        data = np.where(data == nodata, np.nan, data)
    return header, data


def grid_meta(payload: bytes) -> dict:
    """Driver-side metadata probe of one sample member — the engine form of
    the reference's first-iteration transform capture (radohydro.py:216-222).

    Returns ulx/uly/xres/yres/n_rows/n_cols with row 0 at the top
    (yres < 0), GDAL GeoTransform convention.
    """
    header, data = parse_ascii_grid(payload)
    cell = header["cellsize"]
    return {
        "n_rows": int(header["nrows"]),
        "n_cols": int(header["ncols"]),
        "ulx": header["xllcorner"],
        "uly": header["yllcorner"] + header["nrows"] * cell,
        "xres": cell,
        "yres": -cell,
    }


def _decode_partition(
    it: Iterator[pd.DataFrame], date_type: str, permissive: bool = False
) -> Iterator[pd.DataFrame]:
    for pdf in it:
        for fname, payload in zip(pdf["fname"], pdf["payload"]):
            try:
                _, data = parse_ascii_grid(bytes(payload))
            except (KeyError, ValueError) as exc:
                if permissive:
                    # corrupt member: skip instead of failing the task (the
                    # engine form of the reference's warn-and-continue
                    # prints, radohydro.py:141-142)
                    import sys

                    print(f"skipping undecodable member {fname}: {exc}", file=sys.stderr)
                    continue
                raise ValueError(f"undecodable ASCII grid member {fname}: {exc}") from exc
            nrows, ncols = data.shape
            flat = data.ravel()
            yield pd.DataFrame(
                {
                    "fname": fname,
                    "cell_row": np.repeat(
                        np.arange(nrows, dtype="int32"), ncols
                    ),
                    "cell_col": np.tile(np.arange(ncols, dtype="int32"), nrows),
                    "value": flat,
                }
            )


def decode_ascii_grids(
    manifest: DataFrame, date_type: str = "hours", permissive: bool = False
) -> DataFrame:
    """manifest(fname, payload) → obs(ts, cell_row, cell_col, value).

    One-to-many decode; the timestamp comes from the member filename (F8).
    NaN → NULL happens in the Arrow transfer (NaN in a float column maps to
    null after the explicit cast below).  ``permissive=True`` skips
    undecodable members instead of failing the job — at archive scale a
    handful of corrupt tar members must not kill a backfill.
    """
    decoded = manifest.select("fname", "payload").mapInPandas(
        lambda it: _decode_partition(it, date_type, permissive),
        schema="fname string, cell_row int, cell_col int, value double",
    )
    return decoded.select(
        filename_to_ts("fname", date_type).alias("ts"),
        "cell_row",
        "cell_col",
        F.when(F.isnan("value"), F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
