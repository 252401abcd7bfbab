"""Explicit StructType schemas for every engine table (FIXTURES.md).

The reference fixes schemas by convention (all-digit column names mark data
columns, reference geotools/geotools.py:242-245; Index_row/Index_column
presence checked by try/except, geotools/geotools.py:164-167).  Here every
shape is a declared StructType; the digit-column hack disappears because data
stays long (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# D1 — long-format observation table.  Replaces the reference's dense
# rows x cols x time stack (reference radohydro.py:242-256).  value is in
# 0.1 mm integer units (reference radohydro.py:150,213); NULL = nodata
# (sentinel replacement per reference radohydro.py:448).
OBS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("cell_row", T.IntegerType(), False),
        T.StructField("cell_col", T.IntegerType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# D3 — grid-cell footprint dimension (reference geotools/geotools.py:134-147).
CELLS_SCHEMA = T.StructType(
    [
        T.StructField("cell_row", T.IntegerType(), False),
        T.StructField("cell_col", T.IntegerType(), False),
        T.StructField("left", T.DoubleType(), False),
        T.StructField("bottom", T.DoubleType(), False),
        T.StructField("right", T.DoubleType(), False),
        T.StructField("top", T.DoubleType(), False),
    ]
)

# D4 — basin polygons with surrogate key (reference geotools/geotools.py:213)
# and WKB geometry.
BASINS_SCHEMA = T.StructType(
    [
        T.StructField("basin_id", T.IntegerType(), False),
        T.StructField("geom", T.BinaryType(), False),
    ]
)

# D5 — intersection fragments: one row per (cell x basin) overlap
# (reference geotools/geotools.py:215-219) with exact intersection area.
FRAGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("basin_id", T.IntegerType(), False),
        T.StructField("cell_row", T.IntegerType(), False),
        T.StructField("cell_col", T.IntegerType(), False),
        T.StructField("frag_area", T.DoubleType(), False),
        T.StructField("cell_area", T.DoubleType(), False),
    ]
)

# D7 — per-basin time series result (reference geotools/geotools.py:275-281),
# long format; pivot only at sinks.
RESULT_SCHEMA = T.StructType(
    [
        T.StructField("basin_id", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("rainfall_mm", T.DoubleType(), True),
    ]
)

# S1-S5 — file manifest for remote/mirrored raster archives (FIXTURES.md §3.3).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("fname", T.StringType(), False),
        T.StructField("dt", T.DateType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)
