from radohydro_spark.sinks.sinks import (
    write_ascii_grid,
    write_geotiff,
    write_basin_csvs,
    write_cellgrid_geoparquet,
    write_wide_geoparquet,
)
from radohydro_spark.sinks.shapefile_writer import (
    write_shapefile,
    write_wide_shapefile,
)

__all__ = [
    "write_ascii_grid",
    "write_geotiff",
    "write_basin_csvs",
    "write_cellgrid_geoparquet",
    "write_wide_geoparquet",
    "write_shapefile",
    "write_wide_shapefile",
]
