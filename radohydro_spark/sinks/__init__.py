from radohydro_spark.sinks.sinks import (
    write_ascii_grid,
    write_geotiff,
    write_basin_csvs,
    write_cellgrid_geoparquet,
    write_wide_geoparquet,
)

__all__ = [
    "write_ascii_grid",
    "write_geotiff",
    "write_basin_csvs",
    "write_cellgrid_geoparquet",
    "write_wide_geoparquet",
]
