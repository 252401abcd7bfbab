from radohydro_spark.sources.synthetic import (
    GRID,
    synthetic_basins,
    synthetic_cells,
    synthetic_obs,
)
from radohydro_spark.sources.shapefile import basins_from_shapefile

__all__ = [
    "GRID",
    "basins_from_shapefile",
    "synthetic_basins",
    "synthetic_cells",
    "synthetic_obs",
]
