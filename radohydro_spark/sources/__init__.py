from radohydro_spark.sources.synthetic import (
    GRID,
    synthetic_basins,
    synthetic_cells,
    synthetic_obs,
)

__all__ = ["GRID", "synthetic_basins", "synthetic_cells", "synthetic_obs"]
