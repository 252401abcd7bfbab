"""End-to-end pipeline composition — the Spark lifecycle equivalent of
``radohydro(...)`` (reference radohydro.py:503-546, SURVEY.md §3.1).

One lazy DataFrame DAG:

    obs ──────────────┐ (fact, arbitrarily large)
    cells ─ bbox ─ J1 ─ fragments ─ A5 NULL policy ─ A3 weights ─┐
                                                                  ├ broadcast join
    obs ──────────────────────────────────────────────────────────┘
                               │
                 groupBy(basin_id, ts) weighted agg (A4)   ← the only shuffle
                               │
                          result (long)

The reference's explicit IR hand-offs (dense stack → wide GDF → fragment GDF
→ ndarray) become logical-plan nodes; ``del stack`` (radohydro.py:531)
becomes lazy evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radohydro_spark.operators.aggregate import weighted_basin_timeseries
from radohydro_spark.operators.spatial import spatial_intersect, window_predicate
from radohydro_spark.operators.weights import apply_nan_policy, basin_weights


def precip_timeseries(
    obs: DataFrame,
    cells: DataFrame,
    basins: DataFrame,
    clip_window: tuple[int, int, int, int] | None = None,
    remove_nan: bool = False,
    numerator: float = 10.0,
    round_decimals: int | None = 3,
) -> DataFrame:
    """Area-weighted mean precipitation per basin per timestep.

    The product of ``compute_polyg_values`` (reference
    geotools/geotools.py:224-334) as one declarative plan.  ``clip_window``
    applies the buffered bbox predicate (F3) to both cells and obs so the
    scan prunes before any join.  ``round_decimals=3`` matches the
    reference's sink rounding (geotools/geotools.py:315-317); pass None to
    keep full precision.
    """
    if clip_window is not None:
        pred = window_predicate(clip_window)
        cells = cells.filter(pred)
        obs = obs.filter(pred)

    fragments = spatial_intersect(cells, basins)
    fragments = apply_nan_policy(fragments, obs, remove_nan=remove_nan)
    weighted = basin_weights(fragments)
    result = weighted_basin_timeseries(obs, weighted, numerator=numerator)
    if round_decimals is not None:
        result = result.withColumn(
            "rainfall_mm", F.round("rainfall_mm", round_decimals)
        )
    return result
