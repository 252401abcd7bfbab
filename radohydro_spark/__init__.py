"""radohydro_spark — a PySpark-native geospatial ETL / analytics engine.

From-scratch reimplementation of the capabilities of ErikNixdorf/radohydro
(reference at /root/reference, read-only) on idiomatic Spark: DataFrame API,
Catalyst optimization, Arrow-vectorized pandas UDFs for the few kernels Spark
lacks.  Everything stays long-format and lazy; wide shapes appear only at
sinks (this removes the reference's dense-in-RAM ceiling, its 500-timestep
shapefile limit and its 10k-polygon overlay cliff — see SURVEY.md §6).

Public surface mirrors the reference's composable geotools functions
(reference geotools/geotools.py:2-4) as DataFrame -> DataFrame stages, plus
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).
"""

from radohydro_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
