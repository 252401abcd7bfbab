"""File-level data skipping: min/max manifest over a clustered write.

The lakehouse zone-map primitive (Delta/Iceberg file statistics, Snowflake
micro-partition pruning) in minimal form: cluster the table on a column at
write time, derive a per-file (min, max) manifest from the written files,
and answer range predicates by reading ONLY the files whose interval
intersects the predicate.

Scale shape: at 100 TB the manifest is file-count-sized (thousands of
rows for multi-GB files) — a driver-resident dimension table, same class
as a partition listing.  The payoff is the scan: a selective range
predicate touches O(matching files), not O(table).  Spark's parquet
reader already does row-group min/max skipping INSIDE a file; this adds
the file-level layer on top, which works because ``repartitionByRange``
makes files range-disjoint on the cluster column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame, path: str, cluster_col: str, n_files: int = 8
) -> None:
    """Range-cluster ``df`` on ``cluster_col`` into ``n_files`` files —
    the write-side half of data skipping.  ``repartitionByRange`` samples
    range boundaries so files are value-disjoint; the within-file sort
    additionally tightens parquet row-group stats."""
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_manifest(spark: SparkSession, path: str, col: str) -> list[tuple]:
    """Per-file (file, min, max) statistics — one narrow aggregate over
    the dataset, grouped by ``input_file_name``.  Returns a driver-side
    list (file-count-sized by construction)."""
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    return [(r["file"], r["lo"], r["hi"]) for r in rows]


def read_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    manifest: list[tuple] | None = None,
) -> tuple[DataFrame, int, int]:
    """Range-predicate read through the manifest: load only files whose
    [min, max] intersects [lo, hi], re-apply the predicate for row-level
    exactness.  Returns ``(df, n_files_read, n_files_total)`` so callers
    can assert the skip actually happened."""
    manifest = manifest if manifest is not None else file_manifest(spark, path, col)
    keep = [f for f, mn, mx in manifest if mx >= lo and mn <= hi]
    if not keep:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty, 0, len(manifest)
    df = spark.read.parquet(*keep).filter(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )
    return df, len(keep), len(manifest)
