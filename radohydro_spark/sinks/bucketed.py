"""Bucketed observation storage — the repeated-run scale path.

At 100 TB the obs fact table is written once and queried many times (new
basin sets, new date ranges).  Writing it bucketed by the cell key makes
every per-cell operation downstream (dirty-flag aggregation, cell joins)
shuffle-free: the bucketed scan already satisfies the hash-distribution
requirement, so Catalyst drops the Exchange.

This is the engine's substitute for the reference's in-RAM "compute the
clip window once and slice" reuse (radohydro.py:176,216-248) — reuse via
storage layout instead of driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_obs_bucketed(
    obs: DataFrame,
    table: str,
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist obs bucketed+sorted by (cell_row, cell_col).

    Bucket count sizes the downstream parallelism of shuffle-free
    aggregations: pick ~(total size / 128 MB) at the target scale.
    """
    (
        obs.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, "cell_row", "cell_col")
        .sortBy("cell_row", "cell_col")
        .saveAsTable(table)
    )


def read_obs_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_obs_partitioned(obs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist obs hive-partitioned by observation date (``dt=YYYYMMDD/``).

    The storage form of the reference's filename-date pruning (S3,
    radohydro.py:188-189): a date-range query prunes whole directories at
    planning time (PartitionFilters in the scan), so a one-day query over a
    100 TB archive reads one day's files.
    """
    from pyspark.sql import functions as F

    (
        obs.withColumn("dt", F.date_format("ts", "yyyyMMdd"))
        .repartition("dt")
        .write.mode(mode)
        .partitionBy("dt")
        .parquet(path)
    )


def read_obs_partitioned(
    spark: SparkSession, path: str, start: str | None = None, end: str | None = None
) -> DataFrame:
    """Read the partitioned obs archive with partition pruning: the date
    predicate targets the ``dt`` partition column, so Catalyst eliminates
    directories before any I/O."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if start:
        df = df.filter(F.col("dt") >= start.replace("-", "")[:8])
    if end:
        df = df.filter(F.col("dt") <= end.replace("-", "")[:8])
    return df.drop("dt")


def morton_code(row_col: str = "cell_row", col_col: str = "cell_col", bits: int = 16):
    """Z-order (Morton) interleave of two grid indices as a Column — pure
    bit arithmetic, whole-stage-codegen JVM-side (no UDF).

    Interleaving makes 1-D file/row-group order track 2-D locality: any
    bbox window maps to O(perimeter) Morton ranges, so parquet min/max
    stats on the code column prune row groups for spatial windows the same
    way ``dt=`` partitions prune dates.  ``bits`` must cover the grid
    extent (16 bits ≫ RADOLAN's 900)."""
    from pyspark.sql import functions as F

    r = F.col(row_col).cast("long")
    c = F.col(col_col).cast("long")
    code = F.lit(0).cast("long")
    for b in range(bits):
        code = (
            code
            .bitwiseOR(F.shiftleft(r.bitwiseAND(F.lit(1 << b)), b + 1))
            .bitwiseOR(F.shiftleft(c.bitwiseAND(F.lit(1 << b)), b))
        )
    return code


def write_obs_zordered(
    obs: DataFrame,
    path: str,
    files_per_day: int = 8,
    mode: str = "overwrite",
    n_days: int | None = None,
) -> None:
    """Date-partitioned archive with Z-order clustering inside each day.

    ``repartitionByRange`` over (dt, morton) range-partitions the day into
    ``files_per_day`` Morton slabs and ``sortWithinPartitions`` orders rows
    inside each file, so every parquet row group covers a compact spatial
    square — a basin-bbox query then skips most row groups via column
    min/max stats on cell_row/cell_col (which Z-order makes tight), on top
    of the directory-level date pruning."""
    from pyspark.sql import functions as F

    coded = obs.withColumn("dt", F.date_format("ts", "yyyyMMdd")).withColumn(
        "_z", morton_code()
    )
    if n_days is None:
        # day count drives the range-partition count; pass it when known to
        # skip this extra job over the input
        n_days = coded.select("dt").distinct().count()
    (
        coded.repartitionByRange(max(files_per_day * n_days, 1), "dt", "_z")
        .sortWithinPartitions("dt", "_z")
        .drop("_z")
        .write.mode(mode)
        .partitionBy("dt")
        .parquet(path)
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_col: str | None = "dt",
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files — the
    small-files compactor every long-running drop-directory archive needs
    (a streaming sink or per-hour backfill leaves thousands of KB-sized
    files; each adds a task + open() at read time, and at 100 TB the
    metadata alone stalls planning).

    File count = ceil(bytes / target).  The rewrite goes through a temp
    dir then an atomic-ish swap (rename) so readers never see a half
    archive.  Returns the number of files written.  Hive-partitioned
    layouts keep their partition column via ``partitionBy``."""
    import glob
    import os
    import shutil

    data_files = [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        + glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isfile(f)
    ]
    total = sum(os.path.getsize(f) for f in set(data_files))
    n_files = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    writer = df.repartition(int(n_files)).write.mode("overwrite")
    if partition_col and partition_col in df.columns:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return int(n_files)
