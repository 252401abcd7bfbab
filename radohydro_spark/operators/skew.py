"""Skew-aware join strategies — the shuffle patterns that keep a 100 TB job
alive when key frequencies are Zipfian.

Spark's AQE (``spark.sql.adaptive.skewJoin``) splits oversized *partitions*
at runtime, which fixes most sort-merge-join skew transparently.  These
operators cover what AQE cannot:

* ``salted_join`` — both sides too big to broadcast AND the hot key's rows
  must meet each other (AQE can split a partition, but every row of hot key
  k on the left still meets every row of k on the right in ONE task if the
  right side isn't replicated).  Salting shards the left side's hot rows
  across ``n_salt`` sub-keys and replicates the right side once per salt,
  so the hot key's work spreads over ``n_salt`` tasks by construction.
* ``skew_split_join`` — the hot/cold split: rows with hot keys join via
  broadcast (no shuffle at all for the heavy keys), the long tail takes the
  normal shuffle join; union of the two plans.  Best when a handful of keys
  dominate and the right side's hot-key slice is tiny.

Both return results row-identical to the plain equi-join (verified in
tests/test_skew.py); they change only the physical distribution of work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Equi-join with the left side salted into ``n_salt`` shards per key.

    Left rows get a deterministic salt from a hash of the whole row
    (``xxhash64(*)`` — deterministic for resume/retry, uniform across
    duplicate key values, no RNG in the plan); the right side is replicated
    ``n_salt`` times via ``explode(sequence(...))``.  Shuffle keys become
    ``keys + [salt]``, so a key with f rows lands in ``min(f, n_salt)``
    tasks instead of one.

    Cost: right side shuffles ``n_salt×`` its size — use for big-left ×
    medium-right where the left's key histogram is the problem.  Supported
    ``how``: inner / left (semantics preserved because every left row keeps
    exactly its one salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l = left.withColumn("_salt", salt.cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l.join(r, keys + ["_salt"], how).drop("_salt")


def hot_keys(
    df: DataFrame, keys: list[str], min_count: int = 100_000
) -> DataFrame:
    """Keys whose row count exceeds ``min_count`` — one map-side-combinable
    aggregation pass; the output is by construction small enough to
    broadcast (≤ |df| / min_count rows)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > min_count)
        .drop("_cnt")
    )


def skew_split_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    hot: DataFrame | None = None,
    how: str = "inner",
    min_count: int = 100_000,
) -> DataFrame:
    """Hot/cold split join: hot-key rows join against a broadcast of the
    right side's hot slice; the tail joins normally; results union.

    ``hot`` optionally supplies the hot-key table (skip the counting pass
    when the producer already knows its skew — e.g. a stop-shingle list);
    default detects via ``hot_keys(left, keys, min_count)``.

    Plan shape: the hot branch is Exchange-free on the left (broadcast hash
    join), the cold branch shuffles WITHOUT the hot keys — its partitions
    are bounded by ``min_count``, which is the whole point."""
    if how not in ("inner", "left"):
        raise ValueError(f"skew_split_join supports inner/left, got {how}")
    if hot is None:
        hot = hot_keys(left, keys, min_count)
    hot = F.broadcast(hot.select(*keys).distinct())
    left_hot = left.join(hot, keys, "left_semi")
    left_cold = left.join(hot, keys, "left_anti")
    right_hot = right.join(hot, keys, "left_semi")
    joined_hot = left_hot.join(F.broadcast(right_hot), keys, how)
    joined_cold = left_cold.join(right, keys, how)
    return joined_hot.unionByName(joined_cold)
