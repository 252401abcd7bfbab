"""Blocked fuzzy (edit-distance) joining — entity resolution's core move.

An unblocked fuzzy join is a cartesian product with a string kernel in
the middle — O(n·m) distance evaluations, dead at corpus scale.  The
standard fix is BLOCKING: a cheap deterministic key (phonetic code,
prefix, unchanged substring, LSH bucket) that candidate pairs must share,
turning the cross product into an equi-join whose cost tracks block
sizes, not table sizes.  Distances then run only inside blocks, and a
per-left-key argmin picks the best match.

``levenshtein`` is a JVM built-in (and a DuckDB built-in with identical
semantics), so the whole operator is expression-only — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    block_col: str,
    left_key: str,
    right_key: str,
    left_name: str,
    right_name: str,
    max_distance: int = 2,
) -> DataFrame:
    """Best fuzzy match per left row among right rows sharing its block.

    Both inputs must already carry ``block_col`` (derive it with any
    deterministic expression — unchanged substring, soundex, minhash
    band).  Pairs above ``max_distance`` are discarded; ties break on the
    lower ``right_key``.  Left rows with no candidate under the threshold
    are absent from the result (join semantics, not lookup semantics).

    Returns ``(left_key, right_key, distance)``.
    """
    l = left.select(
        F.col(left_key).alias("_lk"),
        F.col(left_name).alias("_ln"),
        F.col(block_col).alias("_blk"),
    )
    r = right.select(
        F.col(right_key).alias("_rk"),
        F.col(right_name).alias("_rn"),
        F.col(block_col).alias("_blk"),
    )
    scored = (
        l.join(r, "_blk")
        .withColumn("_d", F.levenshtein("_ln", "_rn"))
        .filter(F.col("_d") <= max_distance)
    )
    best = scored.groupBy("_lk").agg(
        F.min_by(F.struct("_rk", "_d"), F.struct("_d", "_rk")).alias("_m")
    )
    return best.select(
        F.col("_lk").alias(left_key),
        F.col("_m._rk").alias(right_key),
        F.col("_m._d").alias("distance"),
    )
