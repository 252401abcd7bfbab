"""Range (point-in-interval) join — bucketized to an equi-join.

``SELECT ... FROM points p JOIN intervals i ON p.x >= i.lo AND p.x < i.hi``
has no equi-key, so Spark falls back to BroadcastNestedLoopJoin — O(|P|·|I|)
work that is fine for tiny interval sets and catastrophic past that.

The scale form buckets the domain: each interval explodes into the buckets
it overlaps (intervals are usually short relative to the domain, so this
fan-out is small), points map to one bucket, and the join becomes an
equi-join on the bucket id with the exact range predicate re-applied as a
residual filter.  Work is O(|P| + |I|·avg_buckets + matches) with an
ordinary hash-shuffle profile.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi``, via bucket-equi-join.

    ``bucket_width`` should be on the order of the typical interval length:
    too small explodes the interval fan-out, too large degrades residual
    selectivity.  Broadcast kicks in automatically when the exploded
    interval side is small.
    """
    pb = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(float(bucket_width))).cast("long")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(float(bucket_width))).cast("long"),
                F.floor(
                    (F.col(hi_col) - F.lit(1e-12)) / F.lit(float(bucket_width))
                ).cast("long"),
            )
        ),
    )
    joined = pb.join(ib, "_bucket", how).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str] = ("l_lo", "l_hi"),
    right_cols: tuple[str, str] = ("r_lo", "r_hi"),
    bucket_width: float = 1.0,
) -> DataFrame:
    """Interval × interval OVERLAP join (r6): pair every left interval
    with every right interval satisfying ``l_lo < r_hi AND r_lo < l_hi``
    (half-open overlap) — scheduling conflicts, downtime attribution,
    campaign windows over session spans.

    Same scale discipline as :func:`range_join`: both sides explode into
    the buckets they cover, the join is a bucket equi-join with the exact
    overlap predicate as residual, and pairs spanning several shared
    buckets dedupe on the natural key of both intervals' bounds.  Work is
    O(Σ bucket fan-out + matches) with an ordinary hash-shuffle profile —
    no BroadcastNestedLoopJoin, no cartesian.
    """
    llo, lhi = left_cols
    rlo, rhi = right_cols

    def explode_buckets(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(float(bucket_width))).cast("long"),
                    F.floor(
                        (F.col(hi) - F.lit(1e-12)) / F.lit(float(bucket_width))
                    ).cast("long"),
                )
            ),
        )

    lb = explode_buckets(left, llo, lhi)
    rb = explode_buckets(right, rlo, rhi)
    joined = lb.join(rb, "_bucket").filter(
        (F.col(llo) < F.col(rhi)) & (F.col(rlo) < F.col(lhi))
    )
    return joined.drop("_bucket").dropDuplicates(
        [c for c in joined.columns if c != "_bucket"]
    )
