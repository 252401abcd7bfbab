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

Bucket bounds are computed exactly — ``hi_bucket = ceil(hi/w) - 1`` gives
half-open semantics (an interval ending exactly on a bucket boundary does
not occupy the next bucket) with no epsilon, which a float epsilon could
not (``hi - 1e-12 == hi`` at epoch-second magnitudes).  Zero/negative
spans clamp to a single bucket (``greatest``) so ``F.sequence`` never
descends.  Whether such degenerate intervals then MATCH is decided by
each join's residual predicate, and the two joins differ:
:func:`range_join`'s ``lo <= x < hi`` can never hold for ``lo >= hi``,
so empty intervals match nothing; :func:`interval_overlap_join` applies
the literal ANSI overlap predicate ``l_lo < r_hi AND r_lo < l_hi``,
under which a zero-width interval sitting strictly inside a nonempty
one DOES pair (the predicate is equivalent to "nonempty intersection"
only when both intervals are nonempty) — kept as-is because it is the
same answer every SQL engine gives for the same WHERE clause, so the
DuckDB oracle agrees; pre-filter ``lo < hi`` upstream if strict
nonempty-intersection semantics are wanted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lo_bucket(col: str, w: float) -> Column:
    return F.floor(F.col(col) / F.lit(float(w))).cast("long")


def _hi_bucket_halfopen(col: str, w: float) -> Column:
    """Last bucket a half-open ``[lo, hi)`` interval touches: ceil(hi/w)-1."""
    return (F.ceil(F.col(col) / F.lit(float(w))) - F.lit(1)).cast("long")


def _bucket_span(lo: str, hi: str, w: float) -> Column:
    lo_b = _lo_bucket(lo, w)
    hi_b = _hi_bucket_halfopen(hi, w)
    # clamp: a zero-length interval would make sequence() descend and emit
    # spurious buckets; pin it to its lo bucket and let the caller's exact
    # residual predicate decide whether it matches
    return F.sequence(lo_b, F.greatest(lo_b, hi_b))


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
    pb = points.withColumn("_bucket", _lo_bucket(point_col, bucket_width))
    ib = intervals.withColumn(
        "_bucket", F.explode(_bucket_span(lo_col, hi_col, bucket_width))
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
    the buckets they cover and the join is a bucket equi-join with the
    exact overlap predicate as residual.  A pair sharing several buckets
    is emitted ONCE by keeping only its canonical bucket — the bucket of
    the overlap start ``greatest(l_lo, r_lo)``, which both explosions are
    guaranteed to cover.  This preserves input row multiplicity (r6 used
    ``dropDuplicates`` over all columns, which silently collapsed
    legitimately duplicated input rows) and costs a filter instead of a
    dedup shuffle.  Work is O(Σ bucket fan-out + matches) — no
    BroadcastNestedLoopJoin, no cartesian.

    Degenerate (zero-width) intervals are NOT rejected: the literal
    predicate pairs ``[5,5)`` with ``[4,6)`` even though their
    intersection is empty — see the module docstring for why this is
    the standard-SQL answer and how to opt out.
    """
    llo, lhi = left_cols
    rlo, rhi = right_cols
    w = float(bucket_width)

    lb = left.withColumn("_bucket", F.explode(_bucket_span(llo, lhi, w)))
    rb = right.withColumn("_bucket", F.explode(_bucket_span(rlo, rhi, w)))
    joined = lb.join(rb, "_bucket").filter(
        (F.col(llo) < F.col(rhi))
        & (F.col(rlo) < F.col(lhi))
        # canonical-bucket guard: emit the pair only in the overlap-start
        # bucket (inside both intervals whenever the residual holds)
        & (
            F.col("_bucket")
            == F.floor(F.greatest(F.col(llo), F.col(rlo)) / F.lit(w)).cast("long")
        )
    )
    return joined.drop("_bucket")


def coalesce_intervals(
    df: DataFrame,
    key_cols: list[str],
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Merge overlapping/adjacent intervals per key into maximal islands —
    the gaps-and-islands closure of the range-join family: presence
    intervals into sessions, raster validity windows into coverage spans,
    document revision ranges into lineages.

    Relational single-pass form (no iteration, no UDF): order each key's
    intervals by (lo, hi); a row STARTS a new island iff the running
    maximum of ``hi`` over all preceding rows is < its ``lo``
    (half-open semantics: an interval starting exactly at the previous
    max end is ADJACENT and merges); the running SUM of start flags
    numbers the islands; one aggregation emits each island's span.

    Ties in ``lo`` are order-insensitive by construction: among tied
    rows only the first evaluates against the pre-tie running max, and
    whichever row that is produces the same flag, so island boundaries —
    and therefore the aggregated output — are deterministic without a
    unique ordering key.

    Scale shape: ONE shuffle on the key (both windows share the
    partitionBy; Catalyst plans a single Exchange with two per-partition
    sorts), then a hash aggregation on (key, island).  Row volume is the
    interval count — never a fan-out.

    Returns ``key_cols + (island_lo, island_hi, n_intervals)``.
    """
    from pyspark.sql import Window as W

    w_prev = (
        W.partitionBy(*key_cols)
        .orderBy(lo, hi)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy(*key_cols)
        .orderBy(lo, hi)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = df.withColumn(
        "_new",
        F.when(F.max(hi).over(w_prev) >= F.col(lo), F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("_island", F.sum("_new").over(w_run))
    return flagged.groupBy(*key_cols, "_island").agg(
        F.min(lo).alias("island_lo"),
        F.max(hi).alias("island_hi"),
        F.count("*").alias("n_intervals"),
    ).drop("_island")
