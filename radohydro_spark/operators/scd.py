"""Slowly-changing-dimension (SCD type 2) history from a change stream.

The snapshot-maintenance primitive a large-scale pipeline needs next to
dedup: given an event stream carrying the *current* value of some tracked
attributes per key, collapse consecutive runs of equal values into
versioned validity intervals:

    (key, version, attrs, valid_from, valid_to, n_events)

``valid_to`` is NULL for the current (open) version.  Pure window + hash
aggregate — no UDF, and at scale the whole computation is one shuffle on
the key (all three windows and the final groupBy share the
``partitionBy(key)`` clustering, so Catalyst reuses a single Exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def scd2_from_changes(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build SCD-2 history rows from change events.

    A new version starts whenever any attribute differs from the previous
    event's value for the same key (NULL-safe comparison).  Events ordered
    by (ts, tiebreaks) — pass a unique id in ``tiebreak_cols`` to pin runs
    deterministically under equal timestamps.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = W.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    prev = F.lag(attrs).over(w)
    # eqNullSafe: a NULL attribute run is still one version, and the first
    # event of a key (prev IS NULL overall) always opens version 1
    is_new = F.when(prev.isNull() | ~prev.eqNullSafe(attrs), 1).otherwise(0)
    versioned = df.withColumn(
        "version",
        F.sum(is_new).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("int"),
    )
    hist = versioned.groupBy(*key_cols, "version").agg(
        *[F.first(c).alias(c) for c in attr_cols],
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = W.partitionBy(*key_cols).orderBy(F.col("version").asc())
    return hist.withColumn("valid_to", F.lead("valid_from").over(wv)).select(
        *key_cols, "version", *attr_cols, "valid_from", "valid_to", "n_events"
    )


def current_snapshot(history: DataFrame, key_cols: list[str]) -> DataFrame:
    """The open (valid_to IS NULL) version per key — the SCD-2 read path."""
    return history.filter(F.col("valid_to").isNull()).drop("valid_to")
