"""As-of (most-recent-prior) join — a custom operator Spark lacks natively.

The naive formulation is an inequality theta-join (`l.ts >= r.ts`, pick
the max r.ts), which Spark executes as a broadcast nested loop or a
sort-merge over an exploded range — both blow up at scale.  This
implementation uses the union+window form instead:

    tag right rows side=0, left rows side=1
    unionByName → one shuffle on the join keys
    last(right_payload, ignoreNulls) OVER (PARTITION BY keys
        ORDER BY ts, side ROWS UNBOUNDED PRECEDING)
    keep side=1 rows

One hash-partition shuffle + one sort — the same cost profile as a
groupBy, linear in |L|+|R|, no quadratic candidate expansion.  Ordering
(ts, side) puts a right row at ts == t before left rows at t, giving
inclusive `l.ts >= r.ts` semantics (DuckDB ASOF JOIN's default), and ties
inside the right stream resolve to its last row in (ts, tiebreak) order.

The tag-and-union scaffolding (payload struct, the two tagged selects
with null-cast ``_l_*`` mirrors, the final side=1 projection) is ONE
definition (`_tag_union` / `_project`) shared by the backward, forward
and nearest joins — three drifting copies were the r16 review finding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """The shared union-tagged frame: right rows (``_side = 0``) carry
    the payload struct ``_rpay = (ts as _rts, <right_cols>)`` and NULL
    ``_l_*`` mirrors; left rows (``_side = 1``) carry their originals
    as ``_l_*`` and a NULL payload.  ``_tb`` orders equal-timestamp
    right rows (constant 0 when no tiebreak is given)."""
    payload = F.struct(
        F.col(ts_col).alias("_rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    order_tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        order_tb.alias("_tb"),
        payload.alias("_rpay"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
        ],
    )
    l = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(0).alias("_tb"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    return l.unionByName(r)


def _project(
    merged: DataFrame,
    left: DataFrame,
    right_cols: list[str],
    ts_col: str,
    suffix: str,
    match: Column,
) -> DataFrame:
    """The shared side=1 output projection: left originals back under
    their names, the matched timestamp as ``<ts_col><suffix>``, each
    payload column as ``<name><suffix>``.  ``_m`` materializes BEFORE
    the side filter — a window expression passed as ``match`` must see
    both sides of the union."""
    return merged.withColumn("_m", match).filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.col("_m._rts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.ts <= left.ts`` within the same key group (NULLs when no prior
    right row exists).

    ``right_cols`` are the right-side payload columns to carry (default:
    everything except keys and ts); each arrives as ``<name><suffix>``,
    plus ``<ts_col><suffix>`` for the matched timestamp.  ``tiebreak``
    optionally orders equal-timestamp right rows (last one wins).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [ts_col]]
    merged = _tag_union(left, right, keys, ts_col, right_cols, tiebreak)
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    match = F.last("_rpay", ignorenulls=True).over(w)
    return _project(merged, left, right_cols, ts_col, suffix, match)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_next",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Forward as-of: for each left row, attach the EARLIEST right row with
    ``right.ts >= left.ts`` in the same key group — the label-generation
    primitive ("first conversion after this event"), with an optional
    inclusive ``tolerance_s`` horizon beyond which the match nulls out.

    Same union+window cost profile as :func:`asof_join` (one key shuffle +
    one sort, linear in |L|+|R|): the scan simply runs time-DESCENDING, so
    the carried last-non-null right payload is the nearest FOLLOWING row.
    A right row at exactly ``left.ts`` matches (inclusive), mirroring the
    backward join's DuckDB-ASOF-compatible boundary.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [ts_col]]
    merged = _tag_union(left, right, keys, ts_col, right_cols)
    # descending time scan; right rows (side 0) sort before left rows at an
    # equal timestamp so the inclusive boundary holds
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).desc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = merged.withColumn(
        "_match", F.last("_rpay", ignorenulls=True).over(w)
    )
    match = F.col("_match")
    if tolerance_s is not None:
        within = (
            F.col("_match._rts").cast("double") - F.col(ts_col).cast("double")
        ) <= F.lit(float(tolerance_s))
        match = F.when(within, F.col("_match"))
    return _project(merged, left, right_cols, ts_col, suffix, match)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_s: float | None = None,
) -> DataFrame:
    """NEAREST as-of: for each left row, attach the right row whose
    timestamp is CLOSEST in either direction within the same key group
    — the sensor/price alignment shape (pandas ``merge_asof
    direction='nearest'``) that neither the backward nor the forward
    join alone gives.

    Deterministic pick law (EXACT integer microseconds — no float
    time arithmetic anywhere): with ``db = l.ts − prior.ts`` and
    ``df = next.ts − l.ts`` (both ≥ 0, from ``unix_micros``), a side
    is VALID when it matched and, given ``tolerance_s``, its delta is
    ≤ ``round(tolerance_s·10⁶)`` µs (inclusive); the nearest pick is
    the prior side when it is valid and (the next side is invalid OR
    ``db <= df``) — TIES GO BACKWARD — else the next side when valid,
    else NULL.  Both boundaries are inclusive (a right row at exactly
    ``l.ts`` has db = df = 0 and wins as the prior).

    NULL-timestamp law (r16 review): right rows with a NULL timestamp
    are EXCLUDED up front (a NULL ts sorts NULLS FIRST/LAST and would
    otherwise leak in as a bogus carry), and a left row with a NULL
    timestamp gets a NULL match — total, never order-dependent.

    Plan shape: ONE union + ONE hash-partition exchange on the keys
    carrying BOTH window scans (the ascending last-prior carry and the
    descending first-next carry sort on the same exchange), then a
    stateless pick projection — the :func:`asof_join` cost profile,
    linear in |L|+|R|, no inequality join, no candidate explosion.
    Equal-timestamp ties inside the right stream resolve to the same
    row on both scans (the last in timestamp order — pre-dedupe the
    right side per (keys, ts) for a total law, as the backward join
    documents).

    Returns left columns + ``<ts_col><suffix>`` + each right payload
    column as ``<name><suffix>`` (NULLs when no side is valid).

    Reference analog: none — extends the join family
    (SURVEY §2 extension table).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [ts_col]]
    merged = _tag_union(
        left, right.filter(F.col(ts_col).isNotNull()), keys, ts_col,
        right_cols,
    )
    wb = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).desc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = merged.withColumn(
        "_prior", F.last("_rpay", ignorenulls=True).over(wb)
    ).withColumn("_next", F.last("_rpay", ignorenulls=True).over(wf))
    pay_type = merged.schema["_rpay"].dataType
    lts = F.unix_micros(F.col(ts_col))
    db = lts - F.unix_micros(F.col("_prior._rts"))
    df_ = F.unix_micros(F.col("_next._rts")) - lts
    lnn = F.col(ts_col).isNotNull()
    valid_b = lnn & F.col("_prior").isNotNull()
    valid_f = lnn & F.col("_next").isNotNull()
    if tolerance_s is not None:
        tol_us = F.lit(int(round(float(tolerance_s) * 1_000_000)))
        valid_b = valid_b & (db <= tol_us)
        valid_f = valid_f & (df_ <= tol_us)
    pick = (
        F.when(valid_b & (~valid_f | (db <= df_)), F.col("_prior"))
        .when(valid_f, F.col("_next"))
        .otherwise(F.lit(None).cast(pay_type))
    )
    return _project(merged, left, right_cols, ts_col, suffix, pick)
