"""User-behavior analytics: ordered funnels and retention cohorts.

The two workhorse event-stream rollups every product-analytics /
training-telemetry pipeline runs.  Both are pure DataFrame compositions —
no UDFs — and both keep every join on the user key so consecutive stages
reuse the same hash partitioning (one co-partitioned join chain, not a
fresh shuffle per step).

Reference scope note: the reference engine (radohydro.py) has no event
surface; these belong to the LLM-pipeline extension set (e.g. funnel =
how far raw documents survive a curation pipeline per source, retention =
contributor activity cohorts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: step i counts users with some event of
    ``steps[i]`` STRICTLY AFTER their earliest qualifying completion of
    steps[0..i-1] (the standard "first-touch" funnel; re-orderings like
    purchase-before-view do not count).

    Returns ``(step_idx, step_name, n_users)`` with one row per step —
    n_users is non-increasing by construction.

    Shape: one filtered min-aggregate per step, each joined to the
    previous step's per-user timestamp on the user key.  The previous
    step's frame is an already-aggregated (user, ts) relation — at most
    one row per funnel-surviving user — so Catalyst broadcasts it into
    each step's join (observed plan: BroadcastHashJoin per step, the
    only exchanges are the per-step aggregations); past broadcast size
    (billions of users) the same plan degrades to joins co-partitioned
    on the user key.  The events scan is pruned to (user, ts, type) and
    the per-step type filters push to the scan.  Output is |steps| rows
    — the final union is dimension-sized.
    """
    assert len(steps) >= 1
    e = events.select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("t"), F.col(type_col).alias("y")
    )
    # earliest completion timestamp of the prefix ending at each step
    reached = (
        e.filter(F.col("y") == steps[0]).groupBy("u").agg(F.min("t").alias("t"))
    )
    counts = [reached]
    for s in steps[1:]:
        nxt = (
            e.filter(F.col("y") == s)
            .join(reached.select("u", F.col("t").alias("_prev")), "u")
            .filter(F.col("t") > F.col("_prev"))
            .groupBy("u")
            .agg(F.min("t").alias("t"))
        )
        counts.append(nxt)
        reached = nxt
    out = None
    for i, (name, frame) in enumerate(zip(steps, counts)):
        row = frame.agg(
            F.lit(i).alias("step_idx"),
            F.lit(name).alias("step_name"),
            F.count("*").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "week",
) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by the period of
    their FIRST event (the cohort), counted once per later period they
    were active in.

    Returns ``(cohort_period, periods_later, n_users)`` — n_users =
    distinct users of that cohort active ``periods_later`` buckets after
    their first one (0 = the cohort period itself, so row 0 is the cohort
    size).  ``bucket`` is any ``date_trunc`` unit ('week', 'month', ...);
    ``periods_later`` is an exact integer day-difference quotient, not a
    float date subtraction.

    Shape: one min-aggregate by user, one join back on the user key
    (co-partitioned with the aggregate's output), one distinct + count
    rollup on (cohort, offset) — map-side combinable, result is
    dimension-sized (cohorts x horizon).
    """
    e = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc(bucket, F.col(ts_col)).cast("date").alias("p"),
    )
    first = e.groupBy("u").agg(F.min("p").alias("cohort_period"))
    joined = e.join(first, "u")
    if bucket == "week":
        offset = (F.datediff(F.col("p"), F.col("cohort_period")) / 7).cast("long")
    elif bucket == "month":
        offset = (
            (F.year("p") - F.year("cohort_period")) * 12
            + (F.month("p") - F.month("cohort_period"))
        ).cast("long")
    else:
        offset = F.datediff(F.col("p"), F.col("cohort_period")).cast("long")
    return (
        joined.select("u", "cohort_period", offset.alias("periods_later"))
        .distinct()
        .groupBy("cohort_period", "periods_later")
        .agg(F.count("*").alias("n_users"))
    )
