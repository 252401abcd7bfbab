"""One-pass column profiling — the data-quality primitive a pipeline runs
before trusting a new 100 TB drop.

``profile_columns`` computes per-column null count, exact distinct count,
and min/max in ONE aggregation job: all measures for all columns are
expressions of the same ``df.agg(...)`` (single scan, map-side partial
aggregation), then the 1×(4·n) result row unpivots to a long
``(column, n_rows, n_nulls, n_distinct, min_value, max_value)`` table via
an array-of-structs inline — no per-column jobs, no driver loop over
columns launching n scans (the anti-pattern this operator exists to
replace).

Distinct counts are exact (``count(distinct col)`` — Spark expands to
expand+two-phase agg) so the DuckDB oracle matches bit-for-bit; at
trillion-row scale swap in ``approx_count_distinct`` (HLL, one pass, ~2%
error) — the ``exact=False`` flag does exactly that and drops the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"))
        aggs.append(
            (
                F.countDistinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"_dist_{c}")
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.inline(entries))
