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


def check_constraints(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    row_rules: dict[str, "F.Column"] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Declarative data-quality gate: evaluate constraint rules and emit a
    ``(rule, n_violations)`` report — the contract check a pipeline runs
    before promoting a new data drop.

    * ``not_null`` columns and ``row_rules`` (name → boolean Column that
      flags a VIOLATION) fold into ONE conditional-sum aggregation — a
      single scan regardless of rule count.
    * each ``unique`` key set is a groupBy counting keys seen more than
      once (violations = extra rows beyond the first per key).
    * each ``foreign_keys`` (col, ref_df, ref_col) is a left-anti join
      against the (broadcastable, dimension-sized) reference keys.

    Every rule is map-side combinable; the report is rule-count rows.
    """
    spark_rules: list[tuple[str, "F.Column"]] = []
    for c in not_null or []:
        spark_rules.append((f"not_null:{c}", F.col(c).isNull()))
    for name, cond in (row_rules or {}).items():
        spark_rules.append((f"rule:{name}", cond))

    parts: list[DataFrame] = []
    if spark_rules:
        aggs = [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
            for name, cond in spark_rules
        ]
        wide = df.agg(*aggs)
        pairs = F.array(
            *[
                F.struct(F.lit(name).alias("rule"), F.col(name).alias("n_violations"))
                for name, _ in spark_rules
            ]
        )
        parts.append(wide.select(F.inline(pairs)))
    for keys in unique or []:
        parts.append(
            df.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .agg(
                F.lit("unique:" + ",".join(keys)).alias("rule"),
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).cast("long").alias(
                    "n_violations"
                ),
            )
        )
    for col, ref, ref_col in foreign_keys or []:
        missing = df.select(F.col(col)).filter(F.col(col).isNotNull()).join(
            F.broadcast(ref.select(F.col(ref_col).alias(col)).distinct()),
            col,
            "left_anti",
        )
        parts.append(
            missing.agg(
                F.lit(f"fk:{col}").alias("rule"),
                F.count("*").cast("long").alias("n_violations"),
            )
        )
    if not parts:
        raise ValueError(
            "check_constraints called with no rules: pass at least one of "
            "not_null / unique / row_rules / foreign_keys"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
