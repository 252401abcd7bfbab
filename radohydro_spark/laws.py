"""Shared cross-module exact-law helpers.

The per-million share idiom (``10⁶·count div total`` as one terminal
floored BIGINT division under a named in-plan 9e12 assert) appears in
several families — grouped heavy hitters (operators/sketch.py), the
Benford digit screen and snapshot schema diff (operators/profile.py),
the streaming top-k slice (streaming/streams.py).  One definition here
so the bound, the message shape, and the division law cannot drift
between copies (the r12 gram_array finding: four drifted copies of a
shared law, one carrying a crash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM_TOTAL_BOUND = 9_000_000_000_000  # 10^6 · total must stay exact BIGINT


def with_share_ppm(
    df: DataFrame,
    cnt_col: str,
    total_col: str,
    op_name: str,
    out_col: str = "share_ppm",
) -> DataFrame:
    """Append ``out_col = (10⁶·cnt_col) div total_col`` as the family's
    exact floored BIGINT division under the named in-plan 9e12 assert.

    NULL or non-positive totals yield a NULL share (never a division
    error — ANSI mode evaluates hoisted subexpressions eagerly, so the
    zero-total case must divide by NULL, not by 0); totals past the
    bound raise the named assert.  ``cnt_col``/``total_col`` are column
    NAMES (the floored ``div`` needs a resolvable SQL expression).
    """
    ok = F.col(total_col) <= F.lit(PPM_TOTAL_BOUND)
    checked = (
        F.when(
            F.col(total_col).isNull() | (F.col(total_col) <= 0),
            F.lit(None).cast("long"),
        )
        .when(ok, F.col(total_col))
        .otherwise(
            F.assert_true(
                ok,
                F.lit(
                    f"{op_name}: total exceeds the exact ppm domain "
                    "(9e12) — pre-aggregate or sample "
                    "(radohydro_spark/laws.py)"
                ),
            ).cast("long")
        )
    )
    return (
        df.withColumn("_ppm_chk", checked)
        .withColumn(
            out_col,
            F.expr(f"(1000000 * {cnt_col}) div _ppm_chk").cast("long"),
        )
        .drop("_ppm_chk")
    )
