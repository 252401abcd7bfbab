"""Market-basket co-occurrence: pair support + lift, shuffle-bounded.

The association-mining primitive (a-priori's first level): for every
unordered item pair {a, b}, how many baskets contain both, and how does
that compare to independence — ``lift = N · c_ab / (c_a · c_b)``.

Scale shape: pair candidates come from a SELF EQUI-JOIN on the basket id
with ``item_a < item_b`` — one ordinary hash shuffle keyed by basket,
never a global cross product.  Fan-out per basket is C(n,2), so a
``max_basket_size`` guard drops pathological baskets loudly-by-default
(count reported via ``include_dropped``-style contract in the caller)
the same way the n-gram dedup caps hot shingles: at 100 TB a single
million-item basket would otherwise emit 5·10^11 pairs.  Per-item counts
are dimension-sized and broadcast back; the final top-k is
``orderBy().limit()`` (TakeOrderedAndProject), never a driver sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pair_lift(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int = 1000,
    lift_decimals: int = 6,
) -> DataFrame:
    """Per-pair support and lift over (basket, item) rows.

    Duplicate (basket, item) rows collapse first (a basket either
    contains an item or not).  Returns
    ``item_a, item_b, pair_count, count_a, count_b, lift`` with lift
    rounded to ``lift_decimals`` — N·c_ab is exact integer arithmetic and
    the single division of identical integers is deterministic
    cross-engine, so results hash-compare exactly.
    """
    items = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    sized = items.withColumn(
        "_sz", F.count("*").over(Window.partitionBy("_b"))
    )
    kept = sized.filter(F.col("_sz") <= max_basket_size).drop("_sz")

    a = kept.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = kept.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_count"))
    )
    item_counts = kept.groupBy("_i").agg(F.count("*").alias("item_count"))
    n_baskets = kept.select("_b").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    return (
        pairs.join(
            F.broadcast(item_counts.select(F.col("_i").alias("item_a"),
                                           F.col("item_count").alias("count_a"))),
            "item_a",
        )
        .join(
            F.broadcast(item_counts.select(F.col("_i").alias("item_b"),
                                           F.col("item_count").alias("count_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.round(
                (F.col("n_baskets") * F.col("pair_count"))
                / (F.col("count_a") * F.col("count_b")),
                lift_decimals,
            ).alias("lift"),
        )
    )
