"""Bloom-filter semi-join prefilter — the runtime-filter pattern, explicit.

When the dimension side of a selective join is too big to broadcast as a
hash table but its KEY SET fits a few kilobytes of bitmap, the classic
move (Spark's own runtime row-group filtering, Delta dynamic file
pruning) is: build a Bloom filter over the dim keys, push it to the fact
scan as a cheap pure-column predicate, and let the exact join run on the
survivors.  The fact side's shuffle shrinks by the join selectivity; the
Bloom's false positives only cost wasted shuffle rows, never wrong
results, because the exact join still decides membership.

Everything here is JVM-side column arithmetic — ``xxhash64(key, seed)``
per probe, bit packed into 64-bit words with ``bit_or`` aggregation — no
UDFs, no Scala-only expressions.  The finished bitmap is
dimension-derived and tiny (``n_words`` longs), so collecting it to the
driver and re-embedding it as a literal is the broadcast-a-dim-table
pattern, same class as the PQ codebooks in operators/similarity.py.

Sizing: for target false-positive rate p with n keys, bits m ≈
-n·ln(p)/ln(2)^2 and k ≈ (m/n)·ln(2); the defaults (2048 words = 131072
bits, k=5) hold ~13k keys at ~1% FPR.  Oversize m rather than k — extra
words are free at broadcast scale, extra probes cost per-fact-row work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_build(
    dim: DataFrame, key_col: str, n_words: int = 2048, k: int = 5
) -> list[int]:
    """Aggregate the dim key set into a Bloom bitmap of ``n_words``
    64-bit words (returned dense, index = word position)."""
    m = 64 * n_words
    probes = dim.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    words = (
        probes.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            # F.shiftleft's Python signature wants a literal int shift;
            # call_function resolves the SQL builtin that takes a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()  # n_words rows max — dimension-derived, bitmap-sized
    )
    dense = [0] * n_words
    for r in words:
        dense[r["w"]] = r["word"]
    return dense


def bloom_might_contain(
    key: Column, words: list[int], k: int = 5
) -> Column:
    """Pure-column membership test against a built bitmap: true for every
    present key, occasionally true for an absent one (never false for a
    present one)."""
    m = 64 * len(words)
    arr = F.lit(words)
    cond = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_words: int = 2048,
    k: int = 5,
) -> DataFrame:
    """EXACT left-semi join with a Bloom prefilter on the fact side.

    Result rows are identical to ``fact.join(dim, ..., "left_semi")`` —
    the bitmap only thins the fact stream before the join's shuffle, so
    at cluster scale the exchange moves ~selectivity·|fact| rows instead
    of |fact| (false positives add their FPR on top, bounded by sizing).
    """
    words = bloom_build(dim, dim_key, n_words=n_words, k=k)
    pre = fact.filter(bloom_might_contain(F.col(fact_key), words, k=k))
    return pre.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )
