"""Frequency sketches with exact verification — the two-pass heavy-hitter
pattern that makes "find the hot keys" feasible at 100 TB.

A single ``GROUP BY key`` over a high-cardinality column shuffles every
distinct key; when you only need the keys above a frequency threshold,
that shuffle is almost entirely wasted.  The classical fix (Misra & Gries
1982; Agarwal et al., "Mergeable Summaries", PODS 2012) is:

* **Pass 1 — candidates.**  Stream each partition through a Misra-Gries
  summary of ``k`` counters.  MG keeps every value whose *local* frequency
  share exceeds ``1/(k+1)``; by pigeonhole, a value with *global* share
  ``>= 1/k`` has at least that share in some partition, so the union of
  per-partition survivors is a guaranteed SUPERSET of the true heavy
  hitters — never a miss, only (bounded) false candidates.  The summary
  is dimension-sized: at most ``k`` values per partition.
* **Pass 2 — exact verify.**  Broadcast the candidate set back onto the
  fact table as a semi-join filter and count exactly — the aggregation now
  touches only candidate keys, so its shuffle carries at most
  ``k x n_partitions`` groups instead of every distinct value.

The threshold is integer-exact: a value is heavy iff
``cnt * threshold_inverse >= N`` (phi = 1/threshold_inverse), so the
result is bit-identical on any engine — no float threshold, no rounding
seam (see the repo's cross-engine float discipline).

Reference scope note: the reference engine (radohydro.py) has no
frequency-analysis surface; this operator is part of the LLM-pipeline
extension set (vocabulary pruning, hot-key diagnosis before salted joins —
see operators/skew.py for what to do with the keys it finds).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partitions(col: str, k: int):
    """mapInPandas body: one MG summary per partition.

    Emits (value, n) rows: each surviving candidate with n=0, plus ONE
    null-valued row carrying the partition's row count, so a single pass
    yields both the candidate superset and the exact total N.  NULLs in
    the data column are ignored (they are not a "value"; pandas
    ``value_counts`` drops them, and the count row is distinguishable
    because its value is null by construction).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            s = pdf[col]
            n_rows += len(s)
            vc = s.value_counts(dropna=True)
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                # mergeable-summaries decrement: subtract the (k+1)-th
                # largest count from everything, drop the non-positive.
                # Error added is <= that count, keeping total MG error
                # under n_partition/(k+1) — the superset guarantee.
                delta = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - delta for v, c in counters.items() if c - delta > 0
                }
        out = pd.DataFrame(
            {"value": list(counters.keys()), "n": [0] * len(counters)}
        )
        total = pd.DataFrame({"value": [None], "n": [n_rows]})
        yield pd.concat([out, total], ignore_index=True)

    return fn


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_inverse: int,
    counters: int | None = None,
) -> DataFrame:
    """Exact phi-heavy hitters (phi = 1/threshold_inverse), two passes.

    Returns ``(value, cnt)`` for every value of ``col`` whose exact count
    satisfies ``cnt * threshold_inverse >= N`` (N = non-null row count).
    ``counters`` (default ``threshold_inverse``) is the per-partition
    Misra-Gries budget; it must be >= threshold_inverse for the
    no-false-negative guarantee and only trades candidate-set size for
    memory above that.

    Scale shape: pass 1 is map-only (no shuffle) and its output is
    dimension-sized (<= counters x n_partitions candidate rows), so the
    summary frame is persisted and consumed twice (candidates + N)
    without re-scanning the fact.  Pass 2's aggregation is pre-filtered
    by a broadcast semi-join on the candidates, so its exchange carries
    only candidate groups.  Total: two scans of the fact, one map-side-
    combined shuffle over candidate keys only — vs one scan + a shuffle
    over EVERY distinct key for the naive GROUP BY/HAVING.
    """
    assert threshold_inverse >= 1
    k = counters if counters is not None else threshold_inverse
    assert k >= threshold_inverse, "counters < threshold_inverse loses the superset guarantee"

    vals = df.select(F.col(col).alias("value")).filter(F.col("value").isNotNull())
    vtype = vals.schema["value"].dataType.simpleString()
    summary = vals.mapInPandas(
        _misra_gries_partitions("value", k), schema=f"value {vtype}, n long"
    ).persist()
    from radohydro_spark.plans.pipeline import _PERSISTED

    _PERSISTED.append(summary)

    total = summary.agg(F.sum("n").alias("n_total"))
    cand = summary.filter(F.col("value").isNotNull()).select("value").distinct()
    return (
        vals.join(F.broadcast(cand), "value", "leftsemi")
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(threshold_inverse) >= F.col("n_total"))
        .select("value", "cnt")
    )
