"""Cogrouped two-sided kernels: ``groupBy().cogroup().applyInPandas``.

The last of Spark's Pandas-API shapes (pandas_udf, mapInPandas,
applyInPandas, applyInPandasWithState being the others): both sides
shuffle ONCE on the key, then an Arrow kernel sees each key's two
partitions TOGETHER — the escape hatch for per-key merge logic that a
relational join would contort (custom alignment, per-key model scoring,
windowed pairing with bespoke rules).

``cogroup_pair_counts`` is the harness instance: per-key counts of
cross-side row pairs within a time gap.  The SEMANTICS are deliberately
relational (a band join + aggregate — so the DuckDB oracle is exact and
integer-valued); what the driver check pins is the cogroup plumbing:
key alignment, one-sided groups (a key with rows on only one side must
still surface), empty-frame handling, Arrow batch shapes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cogroup_pair_counts(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap_s: float = 86400.0,
) -> DataFrame:
    """Per-key (n_left, n_right, n_pairs) where a pair is a (left row,
    right row) of the same key with |t_l - t_r| <= max_gap_s.

    One shuffle per side on the key; the kernel does an O(n log n)
    sort + two-pointer sliding count per group (NOT the O(n*m)
    broadcasted difference matrix — per-key row counts at 100 TB can
    reach millions).  Keys present on only one side emit zero pairs.
    """
    l = left.select(
        F.col(left_key).alias("key"), F.col(left_ts).cast("double").alias("t")
    )
    r = right.select(
        F.col(right_key).alias("key"), F.col(right_ts).cast("double").alias("t")
    )

    def count_pairs(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf):
            key = lpdf["key"].iloc[0]
        elif len(rpdf):
            key = rpdf["key"].iloc[0]
        else:  # pragma: no cover — Spark never emits an empty cogroup
            return pd.DataFrame(
                {"key": [], "n_left": [], "n_right": [], "n_pairs": []}
            )
        lt = np.sort(lpdf["t"].to_numpy(dtype=np.float64))
        rt = np.sort(rpdf["t"].to_numpy(dtype=np.float64))
        # for each left t, count right rows in [t - gap, t + gap]
        lo = np.searchsorted(rt, lt - max_gap_s, side="left")
        hi = np.searchsorted(rt, lt + max_gap_s, side="right")
        return pd.DataFrame(
            {
                "key": [key],
                "n_left": [len(lt)],
                "n_right": [len(rt)],
                "n_pairs": [int((hi - lo).sum())],
            }
        )

    return (
        l.groupBy("key")
        .cogroup(r.groupBy("key"))
        .applyInPandas(
            count_pairs, schema="key long, n_left long, n_right long, n_pairs long"
        )
    )
