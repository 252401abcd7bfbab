"""Soak: mmr_select past the literal-plan budget (r15, VERDICT r14 #4).

The literal redundancy form embeds k*dim integers per round and was
capped at k*dim <= 250k (r14); production selections (k=1000 x dim=768)
need the broadcast array form.  This drives one selection ABOVE the
budget end-to-end (auto-routed to the broadcast form) and one just
below it (literal form) on the same corpus, recording wall and
per-round cost.  Row-identity of the two forms is property-tested in
tests/test_round15_ops.py; this leg pins USABILITY at scale.

Run:  python scripts/soak_mmr_broadcast.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from radohydro_spark import get_spark
from radohydro_spark.operators.sampling import mmr_select

N, DIM = 2_000, 5_100
K_ABOVE = 50   # 50*5100 = 255k > 250k -> broadcast form
# The literal reference leg stays FAR below the budget: a first cut at
# k=48 (just under it) ground for >18 min in Catalyst analysis — the
# O(k^2*dim) literal-tree cost the budget exists to wall off, measured
# at its own edge.  k=10 prices the per-round literal plan in its
# comfortable regime instead.
K_BELOW = 10   # 10*5100 = 51k <= 250k -> literal form


def main() -> None:
    spark = get_spark("soak_mmr_broadcast")
    # deterministic pseudo-random corpus: vec[i][j] = hash-mixed ints
    ids = spark.range(N).select(F.col("id").alias("vid"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("vid"), j), F.lit(1000)).cast("double")
            - 500.0
        )
        / 37.0,
    )
    df = ids.select("vid", vec.alias("emb")).cache()
    df.count()

    for label, k in (("literal_below_budget", K_BELOW),
                     ("broadcast_above_budget", K_ABOVE)):
        t0 = time.perf_counter()
        out = mmr_select(df, "emb", "vid", query_id=0, k=k)
        n = out.count()
        wall = time.perf_counter() - t0
        print(
            f"{label}: k={k} dim={DIM} corpus={N} k*dim={k * DIM} "
            f"rows={n} wall={wall:.1f}s per_round={wall / k:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
