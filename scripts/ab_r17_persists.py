"""Interleaved cold A/B of the three r16 operator persists under the r17
bench accounting (VERDICT r16 #2): with release_persisted() firing between
repetitions, every repetition pays the cache FILL cost, so the honest
question is "does persist+fill beat recompute, cold?" per repetition.

Variants run interleaved in ONE session (tenancy-controlled).  The "off"
arm monkeypatches DataFrame.cache/persist to identity for the duration of
the build+run — for the three queries under test the operator persist is
the ONLY persist in the plan (verified by reading the query paths), so
the patch removes exactly the candidate persist and nothing else.

Usage: python scripts/ab_r17_persists.py [sf_dir] [reps] [q1,q2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

# Spark 4: local sessions instantiate the CLASSIC DataFrame subclass,
# which OVERRIDES cache/persist — patching pyspark.sql.DataFrame (the
# base) silently does nothing (found the hard way in this round's
# bootstrap A/B: both arms ran the patched-on plan)
from pyspark.sql.classic.dataframe import DataFrame

from radohydro_spark import get_spark
from radohydro_spark.plans.pipeline import release_persisted

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

QUERIES = (
    sys.argv[3].split(",")
    if len(sys.argv) > 3
    else [
        "orders_market_basket",
        "text_tfidf_cosine_pairs",
        "sample_dsir_weights",
    ]
)


def main() -> None:
    spark = get_spark("ab_r17_persists")
    qs = entrymod.queries()

    real_cache = DataFrame.cache
    real_persist = DataFrame.persist

    def run_once(name: str, persist_on: bool) -> float:
        fn = qs[name]
        if not persist_on:
            DataFrame.cache = lambda self: self  # type: ignore[assignment]
            DataFrame.persist = lambda self, *a, **k: self  # type: ignore[assignment]
        try:
            spark.sparkContext.setJobDescription(
                f"{name} persist={'on' if persist_on else 'off'}"
            )
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
        finally:
            DataFrame.cache = real_cache  # type: ignore[assignment]
            DataFrame.persist = real_persist  # type: ignore[assignment]
            release_persisted()
            spark.sparkContext.setJobDescription(None)
        return dt

    # codegen warmup: one run of each, both arms
    for name in QUERIES:
        run_once(name, True)
        run_once(name, False)

    results: dict[tuple[str, str], list[float]] = {}
    for rep in range(REPS):
        for name in QUERIES:
            for arm, on in (("on", True), ("off", False)):
                dt = run_once(name, on)
                results.setdefault((name, arm), []).append(dt)
                print(f"rep{rep} {name:28s} {arm:3s}: {dt:.3f}s", flush=True)

    print("\n=== cold minima (every rep pays fill cost) ===")
    for name in QUERIES:
        on = min(results[(name, "on")])
        off = min(results[(name, "off")])
        verdict = "KEEP persist" if on <= off * 1.10 else "REVERT persist"
        print(
            f"{name:28s} persist-on {on:.3f}s  persist-off {off:.3f}s  "
            f"ratio {on / off:.2f}  -> {verdict}"
        )


if __name__ == "__main__":
    main()
