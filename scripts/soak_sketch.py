"""Sketch-family soak: heavy_hitters + exact_quantiles at replicated volume.

Both r10 operators claim the two-pass candidate/verify shape keeps their
shuffles DIMENSION-sized (Misra-Gries summaries / stride samples), so
data growth should move scan time but barely move shuffle bytes.  This
soak replicates sf0.1 lineitem ``replicas``-fold (same derived skewed
key as the stats_heavy_hitters driver query: 40% of rows on 4 hot keys)
and runs both operators with executor-truth shuffle/spill deltas:

    python scripts/soak_sketch.py [replicas ...]   # default 10 100
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _stage_totals(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    tot = {"shuffle_mb": 0.0, "spill_mem_mb": 0.0, "spill_disk_mb": 0.0}
    for s in stages:
        tot["shuffle_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
        tot["spill_mem_mb"] += s.get("memoryBytesSpilled", 0) / 1e6
        tot["spill_disk_mb"] += s.get("diskBytesSpilled", 0) / 1e6
    return tot


def main() -> None:
    replica_counts = [int(a) for a in sys.argv[1:]] or [10, 100]
    from radohydro_spark import get_spark
    from radohydro_spark.operators.sketch import exact_quantiles, heavy_hitters
    from radohydro_spark.plans.pipeline import release_persisted

    spark = get_spark(
        "soak_sketch",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"},
    )
    base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    results = {}
    for reps in replica_counts:
        r = spark.range(0, reps).select(F.col("id").alias("rep"))
        fact = (
            base.crossJoin(r)
            .select(
                # replica-shifted orderkey keeps the 40%-on-4-hot-keys
                # skew shape of the driver query at every volume
                (F.col("l_orderkey") * reps + F.col("rep")).alias("ok"),
                "l_extendedprice",
            )
            .select(
                F.when(F.col("ok") % 10 < 4, F.col("ok") % 4)
                .otherwise(F.col("ok"))
                .alias("k"),
                "l_extendedprice",
            )
            .repartition(64)
            .persist()
        )
        n = fact.count()
        row = {"n_rows": n}
        for name, fn in [
            ("heavy_hitters", lambda: heavy_hitters(fact, "k", 50).collect()),
            (
                "exact_quantiles",
                lambda: exact_quantiles(
                    fact, "l_extendedprice", [(1, 2), (99, 100)], sample_stride=1000
                ).collect(),
            ),
        ]:
            before = _stage_totals(spark)
            t0 = time.time()
            out = fn()
            wall = time.time() - t0
            after = _stage_totals(spark)
            row[name] = {
                "wall_s": round(wall, 1),
                "rows_out": len(out),
                **{k: round(after[k] - before[k], 1) for k in after},
            }
            release_persisted()
            print(reps, name, row[name], flush=True)
        fact.unpersist()
        results[str(reps)] = row
    print(json.dumps({"base": "sf0.1 lineitem", "sweep": results}))


if __name__ == "__main__":
    main()
