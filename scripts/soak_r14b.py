"""r14 second-batch soak: TVD drift, Bloom, KMV, Poisson bootstrap at
replicated volume.

All four claim DIMENSION-bounded shuffles (category domain / 128 words /
k=256 hashes / B replicate rows per task), so data growth should move
scan+hash time linearly but leave shuffle bytes essentially flat:

    python scripts/soak_r14b.py [replicas ...]   # default 10 100
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
    from radohydro_spark.operators.aggregate import (
        ewma_halving,
        poisson_bootstrap_ci,
    )
    from radohydro_spark.operators.profile import (
        gini_coefficient,
        tvd_drift,
        wasserstein_drift,
    )
    from radohydro_spark.operators.sketch import (
        bloom_membership,
        bloom_table,
        kmv_overlap,
        kmv_sketch,
    )
    from radohydro_spark.plans.pipeline import release_persisted

    spark = get_spark(
        "soak_r14b",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"},
    )
    base = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate", "o_totalprice"
    )
    results = {}
    for reps in replica_counts:
        r = spark.range(0, reps).select(F.col("id").alias("rep"))
        fact = (
            base.crossJoin(r)
            .select(
                (F.col("o_orderkey") * reps + F.col("rep")).alias("ok"),
                # replica-shifted custkey keeps the key domain growing
                # with volume (the realistic regime for Bloom/KMV)
                (F.col("o_custkey") * reps + F.col("rep")).alias("ck"),
                "o_orderpriority",
                "o_orderdate",
                F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
            )
            .repartition(64)
            .persist()
        )
        n = fact.count()
        row = {"n_rows": n}
        old = fact.filter(F.year("o_orderdate") <= 1994)
        new = fact.filter(F.year("o_orderdate") >= 1995)
        # materialize the probe set OUTSIDE the timings: its distinct is
        # soak-harness cost (it scales with the key domain), not Bloom's
        probes = (
            fact.select(F.col("ck").alias("key")).distinct().limit(20000).persist()
        )
        probes.count()

        def run_bloom():
            sk = bloom_table(fact, "ck", num_bits=1 << 20, num_hashes=4)
            return bloom_membership(
                sk, probes, "key", num_bits=1 << 20, num_hashes=4
            ).agg(F.sum("bloom_hit")).collect()

        def run_kmv():
            sa = kmv_sketch(old, "ck", k=256)
            sb = kmv_sketch(new, "ck", k=256)
            return kmv_overlap(sa, sb, k=256).collect()

        for name, fn in [
            ("tvd_drift", lambda: tvd_drift(old, new, "o_orderpriority").collect()),
            ("bloom", run_bloom),
            ("kmv", run_kmv),
            (
                "bootstrap",
                lambda: poisson_bootstrap_ci(
                    fact, "price_c", ["ok"], n_replicates=100
                ).collect(),
            ),
            (
                "bootstrap_fast",
                lambda: poisson_bootstrap_ci(
                    fact, "price_c", ["ok"], n_replicates=100,
                    portable=False,
                ).collect(),
            ),
            # third batch: W1 on the same snapshot split (the cumulative
            # machinery + boundary stitch at a replica-grown value
            # domain), Gini over the grown key domain, 12-lag EWMA over
            # per-(priority, day) daily sums
            # the pre-quantize knobs below are the operators' documented
            # contracts in action: at 100x replicas raw cents trip the
            # named n1*n2*range / 2nT / |x| bounds, coarser units fit
            (
                "wasserstein",
                lambda: wasserstein_drift(
                    old.select(
                        F.expr("price_c div 1000").alias("price_m")
                    ),
                    new.select(
                        F.expr("price_c div 1000").alias("price_m")
                    ),
                    "price_m",
                ).collect(),
            ),
            (
                "gini",
                lambda: gini_coefficient(
                    fact.groupBy("ck").agg(
                        # tens of dollars: at 100x replicas n=1.5M keys
                        # and dollar totals trip the named 2nT < 2^63
                        # contract (measured) — the documented
                        # pre-quantize knob
                        F.expr("sum(price_c) div 10000").alias("rev_td")
                    ),
                    "rev_td",
                ).collect(),
            ),
            (
                "ewma",
                lambda: ewma_halving(
                    fact.groupBy(
                        "o_orderpriority",
                        F.to_date("o_orderdate").alias("day"),
                    ).agg(F.expr("sum(price_c) div 100").alias("revenue_d")),
                    ["o_orderpriority"],
                    "day",
                    "revenue_d",
                    lags=12,
                ).agg(F.count("*"), F.sum("ewma_micro")).collect(),
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
        probes.unpersist()
        fact.unpersist()
        results[str(reps)] = row
    print(json.dumps({"base": "sf0.1 orders", "sweep": results}))


if __name__ == "__main__":
    main()
