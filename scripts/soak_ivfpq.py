"""IVF-PQ serving soak: the persisted composite index at replicated
vector volume (r12 second wave).

Replicates the sf0.1 embeddings (2,000 × 64-d) by ``replicas`` with a
deterministic per-replica rotation of the id space and a small
per-replica component nudge (keeps vectors distinct so lists stay
balanced), builds the PERSISTED IVF-PQ index (codes parquet partitioned
by centroid_id, 32 lists), then measures the two levers the layout
exists for, against the exact brute-force baseline on the same corpus:

* PRUNING — bytes READ by the probe (stage-API inputBytes delta) vs the
  exact scan: nprobe/n_lists of the code bytes, not the raw corpus;
* COMPRESSION — the code column is m=8 bytes/vector vs 64 float64s.

Also reports recall@5 of IVF-PQ vs the exact cosine top-5 (approximate
by design — deterministic first-by-id quantizers, the driver-verified
configuration; production uses the trained quantizers, same plan).

    python scripts/soak_ivfpq.py [replicas ...]   # default 50 250
"""

from __future__ import annotations

import json
import sys
import tempfile
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
    tot = {"input_mb": 0.0, "shuffle_mb": 0.0}
    for s in stages:
        tot["input_mb"] += s.get("inputBytes", 0) / 1e6
        tot["shuffle_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
    return tot


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [50, 250]
    from radohydro_spark import get_spark
    from radohydro_spark.operators.similarity import (
        build_ivfpq_index,
        cosine_topk,
        query_ivfpq_index,
    )

    spark = get_spark(
        "soak_ivfpq",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"},
    )
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for R in reps:
        r = spark.range(0, R).select(F.col("id").alias("rep"))
        corpus = (
            base.crossJoin(r)
            .select(
                (F.col("vec_id") * R + F.col("rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + (F.col("rep") % 17).cast("double") * 1e-4 * (i + 1),
                ).alias("embedding"),
                )
            .repartition(64)
        )
        # persist the REPLICATED corpus as parquet so both paths read
        # comparable bytes from storage
        cdir = tempfile.mkdtemp(prefix="ivfpq_corpus_") + "/corpus"
        corpus.write.parquet(cdir)
        corpus = spark.read.parquet(cdir)
        n = corpus.count()

        idx = tempfile.mkdtemp(prefix="ivfpq_soak_") + "/index"
        t0 = time.perf_counter()
        build_ivfpq_index(corpus, idx, n_centroids=32, m=8, n_codes=16)
        t_build = time.perf_counter() - t0

        before = _stage_totals(spark)
        t0 = time.perf_counter()
        approx = {
            (r["query_id"], r["vec_id"])
            for r in query_ivfpq_index(spark, idx, queries, nprobe=4, k=5).collect()
        }
        t_probe = time.perf_counter() - t0
        mid = _stage_totals(spark)

        t0 = time.perf_counter()
        exact_rows = cosine_topk(corpus, queries, k=5).collect()
        t_exact = time.perf_counter() - t0
        after = _stage_totals(spark)

        exact = {(r["query_id"], r["vec_id"]) for r in exact_rows}
        # recall vs the exact ids (vec_id remap makes exact ids replica-
        # specific; count overlap of (query, vec) pairs)
        recall = len(approx & exact) / len(exact)

        import os

        def _du(d):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(d)
                for f in fs
            ) / 1e6

        probed_mb = mid["input_mb"] - before["input_mb"]
        print(
            f"R={R:4d} vectors={n:>9,} build {t_build:6.1f}s | "
            f"corpus {_du(cdir):7.1f}MB codes {_du(idx + '/codes'):6.1f}MB "
            f"probe-read {probed_mb:5.2f}MB | "
            f"probe {t_probe:5.1f}s exact {t_exact:5.1f}s | "
            f"recall@5 {recall:.2f}"
        )


if __name__ == "__main__":
    main()
