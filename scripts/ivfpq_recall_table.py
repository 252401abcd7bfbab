"""Recall@5 of IVF-PQ ANN vs exact cosine — the retrieval-quality
evidence behind ``ivf_pq_topk`` (VERDICT r12 task 3): the driver oracle
pins the path's DETERMINISM, this table measures its PQ distortion and
list-pruning loss, across the two levers a deployment actually tunes:

* ``nprobe`` — how many inverted lists are read (recall vs scan
  fraction, the IVF lever);
* ``m`` — PQ subquantizer count (recall vs code bytes: dim·4/m
  compression, the PQ lever);

for both the deterministic first-by-id quantizer twins (what the
SQL-reproducible driver queries use) and Lloyd-trained quantizers
(``ivf_train`` + ``pq_train``, the production build).  Ground truth is
exact ``cosine_topk`` over the raw doubles.

Emits one JSON line; the committed table lives in SOAK.md.

    python scripts/ivfpq_recall_table.py [n_queries]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
K = 5
RERANK = 50  # ADC shortlist size for the exact re-rank measurement
N_CENTROIDS = 16
N_CODES = 16


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from radohydro_spark import get_spark
    from radohydro_spark.operators import similarity as SIM

    spark = get_spark("ivfpq_recall")
    e = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
        .cache()
    )
    n_corpus = e.count()
    queries = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = (
        SIM.cosine_topk(e, queries, k=K).select("query_id", "vec_id").persist()
    )
    n_exact = exact.count()

    out = {
        "metric": "ivfpq_recall_at_5",
        "sf": 0.1,
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "n_centroids": N_CENTROIDS,
        "n_codes": N_CODES,
        "cells": [],
    }
    for label, trained in (("deterministic", False), ("trained", True)):
        centroids = (
            SIM.ivf_train(e, n_centroids=N_CENTROIDS, iterations=5)
            if trained
            else None
        )
        for m in (4, 8, 16):
            books = (
                SIM.pq_train(e, m=m, k=N_CODES, iterations=5)
                if trained
                else None
            )
            for nprobe in (1, 2, 4, 8):
                # ADC-only top-5 (what ivf_pq_topk serves raw) and the
                # production shape: ADC SHORTLIST (top-50) -> exact
                # cosine re-rank -> top-5.  ADC distortion makes raw
                # recall non-monotonic in nprobe (more candidates =
                # more mis-ranked codes); the re-rank isolates the
                # CANDIDATE-GENERATION recall, which is the number that
                # must hold at scale.
                shortlist = SIM.ivf_pq_topk(
                    e,
                    queries,
                    n_centroids=N_CENTROIDS,
                    nprobe=nprobe,
                    m=m,
                    n_codes=N_CODES,
                    k=RERANK,
                    centroids=centroids,
                    books=books,
                ).select("query_id", "vec_id", "rank")
                approx = shortlist.filter(F.col("rank") <= K)
                hits = exact.join(
                    approx.select("query_id", "vec_id"),
                    ["query_id", "vec_id"],
                ).count()

                from pyspark.sql import Window as W

                cand = shortlist.join(e, "vec_id").join(
                    F.broadcast(
                        queries.select(
                            "query_id", F.col("embedding").alias("_qemb")
                        )
                    ),
                    "query_id",
                )
                rw = W.partitionBy("query_id").orderBy(
                    F.desc("_cs"), F.asc("vec_id")
                )
                rr = (
                    cand.withColumn(
                        "_cs",
                        F.round(
                            SIM.cosine(F.col("embedding"), F.col("_qemb")), 6
                        ),
                    )
                    .withColumn("_rr", F.row_number().over(rw))
                    .filter(F.col("_rr") <= K)
                )
                rr_hits = exact.join(
                    rr.select("query_id", "vec_id"), ["query_id", "vec_id"]
                ).count()
                out["cells"].append(
                    {
                        "quantizers": label,
                        "m": m,
                        "code_bytes": m,
                        "nprobe": nprobe,
                        "scan_fraction": round(nprobe / N_CENTROIDS, 4),
                        "recall_at_5": round(hits / n_exact, 4),
                        "rerank50_recall_at_5": round(rr_hits / n_exact, 4),
                    }
                )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
