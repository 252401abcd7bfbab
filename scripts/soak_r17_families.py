"""Consolidated family soak (r17, VERDICT r16 #5): steady-state numbers
at 20M-row volumes for the headline families whose sf0.1 wall is < 1 s —
small-SF wall for those queries rides inside tenancy spread bands, so
accept/reject calls need a volume where the signal exceeds the noise.

Method: replicate the sf0.1 parquet tables ``replicas``-fold into a
temp directory with the soak_sf1.py deterministic id-remap scheme
(events: user_id*R+rep — per-user sequences preserved, cardinality
grows; lineitem/orders: orderkey*R+rep — basket/order structure
preserved; documents: doc_id*R+rep with a replica salt token except
every 37th — exact+near dup pressure preserved), then run the DECLARED
query functions unchanged against that directory.  No query-specific
harness code, so the numbers price exactly the shipped plans.

    python scripts/soak_r17_families.py [replicas] [reps] [q1,q2,...]

Defaults: 200 replicas of events (20M rows) / 33 of lineitem+orders
(~20M/ ~5M) / 40 of documents (200k docs), 2 reps, the sub-1s headline
set.  Embedding-family queries are excluded: their self-join cost is
quadratic in replicas by design (the ANN index paths are soaked by
soak_ivfpq.py instead).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/sfsoak_r17"

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
QUERIES = (
    sys.argv[3].split(",")
    if len(sys.argv) > 3
    else [
        "tpch_q1_pricing",
        "tpch_q3_top_orders",
        "tpch_q5_regional_revenue",
        "window_running_total",
        "events_sessionize",
        "events_asof_nearest",
        "events_concurrency_sweep",
        "text_stats",
        "text_vocab_growth",
        "dedup_paragraphs",
        "media_byte_histogram",
        "dq_ks_drift",
        "dq_auc_returns",
        "dq_psi_drift_by",
        "stats_heavy_hitters",
        "sketch_kmv_overlap",
    ]
    # excluded by design: stats_bootstrap_ci (the 101-replicate md5 fan is
    # ~2B hashes at 20M rows — already soaked by soak_r14b.py and A/B'd at
    # sf0.1 in the r17 fan-parallelism fix); events_stream_* (the
    # streaming reader's pathGlobFilter matches single FILES named
    # events.parquet, not replicated directories — the streaming family
    # is soaked by soak_stream_sketches.py); embedding similarity
    # self-joins (quadratic in replicas by design, soaked by
    # soak_ivfpq.py).
)


def build_tables(spark) -> None:
    ev_r = REPLICAS
    li_r = max(1, REPLICAS // 6)
    doc_r = max(1, REPLICAS // 5)
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    rep = lambda n: spark.range(0, n).select(F.col("id").alias("rep"))

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    (
        ev.crossJoin(rep(ev_r))
        .select(
            (F.col("event_id") * ev_r + F.col("rep")).alias("event_id"),
            (F.col("user_id") * ev_r + F.col("rep")).alias("user_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        )
        .repartition(32)
        .write.parquet(f"{OUT}/events.parquet")
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        li.crossJoin(rep(li_r))
        .select(
            (F.col("l_orderkey") * li_r + F.col("rep")).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(32)
        .write.parquet(f"{OUT}/lineitem.parquet")
    )
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        od.crossJoin(rep(li_r))
        .select(
            (F.col("o_orderkey") * li_r + F.col("rep")).alias("o_orderkey"),
            *[c for c in od.columns if c != "o_orderkey"],
        )
        .repartition(32)
        .write.parquet(f"{OUT}/orders.parquet")
    )

    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (
        doc.crossJoin(rep(doc_r))
        .select(
            (F.col("doc_id") * doc_r + F.col("rep")).alias("doc_id"),
            F.when(F.col("doc_id") % 37 == 0, F.col("text"))
            .otherwise(
                F.concat(F.lit("u"), F.col("rep").cast("string"), F.lit(" "), F.col("text"))
            )
            .alias("text"),
            *[c for c in doc.columns if c not in ("doc_id", "text")],
        )
        .repartition(32)
        .write.parquet(f"{OUT}/documents.parquet")
    )

    # dimension tables copied verbatim (joins fan out via the fact side)
    for t in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.parquet(
            f"{OUT}/{t}.parquet"
        )


def main() -> None:
    import __spark_entry__ as entrymod
    from radohydro_spark import get_spark
    from radohydro_spark.plans.pipeline import release_persisted

    spark = get_spark("soak_r17_families")
    t0 = time.perf_counter()
    build_tables(spark)
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)
    for t in ("events", "lineitem", "documents"):
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"  {t}: {n} rows", flush=True)

    qs = entrymod.queries()
    results = {}
    for name in QUERIES:
        runs = []
        try:
            for r in range(REPS + 1):  # +1 warmup
                spark.sparkContext.setJobDescription(f"soak {name} rep{r}")
                t0 = time.perf_counter()
                qs[name](spark, OUT).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                release_persisted()
                if r > 0:
                    runs.append(dt)
                print(f"  {name} rep{r}: {dt:.3f}s", flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            release_persisted()
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
        results[name] = {"steady_s": round(min(runs), 3)}
    print(json.dumps({"replicas": REPLICAS, "results": results}))


if __name__ == "__main__":
    main()
