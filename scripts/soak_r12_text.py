"""Volume soak for the r12 text-side second wave: DSIR importance
weights and multi-round BPE training at replicated corpus volume.

Corpus: sf0.1 documents replicated ``R``× with per-replica token
remapping (the soak_winnow scheme — vocabulary grows with R, the
adversarial case for vocabulary-keyed work; a real corpus's vocabulary
grows sublinearly).

* DSIR — target = the 'de' slice of the base table; measures wall +
  shuffle and asserts the lr dimension table stays exactly n_buckets
  rows at ANY corpus size (the broadcast contract).
* BPE — 6 merge rounds; measures the one-off vocabulary aggregation
  against the per-round cost (rounds run on the vocabulary, so they
  are corpus-size-independent for fixed vocabulary; here vocabulary
  scales with R by construction — the honest worst case).

    python scripts/soak_r12_text.py [replicas ...]   # default 20 200
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
    tot = {"shuffle_mb": 0.0, "spill_disk_mb": 0.0}
    for s in stages:
        tot["shuffle_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
        tot["spill_disk_mb"] += s.get("diskBytesSpilled", 0) / 1e6
    return tot


def _corpus(spark, reps: int):
    from radohydro_spark.functions.text import tokens

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    r = spark.range(0, reps).select(F.col("id").alias("rep"))
    remapped = F.array_join(
        F.transform(
            tokens("text"),
            lambda t: F.concat(t, F.lit("_"), F.col("rep").cast("string")),
        ),
        " ",
    )
    return (
        base.crossJoin(r)
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            remapped.alias("text"),
            "lang",
        )
        .repartition(64)
        .persist()
    )


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [20, 200]
    from radohydro_spark import get_spark
    from radohydro_spark.functions.text import bpe_train_merges
    from radohydro_spark.operators.sampling import dsir_importance_weights

    spark = get_spark(
        "soak_r12_text",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"},
    )
    target = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .filter(F.col("lang") == "de")
        .select("doc_id", "text")
    )
    for R in reps:
        corpus = _corpus(spark, R)
        n = corpus.count()

        before = _stage_totals(spark)
        t0 = time.perf_counter()
        w = dsir_importance_weights(corpus, target, k=2, n_buckets=4096)
        n_w = w.count()
        t_dsir = time.perf_counter() - t0
        mid = _stage_totals(spark)

        t0 = time.perf_counter()
        merges = bpe_train_merges(corpus, "text", 6).collect()
        t_bpe = time.perf_counter() - t0
        after = _stage_totals(spark)

        print(
            f"R={R:4d} docs={n:>9,} | dsir {t_dsir:6.1f}s "
            f"shuffle {mid['shuffle_mb'] - before['shuffle_mb']:7.1f}MB "
            f"weights={n_w:,} | bpe(6 rounds) {t_bpe:6.1f}s "
            f"shuffle {after['shuffle_mb'] - mid['shuffle_mb']:7.1f}MB "
            f"spill {after['spill_disk_mb'] - before['spill_disk_mb']:.0f}MB "
            f"merges={len(merges)}"
        )
        corpus.unpersist()


if __name__ == "__main__":
    main()
