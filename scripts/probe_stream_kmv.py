"""Measure the events_stream_kmv drain's per-batch cost breakdown
(VERDICT r16 #3): run the availableNow drain and print every
StreamingQueryProgress — batch durations (addBatch, getBatch,
walCommit, stateOperators metrics), input rows, state rows — plus the
wall split between stream build, drain, and the post-drain reduction.

Usage: python scripts/probe_stream_kmv.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from radohydro_spark import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    spark = get_spark("probe_stream_kmv")
    import __spark_entry__ as entrymod
    from radohydro_spark.streaming import run_available_now, stream_kmv

    raw_schema = entrymod._probe_schema(spark, SF_DIR, "events")

    for rep in range(REPS):
        t0 = time.perf_counter()
        stream = (
            spark.readStream.format("parquet")
            .schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .load(SF_DIR)
        )
        stream = entrymod._normalize_ts(stream)
        sk = stream_kmv(stream, "ts", "user_id", "1 day", k=64, watermark="1 hour")
        name = "kmv_probe_" + uuid.uuid4().hex[:8]
        t1 = time.perf_counter()
        out = run_available_now(
            sk, name, tempfile.mkdtemp(prefix="ck_"), "update", state_partitions=8
        )
        t2 = time.perf_counter()
        # the declared query's post-drain reduction
        from pyspark.sql import Window as W

        w = W.partitionBy("ts").orderBy("hv")
        red = (
            out.distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 64)
            .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("day"), "hv")
            .orderBy("day", "hv")
        )
        red.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        print(
            f"\nrep{rep}: build {t1 - t0:.3f}s  drain {t2 - t1:.3f}s  "
            f"reduce {t3 - t2:.3f}s  total {t3 - t0:.3f}s"
        )
        for q in spark.streams.active:
            q.stop()
        # progress of the just-finished drain: the query object is gone
        # (run_available_now awaits termination), so fish it from the
        # last query via the manager is not possible — instead re-run
        # once with a handle below.

    # one instrumented drain with full progress JSON
    stream = (
        spark.readStream.format("parquet")
        .schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .load(SF_DIR)
    )
    stream = entrymod._normalize_ts(stream)
    sk = stream_kmv(stream, "ts", "user_id", "1 day", k=64, watermark="1 hour")
    name = "kmv_probe_" + uuid.uuid4().hex[:8]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sk.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        print("\n=== per-batch progress ===")
        for p in q.recentProgress:
            keep = {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "stateOperators": [
                    {
                        k: so.get(k)
                        for k in (
                            "operatorName",
                            "numRowsTotal",
                            "numRowsUpdated",
                            "numRowsRemoved",
                            "commitTimeMs",
                            "stateMemory",
                        )
                    }
                    for so in p.get("stateOperators", [])
                ],
            }
            print(json.dumps(keep))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


if __name__ == "__main__":
    main()
