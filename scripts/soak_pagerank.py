"""Soak A/B for pagerank edge pre-partitioning (r17, VERDICT r16 #8).

The bench graph is 5 nodes — every per-round join broadcasts the rank
relation and the edge list is never shuffled, so the docstring's promise
("at 100 TB the edge list is pre-partitioned on src once and every round
reuses that layout") has no local evidence.  This soak builds a graph
big enough that the rank relation exceeds the broadcast threshold, so
the per-round contribution join becomes a shuffle join — the regime the
pre-partition exists for — and interleaves the two variants in ONE
session (tenancy-controlled), asserting identical results.

Usage: python scripts/soak_pagerank.py [n_nodes] [edges_per_node] [reps]
Defaults: 2_000_000 nodes x 10 edges = 20M edges, 3 reps each.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from radohydro_spark import get_spark
from radohydro_spark.operators.graph import pagerank

N_NODES = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DEG = int(sys.argv[2]) if len(sys.argv) > 2 else 10
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    spark = get_spark("soak_pagerank")
    sc = spark.sparkContext

    # deterministic multigraph -> distinct() inside pagerank dedupes;
    # dst spread via xxhash so in/out degrees are irregular but fixed
    edges = (
        spark.range(0, N_NODES * DEG, 1, sc.defaultParallelism)
        .select(
            (F.col("id") % N_NODES).alias("src"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    edges.write.mode("overwrite").parquet("/tmp/soak_pr_edges")
    e = spark.read.parquet("/tmp/soak_pr_edges")

    def run(tag: str, prepartition) -> float:
        sc.setJobDescription(f"pagerank soak {tag}")
        t0 = time.perf_counter()
        r = pagerank(e, iterations=5, prepartition=prepartition)
        r.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        return dt

    # warmup (codegen) once with the default path
    run("warmup", None)

    results: dict[str, list[float]] = {"auto": [], "off": [], "on": []}
    for rep in range(REPS):
        for tag, pp in (("off", False), ("on", True), ("auto", None)):
            dt = run(f"{tag} rep{rep}", pp)
            results[tag].append(dt)
            print(f"rep{rep} {tag:4s}: {dt:.3f}s", flush=True)

    # equivalence: identical ranks row-for-row (rounded at 1e-12 to
    # absorb nothing — pagerank arithmetic is identical per plan, assert
    # exact)
    a = pagerank(e, iterations=3, prepartition=False)
    b = pagerank(e, iterations=3, prepartition=True)
    diff = (
        a.withColumnRenamed("rank", "ra")
        .join(b.withColumnRenamed("rank", "rb"), "node", "full")
        .filter(
            F.col("ra").isNull()
            | F.col("rb").isNull()
            | (F.col("ra") != F.col("rb"))
        )
        .count()
    )
    print(f"rank mismatches (must be 0): {diff}")
    for tag, runs in results.items():
        print(
            f"{tag:4s}: min {min(runs):.3f}s  runs {[round(r, 3) for r in runs]}"
        )


if __name__ == "__main__":
    main()
