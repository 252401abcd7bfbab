"""Round-13 fixes: executable global-window size contracts
(plans/contracts.bounded_global), the single-evaluation cosine guard,
and mmr_select's one-job-per-round selection loop.
"""

from __future__ import annotations

import pytest
from pyspark.errors import SparkRuntimeException
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from radohydro_spark.plans.contracts import bounded_global
from radohydro_spark.operators.similarity import cosine


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- contracts


def test_bounded_global_matches_unpartitioned_window(spark):
    df = spark.range(1000).withColumn("v", (F.col("id") * 37) % 101)
    rn = bounded_global(
        F.row_number(),
        lambda w: w.orderBy(F.col("v").asc(), F.col("id").asc()),
        "int",
        "test",
    )
    got = {r.id: r.rn for r in df.withColumn("rn", rn).collect()}
    ref_w = W.orderBy(F.col("v").asc(), F.col("id").asc())
    ref = {
        r.id: r.rn
        for r in df.withColumn("rn", F.row_number().over(ref_w)).collect()
    }
    assert got == ref


def test_bounded_global_partition_spec_survives_optimizer(spark):
    # the session excludes EliminateWindowPartitions so the constant key
    # (the declared single-partition intent) reaches the physical plan —
    # WindowExec only warns when the partition spec is EMPTY
    df = spark.range(10)
    rn = bounded_global(F.row_number(), lambda w: w.orderBy("id"), "int", "t")
    plan = _plan(df.withColumn("rn", rn))
    assert "windowspecdefinition(0," in plan or "Window [" in plan
    # the partition spec list after the window exprs must be non-empty
    import re

    m = re.search(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert m is not None and m.group(1).strip() != "", plan


def test_bounded_global_cap_raises_loudly(spark):
    df = spark.range(100)
    rn = bounded_global(
        F.row_number(), lambda w: w.orderBy("id"), "int", "cap_test", cap=50
    )
    with pytest.raises(SparkRuntimeException, match="cap_test"):
        df.withColumn("rn", rn).collect()


def test_bounded_global_frame_and_aggregate(spark):
    # the skyline shape: running max over a preceding-rows frame
    df = spark.range(6).withColumn("v", F.col("id") % 3)
    mx = bounded_global(
        F.max("v"),
        lambda w: w.orderBy("id").rowsBetween(W.unboundedPreceding, -1),
        "bigint",
        "t",
    )
    rows = {r.id: r.m for r in df.withColumn("m", mx).collect()}
    assert rows[0] is None and rows[1] == 0 and rows[3] == 2 and rows[5] == 2


# ------------------------------------------------------------------ cosine


def test_cosine_zero_norm_scores_zero(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    got = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got == [0.0, 1.0]


def test_cosine_null_vector_propagates_null(spark):
    df = spark.createDataFrame(
        [(None, [1.0, 0.0]), ([1.0, 0.0], None)],
        "a array<double>, b array<double>",
    )
    got = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got == [None, None]


def test_cosine_single_norm_evaluation_in_plan(spark):
    # the r12 when-guard named the denominator twice; higher-order
    # aggregates are CodegenFallback (no CSE), so that re-ran both norms
    # per row.  The try_divide form names each aggregate exactly once —
    # count the interpreted `aggregate(` nodes in the physical plan.
    df = spark.createDataFrame([([1.0, 2.0], [3.0, 4.0])], "a array<double>, b array<double>")
    plan = _plan(df.select(cosine(F.col("a"), F.col("b")).alias("c")))
    assert plan.count("aggregate(") == 3, plan  # dot + norm(a) + norm(b)


# -------------------------------------------------------------- mmr_select


def test_mmr_select_one_job_per_round(spark):
    from radohydro_spark.operators.sampling import mmr_select

    df = spark.createDataFrame(
        [(i, [float((i * 7) % 5 + 1), float((i * 3) % 4 + 1)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    k = 4
    sc = spark.sparkContext
    sc.setJobGroup("mmr13", "job-count contract")
    try:
        out = mmr_select(df, "embedding", "vec_id", query_id=0, k=k)
        rows = out.collect()
    finally:
        sc.setJobGroup(None, None)
    assert len(rows) == k
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == k and 0 not in ids
    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup("mmr13")
    # 1 query-row fetch + k argmax rounds (+1 slack for cache
    # materialization folding); the r12 form ran 2 jobs per round
    assert len(jobs) <= k + 2, jobs
