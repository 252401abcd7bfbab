"""asof_join semantics: inclusive match, no-prior-row NULLs, key isolation,
tie-break, and linear plan shape (exactly one shuffle, no nested-loop join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from radohydro_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn("ts", F.col("ts").cast("timestamp"))


def test_asof_basic_semantics(spark):
    left = _df(
        spark,
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:30:00"), (2, "2024-01-01 09:00:00")],
        "k int, ts string",
    )
    right = _df(
        spark,
        [
            (1, "2024-01-01 10:00:00", 10.0),  # equal ts -> inclusive match
            (1, "2024-01-01 11:00:00", 20.0),
            (2, "2024-01-01 12:00:00", 99.0),  # after left -> no match
        ],
        "k int, ts string, v double",
    )
    out = {
        (r.k, r.ts.strftime("%H:%M")): (r.v_asof, r.ts_asof and r.ts_asof.strftime("%H:%M"))
        for r in asof_join(left, right, keys=["k"]).collect()
    }
    assert out[(1, "10:00")] == (10.0, "10:00")  # l.ts >= r.ts inclusive
    assert out[(1, "11:30")] == (20.0, "11:00")  # most recent prior
    assert out[(2, "09:00")] == (None, None)  # nothing prior for key 2


def test_asof_tiebreak_last_wins(spark):
    left = _df(spark, [(1, "2024-01-01 10:00:00")], "k int, ts string")
    right = _df(
        spark,
        [(1, "2024-01-01 09:00:00", 1.0), (1, "2024-01-01 09:00:00", 2.0)],
        "k int, ts string, v double",
    )
    out = asof_join(left, right, keys=["k"], tiebreak="v").collect()
    assert out[0].v_asof == 2.0


def test_asof_plan_is_linear(spark):
    left = _df(spark, [(1, "2024-01-01 10:00:00")], "k int, ts string")
    right = _df(spark, [(1, "2024-01-01 09:00:00", 1.0)], "k int, ts string, v double")
    plan = asof_join(left, right, keys=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_matches_naive_and_avoids_bnlj(spark):
    from radohydro_spark.operators.rangejoin import range_join

    points = spark.range(0, 500, 1, 4).select((F.col("id") * 7.3 % 100).alias("x"))
    iv = spark.createDataFrame(
        [(1, 5.0, 20.0), (2, 15.0, 40.0), (3, 90.0, 100.0)], "iv_id int, lo double, hi double"
    )
    fast = range_join(points, iv, "x", bucket_width=10.0)
    naive = points.join(iv, (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
    assert sorted((r.x, r.iv_id) for r in fast.collect()) == sorted(
        (r.x, r.iv_id) for r in naive.collect()
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_cogroup_pair_counts_golden(spark):
    from pyspark.sql import functions as F

    from radohydro_spark.operators.cogroup import cogroup_pair_counts

    left = spark.createDataFrame(
        [(1, 0.0), (1, 100.0), (2, 50.0), (4, 10.0)], "k long, t double"
    )
    right = spark.createDataFrame(
        [(1, 5.0), (1, 250.0), (3, 7.0)], "k long, t double"
    )
    got = {
        r.key: (r.n_left, r.n_right, r.n_pairs)
        for r in cogroup_pair_counts(left, right, "k", "k", "t", "t", max_gap_s=10.0).collect()
    }
    # key 1: pairs (0,5) gap 5 ok; (100,5) no; (0,250)/(100,250) no -> 1
    assert got[1] == (2, 2, 1)
    assert got[2] == (1, 0, 0)   # right side empty
    assert got[3] == (0, 1, 0)   # left side empty
    assert got[4] == (1, 0, 0)


def test_interval_overlap_join_matches_bruteforce(spark):
    import numpy as np

    from radohydro_spark.operators.rangejoin import interval_overlap_join

    rng = np.random.RandomState(5)
    L = [(i, float(s), float(s + l)) for i, (s, l) in enumerate(
        zip(rng.randint(0, 500, 80), rng.randint(1, 40, 80)))]
    R = [(j, float(s), float(s + l)) for j, (s, l) in enumerate(
        zip(rng.randint(0, 500, 30), rng.randint(5, 80, 30)))]
    ldf = spark.createDataFrame(L, "lid int, l_lo double, l_hi double")
    rdf = spark.createDataFrame(R, "rid int, r_lo double, r_hi double")
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(ldf, rdf, bucket_width=16.0).collect()
    }
    want = {
        (i, j)
        for i, llo, lhi in L
        for j, rlo, rhi in R
        if llo < rhi and rlo < lhi
    }
    assert got == want


def test_interval_overlap_join_no_nested_loop_plan(spark):
    from radohydro_spark.operators.rangejoin import interval_overlap_join

    ldf = spark.createDataFrame([(1, 0.0, 5.0)], "lid int, l_lo double, l_hi double")
    rdf = spark.createDataFrame([(2, 3.0, 9.0)], "rid int, r_lo double, r_hi double")
    plan = interval_overlap_join(ldf, rdf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_preserves_input_multiplicity(spark):
    """r7 regression (r6 used dropDuplicates over all columns, which
    collapsed legitimately duplicated input rows): a row appearing twice
    on the left must yield its matches twice, and a pair sharing several
    buckets must still emit exactly once per input-row pair."""
    from radohydro_spark.operators.rangejoin import interval_overlap_join

    # duplicate left row (no distinguishing id column on purpose)
    ldf = spark.createDataFrame(
        [(0.0, 50.0), (0.0, 50.0)], "l_lo double, l_hi double"
    )
    # right interval spans many 16-wide buckets shared with the left
    rdf = spark.createDataFrame([(10.0, 40.0)], "r_lo double, r_hi double")
    rows = interval_overlap_join(ldf, rdf, bucket_width=16.0).collect()
    assert len(rows) == 2  # one per duplicated left row, not collapsed to 1


def test_interval_overlap_join_boundary_and_zero_length(spark):
    """Exact half-open bucket math (no float epsilon): an interval ending
    ON a bucket boundary must not leak into the next bucket, and
    zero-length intervals must not explode descending sequences."""
    from radohydro_spark.operators.rangejoin import interval_overlap_join

    # left [0,16) ends exactly on the bucket-16 boundary; right [16,32)
    # starts there: half-open semantics -> NO overlap
    ldf = spark.createDataFrame([(1, 0.0, 16.0)], "lid int, l_lo double, l_hi double")
    rdf = spark.createDataFrame([(2, 16.0, 32.0)], "rid int, r_lo double, r_hi double")
    assert interval_overlap_join(ldf, rdf, bucket_width=16.0).count() == 0
    # epoch-second magnitudes where a 1e-12 epsilon is absorbed entirely:
    # [t, t+16) against [t+16, t+32) must still be disjoint
    t = 1.7e9
    ldf2 = spark.createDataFrame([(1, t, t + 16.0)], "lid int, l_lo double, l_hi double")
    rdf2 = spark.createDataFrame([(2, t + 16.0, t + 32.0)], "rid int, r_lo double, r_hi double")
    assert interval_overlap_join(ldf2, rdf2, bucket_width=16.0).count() == 0
    # zero-length interval: emits one bucket (sequence must not descend),
    # and the stated predicate l_lo < r_hi AND r_lo < l_hi decides matches
    zdf = spark.createDataFrame([(9, 32.0, 32.0)], "lid int, l_lo double, l_hi double")
    wide = spark.createDataFrame([(7, 0.0, 100.0)], "rid int, r_lo double, r_hi double")
    rows = interval_overlap_join(zdf, wide, bucket_width=16.0).collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(9, 7)]


def test_asof_join_forward_matches_naive_with_tolerance(spark):
    from radohydro_spark.operators.asof import asof_join_forward

    L = [(i, 1, float(t)) for i, t in enumerate([5, 10, 20, 100])]
    R = [(1, 7.0, "a"), (1, 10.0, "b"), (1, 30.0, "c")]
    ldf = spark.createDataFrame(L, "lid int, k int, ts double")
    rdf = spark.createDataFrame(R, "k int, ts double, tag string")
    out = {
        r["lid"]: (r["ts_next"], r["tag_next"])
        for r in asof_join_forward(
            ldf, rdf, ["k"], "ts", tolerance_s=15.0
        ).collect()
    }
    assert out[0] == (7.0, "a")      # 5 -> first following is 7
    assert out[1] == (10.0, "b")     # inclusive boundary: 10 matches 10
    assert out[2] == (30.0, "c")     # 20 -> 30 within tolerance 15
    assert out[3] == (None, None)    # 100 -> nothing follows
    # without tolerance, 20 still matches 30; 100 still unmatched
    out2 = {
        r["lid"]: r["tag_next"]
        for r in asof_join_forward(ldf, rdf, ["k"], "ts").collect()
    }
    assert out2 == {0: "a", 1: "b", 2: "c", 3: None}


def test_asof_join_forward_matches_naive_random(spark):
    import random

    from radohydro_spark.operators.asof import asof_join_forward

    rng = random.Random(23)
    L = [(i, rng.randint(1, 5), float(rng.randint(0, 200))) for i in range(120)]
    R = [(rng.randint(1, 5), float(rng.randint(0, 200)), j) for j in range(60)]
    # dedupe right on (key, ts): forward-asof semantics assume a unique
    # right row per instant (callers pre-aggregate, as the queries do)
    seen, R2 = set(), []
    for k, t, j in R:
        if (k, t) not in seen:
            seen.add((k, t))
            R2.append((k, t, j))
    ldf = spark.createDataFrame(L, "lid int, k int, ts double")
    rdf = spark.createDataFrame(R2, "k int, ts double, rid int")
    got = {
        r["lid"]: r["rid_next"]
        for r in asof_join_forward(ldf, rdf, ["k"], "ts", tolerance_s=40.0).collect()
    }
    for lid, k, ts in L:
        cands = [(t, j) for kk, t, j in R2 if kk == k and ts <= t <= ts + 40.0]
        want = min(cands)[1] if cands else None
        assert got[lid] == want, (lid, k, ts, cands)
