"""SemDeDup semantic dedup (operators/dedup.py, round 7)."""


def test_semdedup_drops_planted_near_duplicate(spark):
    """A planted paraphrase-level duplicate (same direction, scaled) must
    be dropped; the orthogonal vector survives; the keep-one policy keeps
    the LOWEST id of a duplicate group."""
    from radohydro_spark.operators.dedup import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (10, [2.0, 0.1, 0.0, 0.0]),   # near-dup of 0 (cos ~0.999)
        (11, [0.0, 0.0, 1.0, 0.0]),   # orthogonal — survives
        (12, [4.0, 0.2, 0.0, 0.0]),   # near-dup of 0 AND 10
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {r["vec_id"] for r in semdedup(df, n_clusters=2, threshold=0.95).collect()}
    assert 0 in kept and 1 in kept and 11 in kept
    assert 10 not in kept and 12 not in kept


def test_semdedup_pair_stage_is_cluster_equijoin(spark):
    """The pair stage must join on centroid_id — no corpus-wide cross
    product in the plan."""
    from radohydro_spark.operators.dedup import semdedup

    df = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    plan = (
        semdedup(df, n_clusters=4, threshold=0.99)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
