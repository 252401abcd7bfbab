"""merge_upsert: update / insert / delete / passthrough goldens."""

from __future__ import annotations

from radohydro_spark.operators.merge import merge_upsert


def test_merge_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, 99.0), (4, 40.0)], "k int, v double"
    )
    out = {r["k"]: r for r in merge_upsert(target, source, ["k"]).collect()}
    assert len(out) == 4
    assert out[1]["v"] == 10.0 and out[1]["name"] == "a"  # untouched
    assert out[2]["v"] == 99.0 and out[2]["name"] == "b"  # updated, name kept
    assert out[3]["v"] == 30.0                             # untouched
    assert out[4]["v"] == 40.0 and out[4]["name"] is None  # inserted


def test_merge_delete(spark):
    target = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double")
    source = spark.createDataFrame(
        [(1, None, True), (3, 3.0, False)], "k int, v double, is_del boolean"
    )
    out = {r["k"]: r["v"] for r in
           merge_upsert(target, source, ["k"], delete_col="is_del").collect()}
    assert out == {2: 2.0, 3: 3.0}  # 1 deleted, 2 kept, 3 inserted
    # delete flag column must not leak into the output schema
    cols = merge_upsert(target, source, ["k"], delete_col="is_del").columns
    assert cols == ["k", "v"]


def test_merge_source_only_column(spark):
    target = spark.createDataFrame([(1, 1.0)], "k int, v double")
    source = spark.createDataFrame([(1, "x"), (2, "y")], "k int, tag string")
    out = {r["k"]: r for r in merge_upsert(target, source, ["k"]).collect()}
    assert out[1]["tag"] == "x" and out[1]["v"] == 1.0
    assert out[2]["tag"] == "y" and out[2]["v"] is None


def test_merge_idempotent_on_empty_source(spark):
    target = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double")
    source = spark.createDataFrame([], "k int, v double")
    out = merge_upsert(target, source, ["k"]).collect()
    assert sorted((r["k"], r["v"]) for r in out) == [(1, 1.0), (2, 2.0)]


def test_merge_rollup_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from radohydro_spark.operators.merge import merge_rollup

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 0.37).alias("v")
    )

    def roll(d):
        return d.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n"))

    merged = merge_rollup(
        roll(df.filter(F.col("k") != 3).filter(F.col("v") < 200)),
        roll(df.filter((F.col("k") == 3) | (F.col("v") >= 200))),
        ["k"],
        ["s", "n"],
    )
    full = {r.k: (r.s, r.n) for r in roll(df).collect()}
    got = {r.k: (r.s, r.n) for r in merged.collect()}
    assert set(got) == set(full)
    for k in full:
        assert got[k][1] == full[k][1]
        assert abs(got[k][0] - full[k][0]) < 1e-9


def test_snapshot_diff_classes(spark):
    from radohydro_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, 30.0, "z"), (4, None, "w")],
        "k long, v double, s string",
    )
    new = spark.createDataFrame(
        [(2, 20.0, "y"), (3, 31.0, "z"), (4, None, "w"), (5, 50.0, "q")],
        "k long, v double, s string",
    )
    got = {r.k: (r.change_type, r.v, r.s) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got[1][0] == "delete"
    assert got[3] == ("update", 31.0, "z")
    assert got[5] == ("insert", 50.0, "q")
    assert 2 not in got  # unchanged filtered
    assert 4 not in got  # NULL == NULL is unchanged (null-safe compare)


def test_snapshot_diff_key_only_tables(spark):
    from radohydro_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "delete", 3: "insert"}
