"""Skew-aware joins: row-identical to the plain join, with the promised
physical plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from radohydro_spark.operators.skew import hot_keys, salted_join, skew_split_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _skewed(spark):
    # key 7 has 5000 rows, the tail 1 each
    left = spark.range(0, 5000).select(
        F.lit(7).alias("k"), F.col("id").alias("lv")
    ).union(
        spark.range(0, 200).select((F.col("id") + 100).alias("k"), F.col("id").alias("lv"))
    )
    right = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    return left, right


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], "inner", n_salt=8)
    assert _rows(salted) == _rows(plain)
    assert len(_rows(salted)) == 5000 + 200  # k=7 hits + tail keys 100..299


def test_salted_join_matches_plain_left(spark):
    left, right = _skewed(spark)
    assert _rows(salted_join(left, right, ["k"], "left", n_salt=4)) == _rows(
        left.join(right, ["k"], "left")
    )


def test_salted_join_shuffles_on_salt(spark):
    left, right = _skewed(spark)
    plan = _plan(salted_join(left, right, ["k"], n_salt=8))
    assert "_salt" in plan  # salt participates in the join keys


def test_hot_keys_detection(spark):
    left, _ = _skewed(spark)
    assert [r["k"] for r in hot_keys(left, ["k"], min_count=1000).collect()] == [7]


def test_skew_split_join_matches_plain(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"], "inner")
    split = skew_split_join(left, right, ["k"], min_count=1000)
    assert _rows(split) == _rows(plain)


def test_skew_split_join_left_matches_plain(spark):
    left, right = _skewed(spark)
    assert _rows(skew_split_join(left, right, ["k"], how="left", min_count=1000)) == _rows(
        left.join(right, ["k"], "left")
    )


def test_skew_split_hot_branch_is_broadcast(spark):
    left, right = _skewed(spark)
    plan = _plan(skew_split_join(left, right, ["k"], min_count=1000))
    assert "BroadcastHashJoin" in plan
    assert "Union" in plan
