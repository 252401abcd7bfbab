"""Column profiling: values and single-scan plan shape."""

from __future__ import annotations

from radohydro_spark.operators.profile import profile_columns


def test_profile_values(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.5), (3, "b", None)],
        "k int, s string, v double",
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nulls"] == 0
    assert rows["k"]["n_distinct"] == 3
    assert (rows["k"]["min_value"], rows["k"]["max_value"]) == ("1", "3")
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["v"]["n_nulls"] == 2 and rows["v"]["min_value"] == "5.0"


def test_profile_is_single_scan(spark):
    """All columns' measures come from one aggregation over one scan —
    the plan must contain exactly one scan of the input."""
    df = spark.range(100).selectExpr("id AS a", "id % 7 AS b", "CAST(id AS STRING) AS c")
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_check_constraints_report(spark):
    from pyspark.sql import functions as F

    from radohydro_spark.operators.profile import check_constraints

    df = spark.createDataFrame(
        [
            (1, 10, 5.0, "A"),
            (2, None, -1.0, "B"),   # null fk col + negative value
            (2, 20, 3.0, "A"),      # duplicate key
            (3, 99, 2.0, "Z"),      # fk miss + bad status
        ],
        "id long, ref long, v double, status string",
    )
    ref = spark.createDataFrame([(10,), (20,), (30,)], "k long")
    rep = {
        r.rule: r.n_violations
        for r in check_constraints(
            df,
            not_null=["ref"],
            unique=[["id"]],
            row_rules={
                "nonneg_v": F.col("v") < 0,
                "known_status": ~F.col("status").isin("A", "B"),
            },
            foreign_keys=[("ref", ref, "k")],
        ).collect()
    }
    assert rep == {
        "not_null:ref": 1,
        "rule:nonneg_v": 1,
        "rule:known_status": 1,
        "unique:id": 1,
        "fk:ref": 1,
    }
