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
