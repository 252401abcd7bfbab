"""SCD-2 change-history operator: goldens + single-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

from radohydro_spark.operators.scd import current_snapshot, scd2_from_changes


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_scd2_golden(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 10, "a"),
        (1, _ts("2024-01-01T01:00:00"), 11, "a"),
        (1, _ts("2024-01-01T02:00:00"), 12, "b"),
        (1, _ts("2024-01-01T03:00:00"), 13, "a"),
        (2, _ts("2024-01-01T00:30:00"), 20, "x"),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v string")
    hist = {
        (r["k"], r["version"]): r
        for r in scd2_from_changes(df, ["k"], "ts", ["v"], ["eid"]).collect()
    }
    assert len(hist) == 4
    v1 = hist[(1, 1)]
    assert v1["v"] == "a" and v1["n_events"] == 2
    assert v1["valid_from"] == _ts("2024-01-01T00:00:00")
    assert v1["valid_to"] == _ts("2024-01-01T02:00:00")
    v2 = hist[(1, 2)]
    assert v2["v"] == "b" and v2["valid_to"] == _ts("2024-01-01T03:00:00")
    # re-appearing value opens a NEW version (type 2, not type 1 overwrite)
    v3 = hist[(1, 3)]
    assert v3["v"] == "a" and v3["valid_to"] is None
    assert hist[(2, 1)]["valid_to"] is None


def test_scd2_null_attrs_are_one_version(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, None),
        (1, _ts("2024-01-01T01:00:00"), 2, None),
        (1, _ts("2024-01-01T02:00:00"), 3, "a"),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v string")
    hist = scd2_from_changes(df, ["k"], "ts", ["v"], ["eid"]).collect()
    assert len(hist) == 2  # NULL run collapses to one version


def test_scd2_current_snapshot(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "a"),
        (1, _ts("2024-01-01T01:00:00"), 2, "b"),
        (2, _ts("2024-01-01T00:00:00"), 3, "z"),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v string")
    hist = scd2_from_changes(df, ["k"], "ts", ["v"], ["eid"])
    cur = {r["k"]: r["v"] for r in current_snapshot(hist, ["k"]).collect()}
    assert cur == {1: "b", 2: "z"}


def test_scd2_single_exchange(spark):
    """Windows and the version aggregate all cluster on the key — the whole
    history build must shuffle exactly once."""
    df = spark.range(1000).selectExpr(
        "id % 10 AS k",
        "timestamp_seconds(1700000000 + id * 60) AS ts",
        "id AS eid",
        "CAST(id % 3 AS STRING) AS v",
    )
    hist = scd2_from_changes(df, ["k"], "ts", ["v"], ["eid"])
    plan = hist._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
