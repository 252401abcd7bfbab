"""Deterministic sampling / split operators and PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from radohydro_spark.functions.text import redact_pii
from radohydro_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    split_assign,
    stratified_hash_sample,
)


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_hash_sample_deterministic_and_sized(spark):
    df = _ids(spark)
    a = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 10.0).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 10.0).collect())
    assert a == b
    assert 0.07 < len(a) / 2000 < 0.13  # ~10% within hash-noise tolerance


def test_sample_nesting_is_monotone(spark):
    """The 5% sample is a subset of the 20% sample — bucket thresholds
    nest, so shrinking a corpus sample never picks different documents."""
    df = _ids(spark)
    small = {r["doc_id"] for r in hash_sample(df, "doc_id", 5.0).collect()}
    big = {r["doc_id"] for r in hash_sample(df, "doc_id", 20.0).collect()}
    assert small <= big


def test_split_assign_stable_under_growth(spark):
    full = split_assign(_ids(spark, 2000), "doc_id")
    half = split_assign(_ids(spark, 1000), "doc_id")
    m_full = {r["doc_id"]: r["split"] for r in full.collect()}
    for r in half.collect():
        assert m_full[r["doc_id"]] == r["split"]
    frac = sum(1 for v in m_full.values() if v == "train") / 2000
    assert 0.72 < frac < 0.88


def test_stratified_rates(spark):
    df = _ids(spark, 3000).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    out = stratified_hash_sample(df, "doc_id", "lang", {"en": 100.0, "de": 10.0})
    by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by["en"] == 1000  # keep-all stratum keeps everything
    assert 100 < by["de"] < 320


def test_stratified_drops_unlisted_strata(spark):
    df = _ids(spark, 100).withColumn("lang", F.lit("xx"))
    assert stratified_hash_sample(df, "doc_id", "lang", {"en": 100.0}).count() == 0
    # empty rates = every stratum unlisted = keep nothing (r12: used to
    # crash analysis via a zero-arg create_map)
    assert stratified_hash_sample(df, "doc_id", "lang", {}).count() == 0


def test_redact_pii_tokens(spark):
    rows = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "server at 192.168.0.17, call +1 (555) 123-4567 ok"),
            (3, "no pii here"),
        ],
        "id int, text string",
    ).select("id", redact_pii("text").alias("t")).collect()
    got = {r["id"]: r["t"] for r in rows}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server at <IP>, call <PHONE> ok"
    assert got[3] == "no pii here"


def test_stratified_cap_exact_quota_and_determinism(spark):
    from radohydro_spark.operators.sampling import stratified_cap

    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("src")
    )
    capped = stratified_cap(df, "doc_id", "src", 20)
    sizes = {r["src"]: r["n"] for r in capped.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert all(n == 20 for n in sizes.values())  # every stratum has > 20 rows
    # pure function of ids: repeat run keeps the identical set
    a = {r.doc_id for r in capped.collect()}
    b = {r.doc_id for r in stratified_cap(df, "doc_id", "src", 20).collect()}
    assert a == b
    # small strata survive whole
    tiny = df.filter(F.col("doc_id") < 3)
    assert stratified_cap(tiny, "doc_id", "src", 20).count() == 3


def test_normalize_clean_rules(spark):
    from radohydro_spark.functions.text import normalize_clean

    raw = "á  b\tc\nd\x01e f  "  # NFD, ws runs, ctrl, NBSP, trail
    df = spark.createDataFrame([(1, raw)], "doc_id long, text string")
    out = normalize_clean(df).collect()[0]["text"]
    assert out == "\u00e1 b c de f"
    # idempotent: cleaning cleaned text is a no-op
    df2 = spark.createDataFrame([(1, out)], "doc_id long, text string")
    assert normalize_clean(df2).collect()[0]["text"] == out


def test_weighted_sample_bias_and_determinism(spark):
    from radohydro_spark.operators.sampling import weighted_sample

    # two weight classes: heavy (w=100) vs light (w=1); heavy ids should
    # dominate a 100-of-1000 draw by a wide margin
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 100.0).otherwise(1.0).alias("w"),
    )
    s = weighted_sample(df, "doc_id", "w", 100)
    rows = s.collect()
    assert len(rows) == 100
    heavy = sum(1 for r in rows if r.doc_id % 2 == 0)
    assert heavy > 80  # weight-proportional, not uniform (would be ~50)
    # deterministic across runs
    again = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 100).collect()}
    assert {r.doc_id for r in rows} == again
    # non-positive / NULL weights dropped
    bad = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)], "doc_id long, w double"
    )
    assert [r.doc_id for r in weighted_sample(bad, "doc_id", "w", 10).collect()] == [4]


def test_group_kfold_no_group_straddles_folds(spark):
    """r9: every row of a group must land in one fold (the leakage-safe
    GroupKFold contract), folds in [0, k), assignment deterministic."""
    from pyspark.sql import functions as F

    from radohydro_spark.operators.sampling import group_kfold

    rows = [(u, i) for u in range(40) for i in range(3)]
    df = spark.createDataFrame(rows, "user_id int, x int")
    out = group_kfold(df, "user_id", k=5)
    per_user = (
        out.groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .collect()
    )
    assert all(r["nf"] == 1 for r in per_user)
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds <= set(range(5)) and len(folds) > 1
    # deterministic: recomputation yields the identical assignment
    again = {
        (r["user_id"], r["fold"])
        for r in group_kfold(df, "user_id", k=5).select("user_id", "fold").distinct().collect()
    }
    first = {
        (r["user_id"], r["fold"])
        for r in out.select("user_id", "fold").distinct().collect()
    }
    assert first == again


def test_mixture_plan_allocation_law(spark):
    from radohydro_spark.operators.sampling import mixture_plan

    rows = (
        [("web", 100)] * 50     # actual 5000 tokens
        + [("code", 200)] * 10  # actual 2000
        + [("ref", 50)] * 4     # actual 200 (under-supplied)
        + [("junk", 999)] * 3   # not in targets -> absent from the plan
    )
    df = spark.createDataFrame(rows, "source string, n_tokens int")
    targets = {"web": 500, "code": 300, "ref": 200}
    got = {
        r["stratum"]: (r["actual"], r["target"], r["rate_ppm"], r["planned"])
        for r in mixture_plan(df, "source", "n_tokens", targets, 4000).collect()
    }
    # web: target 2000 of 5000 -> rate 400000 ppm, planned 2000
    assert got["web"] == (5000, 2000, 400_000, 2000)
    # code: target 1200 of 2000 -> rate 600000, planned 1200
    assert got["code"] == (2000, 1200, 600_000, 1200)
    # ref: target 800 of only 200 -> rate capped at 1e6, planned = all 200
    assert got["ref"] == (200, 800, 1_000_000, 200)
    assert "junk" not in got


def test_mixture_plan_integer_floor_not_double_truncate(spark):
    from radohydro_spark.operators.sampling import mixture_plan

    # a target/actual ratio whose double quotient rounds UP across an
    # integer: rate must be the exact integer floor (the `/`+cast bug
    # class this operator avoids by using SQL div)
    df = spark.createDataFrame([("s", 3)], "source string, n_tokens int")
    got = mixture_plan(df, "source", "n_tokens", {"s": 1}, 1000).collect()[0]
    # target = 1000*1//1000 = 1; rate = 1*1e6 div 3 = 333333 exactly
    assert (got["target"], got["rate_ppm"], got["planned"]) == (1, 333_333, 0)


def test_mixture_plan_drops_zero_weight_stratum(spark):
    """r12 (ADVICE): a targeted stratum whose weights sum to 0 must be
    DROPPED from the plan, not divided by — Spark's non-ANSI div would
    yield a silent NULL rate while DuckDB's `//` raises, a cross-engine
    split.  Also covers the derived stratum type (long keys, not the
    previously hardcoded string)."""
    from radohydro_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", 100), ("a", 50), ("z", 0), ("z", 0)],
        "source string, n_tokens int",
    )
    rows = mixture_plan(
        df, "source", "n_tokens", {"a": 500, "z": 500}, 1000
    ).collect()
    got = {r["stratum"]: r for r in rows}
    assert set(got) == {"a"}          # z (actual=0) absent, no NULL row
    assert got["a"]["rate_ppm"] is not None
    # derived key type: integer strata join correctly against int targets
    di = spark.createDataFrame([(7, 10), (8, 30)], "source int, n_tokens int")
    goti = {
        r["stratum"]: r["planned"]
        for r in mixture_plan(di, "source", "n_tokens", {7: 500, 8: 500}, 20).collect()
    }
    assert set(goti) == {7, 8}
