"""Bucketed-storage scale path: per-cell aggregation over a bucketed obs
table runs with ZERO exchanges, and results match the unbucketed path."""

from __future__ import annotations

from pyspark.sql import functions as F

from radohydro_spark.operators.dedup import ngram_jaccard_pairs
from radohydro_spark.operators.weights import cell_dirty_flags
from radohydro_spark.sinks.bucketed import read_obs_bucketed, write_obs_bucketed
from radohydro_spark.sources.synthetic import synthetic_obs


def test_bucketed_aggregate_is_shuffle_free(spark, tmp_path):
    # warehouse dir is a static conf; the table lands under the session's
    # default spark-warehouse and is dropped in the finally block
    write_obs_bucketed(synthetic_obs(spark), "obs_bucket_test", buckets=8)
    try:
        back = read_obs_bucketed(spark, "obs_bucket_test")
        flags = cell_dirty_flags(back)
        plan = flags._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        a = {(r.cell_row, r.cell_col): r.is_dirty for r in flags.collect()}
        b = {
            (r.cell_row, r.cell_col): r.is_dirty
            for r in cell_dirty_flags(synthetic_obs(spark)).collect()
        }
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS obs_bucket_test")


def test_ngram_max_doc_freq_guard(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "alpha beta gamma zeta eta theta"),
        (4, "totally different words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    full = ngram_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.2)
    capped = ngram_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.2, max_doc_freq=2)
    full_pairs = {(r.id_a, r.id_b) for r in full.collect()}
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    # identical duplicate pair survives the cap; candidates only shrink
    assert (1, 2) in full_pairs and (1, 2) in capped_pairs
    assert capped_pairs <= full_pairs


def test_partitioned_obs_prunes(spark, tmp_path):
    from radohydro_spark.sinks.bucketed import read_obs_partitioned, write_obs_partitioned

    obs = synthetic_obs(spark)
    path = str(tmp_path / "obs_part")
    write_obs_partitioned(obs, path)
    one_day = read_obs_partitioned(spark, path, start="2024-01-01", end="2024-01-01")
    assert one_day.count() == obs.count()  # fixture is a single day
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan  # pruning at the scan
    none = read_obs_partitioned(spark, path, start="2030-01-01")
    assert none.count() == 0
