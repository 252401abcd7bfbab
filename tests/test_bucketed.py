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


def test_ngram_guard_bounds_skewed_candidates(spark):
    """The hot-shingle guard is the skew cliff fix: one stop-shingle in f
    docs contributes f² candidate pairs.  Scale-safe default must be ON."""
    import inspect

    sig = inspect.signature(ngram_jaccard_pairs)
    assert sig.parameters["max_doc_freq"].default == 1000

    # 60 docs share exactly one hot shingle; otherwise fully distinct
    rows = [
        (i, f"the quick fox tok{i}a tok{i}b tok{i}c") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # threshold 0 surfaces every candidate pair the join produces
    unguarded = ngram_jaccard_pairs(
        df, "text", "doc_id", k=3, threshold=0.0, max_doc_freq=None
    )
    guarded = ngram_jaccard_pairs(
        df, "text", "doc_id", k=3, threshold=0.0, max_doc_freq=10
    )
    # without the guard the hot shingle fans out to C(60,2) pairs;
    # with it, the quadratic term vanishes entirely
    assert unguarded.count() == 60 * 59 // 2
    assert guarded.count() == 0


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


def test_morton_code_matches_python_reference(spark):
    from radohydro_spark.sinks.bucketed import morton_code

    def py_morton(r, c, bits=16):
        z = 0
        for b in range(bits):
            z |= ((r >> b) & 1) << (2 * b + 1)
            z |= ((c >> b) & 1) << (2 * b)
        return z

    rows = [(r, c) for r in (0, 1, 5, 299, 899) for c in (0, 3, 17, 898)]
    df = spark.createDataFrame(rows, "cell_row int, cell_col int")
    got = df.select("cell_row", "cell_col", morton_code().alias("z")).collect()
    for rec in got:
        assert rec["z"] == py_morton(rec["cell_row"], rec["cell_col"]), rec


def test_zordered_archive_files_are_spatially_compact(spark, tmp_path):
    """Each Morton slab file must be bounded in BOTH grid dimensions —
    the property that makes row-group min/max stats prune bbox queries
    (a row-major layout is compact in rows but spans every column)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from radohydro_spark.sinks.bucketed import write_obs_zordered
    from pyspark.sql import functions as F

    n = 32
    obs = (
        spark.range(n * n)
        .select(
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
            (F.col("id") % n).cast("int").alias("cell_row"),
            (F.col("id") / n).cast("int").alias("cell_col"),
            F.rand(7).alias("value"),
        )
    )
    path = str(tmp_path / "zarch")
    write_obs_zordered(obs, path, files_per_day=4)
    files = glob.glob(os.path.join(path, "dt=*", "*.parquet"))
    assert len(files) >= 3
    total = 0
    for f in files:
        t = pq.read_table(f, columns=["cell_row", "cell_col"])
        rr = max(t["cell_row"].to_pylist()) - min(t["cell_row"].to_pylist())
        cr = max(t["cell_col"].to_pylist()) - min(t["cell_col"].to_pylist())
        # a quadrant spans at most ~n/2 in each dim (+1 slack for range cuts)
        assert rr <= n // 2 + 2 and cr <= n // 2 + 2, (f, rr, cr)
        total += t.num_rows
    assert total == n * n
    # archive round-trips
    back = spark.read.parquet(path).drop("dt")
    assert back.count() == n * n


def test_compact_parquet_dir(spark, tmp_path):
    from pyspark.sql import functions as F

    from radohydro_spark.sinks.bucketed import compact_parquet_dir

    path = str(tmp_path / "arch")
    df = spark.range(20000).select(
        F.date_format(
            F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(hours=F.col("id") % 48),
            "yyyyMMdd",
        ).alias("dt"),
        F.col("id"),
        F.rand(3).alias("v"),
    )
    df.repartition(40).write.partitionBy("dt").parquet(path)  # many small files
    import glob

    before = len(glob.glob(f"{path}/dt=*/*.parquet"))
    n = compact_parquet_dir(spark, path, target_file_mb=128)
    after = len(glob.glob(f"{path}/dt=*/*.parquet"))
    assert before > after  # fewer, bigger files
    back = spark.read.parquet(path)
    assert back.count() == 20000
    assert back.select(F.sum("id")).first()[0] == sum(range(20000))


def test_versioned_table_time_travel(spark, tmp_path):
    from radohydro_spark.sinks.versioned import (
        list_versions,
        read_as_of,
        write_version,
    )

    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df2 = spark.createDataFrame([(1, "a2"), (2, "b"), (3, "c")], "k int, v string")
    assert write_version(df1, path, "base") == 1
    assert write_version(df2, path, "update") == 2
    assert [e["version"] for e in list_versions(path)] == [1, 2]
    assert {tuple(r) for r in read_as_of(spark, path, 1).collect()} == {
        (1, "a"), (2, "b"),
    }
    assert {tuple(r) for r in read_as_of(spark, path).collect()} == {
        (1, "a2"), (2, "b"), (3, "c"),
    }
    import pytest

    with pytest.raises(ValueError, match="version 9 not found"):
        read_as_of(spark, path, 9)
    with pytest.raises(ValueError, match="no committed versions"):
        read_as_of(spark, str(tmp_path / "empty"))


def test_versioned_commit_lock_rejects_second_writer(spark, tmp_path):
    """The commit's read-modify-write is guarded by an O_EXCL lockfile:
    a second committer arriving mid-commit fails loudly instead of
    minting a duplicate version or dropping a manifest entry."""
    import os

    import pytest

    from radohydro_spark.sinks.versioned import write_version

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    assert write_version(df, path, "base") == 1  # lock released after commit
    os.close(os.open(os.path.join(path, "_COMMIT_LOCK"),
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    with pytest.raises(RuntimeError, match="concurrent commit in progress"):
        write_version(df, path, "contender")
    os.unlink(os.path.join(path, "_COMMIT_LOCK"))
    assert write_version(df, path, "retry") == 2


def test_vacuum_versions_publish_first_then_delete(spark, tmp_path):
    import os

    import pytest

    from radohydro_spark.sinks.versioned import (
        list_versions,
        read_as_of,
        vacuum_versions,
        write_version,
    )

    path = str(tmp_path / "tbl")
    for i in range(4):
        write_version(
            spark.createDataFrame([(i, f"v{i}")], "k int, s string"), path
        )
    assert vacuum_versions(path, keep_last=2) == [1, 2]
    assert [e["version"] for e in list_versions(path)] == [3, 4]
    assert not os.path.exists(os.path.join(path, "v=1"))
    assert {tuple(r) for r in read_as_of(spark, path, 4).collect()} == {(3, "v3")}
    with pytest.raises(ValueError, match="version 1 not found"):
        read_as_of(spark, path, 1)
    assert vacuum_versions(path, keep_last=2) == []  # idempotent
    with pytest.raises(ValueError, match="keep_last"):
        vacuum_versions(path, keep_last=0)
