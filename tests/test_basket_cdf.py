"""Round-7 operators: market-basket pair lift, table_changes CDF,
MAD robust outliers."""

import pytest
from pyspark.sql import functions as F


def test_pair_lift_counts_and_lift(spark):
    from radohydro_spark.operators.basket import pair_lift

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (3, "c"),  # duplicate (basket,item) must collapse
        (4, "d"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in pair_lift(df, "basket", "item").collect()
    }
    ab = out[("a", "b")]
    assert ab["pair_count"] == 2 and ab["count_a"] == 3 and ab["count_b"] == 2
    # lift(a,b) = N*c_ab/(c_a*c_b) = 4*2/(3*2)
    assert ab["lift"] == round(4 * 2 / (3 * 2), 6)
    assert out[("a", "c")]["pair_count"] == 2
    assert ("b", "c") in out and out[("b", "c")]["pair_count"] == 1
    # d co-occurs with nothing
    assert not any("d" in k for k in out)


def test_pair_lift_basket_size_guard(spark):
    from radohydro_spark.operators.basket import pair_lift

    big = [(1, f"i{j}") for j in range(10)] + [(2, "x"), (2, "y")]
    df = spark.createDataFrame(big, "basket int, item string")
    out = pair_lift(df, "basket", "item", max_basket_size=5).collect()
    # the 10-item basket is dropped entirely; only (x,y) survives
    assert len(out) == 1
    assert (out[0]["item_a"], out[0]["item_b"]) == ("x", "y")
    # guarded basket also leaves N (denominator base) = 1
    assert out[0]["lift"] == 1.0


def test_table_changes_classification(spark, tmp_path):
    from radohydro_spark.sinks.versioned import table_changes, write_version

    path = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int"
    )
    v2 = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)], "k int, s string, v int"
    )
    write_version(v1, path)
    write_version(v2, path)
    ch = {
        r["k"]: r["change_type"]
        for r in table_changes(spark, path, 1, 2, ["k"]).collect()
    }
    assert ch == {1: "delete", 2: "unchanged", 3: "update", 4: "insert"}


def test_table_changes_schema_evolution_counts_as_update(spark, tmp_path):
    from radohydro_spark.sinks.versioned import table_changes, write_version

    path = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, s string"), path)
    write_version(
        spark.createDataFrame([(1, "a", 5)], "k int, s string, extra int"), path
    )
    rows = table_changes(spark, path, 1, 2, ["k"]).collect()
    assert rows[0]["change_type"] == "update"  # new column present
    assert rows[0]["new"]["extra"] == 5


def test_mad_outliers_exact_small_case(spark):
    from radohydro_spark.operators.profile import mad_outliers

    # group g: values 1..9 plus one wild point; med=5.5 over 10 values?
    # use odd count for a clean median: 1..9 -> med 5, MAD median(|x-5|)=2
    vals = [("g", v) for v in range(1, 10)]
    df = spark.createDataFrame(vals, "grp string, x int")
    r = mad_outliers(df, "grp", "x", k=1.0).collect()[0]
    assert r["n_rows"] == 9 and r["med"] == 5.0 and r["mad"] == 2.0
    # |x-5| > 2  -> x in {1,2,8,9}
    assert r["n_outliers"] == 4
    # even count interpolates to .5 exactly
    df2 = spark.createDataFrame([("g", v) for v in [1, 2, 3, 4]], "grp string, x int")
    r2 = mad_outliers(df2, "grp", "x", k=3.0).collect()[0]
    assert r2["med"] == 2.5 and r2["mad"] == 1.0 and r2["n_outliers"] == 0


def test_bloom_no_false_negatives_and_prunes(spark):
    from radohydro_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_semi_join,
    )

    dim = spark.range(0, 50).select((F.col("id") * 17 + 3).alias("key"))
    fact = spark.range(0, 5000).select(F.col("id").alias("key"))
    words = bloom_build(dim, "key", n_words=64, k=5)
    pre = fact.filter(bloom_might_contain(F.col("key"), words, k=5))
    pre_keys = {r["key"] for r in pre.collect()}
    dim_keys = {r["key"] for r in dim.collect()}
    assert dim_keys <= pre_keys  # zero false negatives
    # deterministic FPR check (xxhash64 is fixed): 50 keys in 4096 bits
    # with k=5 gives a theoretical FPR ~1e-6; allow a wide 5% margin so
    # the assertion pins the order of magnitude, not the exact hash layout
    false_pos = len(pre_keys - dim_keys)
    assert false_pos <= 0.05 * (5000 - len(dim_keys))
    exact = {
        r["key"]
        for r in fact.join(
            dim.select(F.col("key")), "key", "left_semi"
        ).collect()
    }
    got = {r["key"] for r in bloom_semi_join(fact, dim, "key", "key").collect()}
    assert got == exact  # prefilter never changes the exact result


def test_pair_lift_matches_bruteforce_random(spark):
    import itertools
    import random

    from radohydro_spark.operators.basket import pair_lift

    rng = random.Random(11)
    rows = []
    baskets = {}
    for b in range(40):
        items = rng.sample("abcdefghij", rng.randint(1, 6))
        baskets[b] = set(items)
        rows += [(b, i) for i in items]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["pair_count"], r["lift"])
        for r in pair_lift(df, "basket", "item").collect()
    }
    n = len(baskets)
    item_count = {
        i: sum(1 for s in baskets.values() if i in s) for i in "abcdefghij"
    }
    want = {}
    for a, b in itertools.combinations(sorted("abcdefghij"), 2):
        pc = sum(1 for s in baskets.values() if a in s and b in s)
        if pc:
            want[(a, b)] = (pc, round(n * pc / (item_count[a] * item_count[b]), 6))
    assert got == want


def test_table_changes_apply_roundtrip(spark, tmp_path):
    """CDC algebra: applying the table_changes feed onto v1 reproduces v2
    exactly (the replay contract a downstream incremental consumer relies
    on)."""
    from radohydro_spark.operators.merge import apply_changes
    from radohydro_spark.sinks.versioned import (
        read_as_of,
        table_changes,
        write_version,
    )

    path = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (5, "e", 50)],
        "k int, s string, v int",
    )
    v2 = spark.createDataFrame(
        [(2, "b", 20), (3, "x", 99), (4, "d", 40), (5, "e", 51)],
        "k int, s string, v int",
    )
    write_version(v1, path)
    write_version(v2, path)
    feed = table_changes(spark, path, 1, 2, ["k"]).filter(
        F.col("change_type") != "unchanged"
    )
    flat = feed.select(
        "k", "change_type", F.col("new.s").alias("s"), F.col("new.v").alias("v")
    )
    replayed = apply_changes(read_as_of(spark, path, 1), flat, ["k"])
    assert {tuple(r) for r in replayed.select("k", "s", "v").collect()} == {
        tuple(r) for r in read_as_of(spark, path, 2).collect()
    }


def test_mad_outliers_singleton_group_and_zero_mad(spark):
    from radohydro_spark.operators.profile import mad_outliers

    df = spark.createDataFrame(
        [("solo", 7), ("flat", 4), ("flat", 4), ("flat", 4), ("flat", 9)],
        "grp string, x int",
    )
    r = {row["grp"]: row for row in mad_outliers(df, "grp", "x", k=3.0).collect()}
    assert r["solo"]["med"] == 7.0 and r["solo"]["mad"] == 0.0
    assert r["solo"]["n_outliers"] == 0
    # zero MAD: any deviation beats k*0 -> the lone 9 is an outlier
    assert r["flat"]["mad"] == 0.0 and r["flat"]["n_outliers"] == 1


def test_pair_lift_empty_and_single_item_baskets(spark):
    from radohydro_spark.operators.basket import pair_lift

    empty = spark.createDataFrame([], "basket int, item string")
    assert pair_lift(empty, "basket", "item").count() == 0
    singles = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "basket int, item string"
    )
    assert pair_lift(singles, "basket", "item").count() == 0


def test_write_version_recovers_from_crashed_commit(spark, tmp_path):
    """r9 regression (ADVICE versioned.py:69): a writer that died after
    materializing the snapshot dir but before publishing the manifest
    used to wedge every future commit (``errorifexists`` on the orphan
    ``v=<n>``).  Commits now stage + rename, and sweep unreferenced
    leftovers under the commit lock."""
    import os
    import shutil

    from radohydro_spark.sinks.versioned import (
        list_versions,
        read_as_of,
        write_version,
    )

    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a")], "k int, s string")
    write_version(df1, path)

    # simulate a pre-staging-era crash: a fully-written but unpublished
    # v=2 dir (manifest still only knows v=1)
    orphan = os.path.join(path, "v=2")
    df1.write.parquet(orphan)
    assert len(list_versions(path)) == 1

    # and a dead writer's staging leftover
    os.makedirs(os.path.join(path, "v=2._staging"), exist_ok=True)

    df2 = spark.createDataFrame([(2, "b")], "k int, s string")
    v = write_version(df2, path)  # used to raise on the orphan
    assert v == 2
    assert [r["k"] for r in read_as_of(spark, path, 2).collect()] == [2]
    assert not os.path.exists(os.path.join(path, "v=2._staging"))
    shutil.rmtree(path)


def test_write_version_failed_write_leaves_no_version_dir(spark, tmp_path):
    """A snapshot write that THROWS must not leave a published-looking
    ``v=<n>`` dir behind — only (at most) a staging dir that the next
    commit sweeps."""
    import os

    from radohydro_spark.sinks.versioned import list_versions, write_version

    path = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, s string"), path)

    class Boom(Exception):
        pass

    bad = spark.createDataFrame([(2, "b")], "k int, s string")

    from pyspark.sql import functions as F

    # force the parquet write to fail inside the executor
    @F.udf("int")
    def boom(x):
        raise ValueError("boom")

    failing = bad.withColumn("k", boom("k"))
    try:
        write_version(failing, path)
    except Exception:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected the snapshot write to fail")
    assert not os.path.isdir(os.path.join(path, "v=2"))
    # next commit succeeds and mints the same version number
    assert write_version(bad, path) == 2
    assert len(list_versions(path)) == 2
