"""Round-10 second batch: exact heavy hitters (Misra-Gries candidates +
exact verify), exact duplicated token spans, k-core peeling."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from radohydro_spark.operators.dedup import duplicate_spans
from radohydro_spark.operators.graph import k_core
from radohydro_spark.operators.sketch import heavy_hitters


# --- heavy_hitters ---


def test_heavy_hitters_hand_case(spark):
    # 10 rows: 'a' x5 (50%), 'b' x3 (30%), 'c','d' x1. phi=1/4 -> a, b
    data = ["a"] * 5 + ["b"] * 3 + ["c", "d"]
    df = spark.createDataFrame([(v,) for v in data], "k string")
    rows = {r["value"]: r["cnt"] for r in heavy_hitters(df, "k", 4).collect()}
    assert rows == {"a": 5, "b": 3}


def test_heavy_hitters_threshold_boundary_integer_exact(spark):
    # cnt * inv >= N boundary: N=8, inv=4 -> threshold cnt >= 2 exactly
    data = ["a", "a", "b", "c", "d", "e", "f", "g"]
    df = spark.createDataFrame([(v,) for v in data], "k string")
    rows = {r["value"]: r["cnt"] for r in heavy_hitters(df, "k", 4).collect()}
    assert rows == {"a": 2}


def test_heavy_hitters_matches_exact_groupby_random(spark):
    # adversarial-ish: heavy keys interleaved across partitions, plus a
    # uniform tail that floods the MG counters
    rng = random.Random(7)
    data = [rng.choice(["hot1", "hot2"]) for _ in range(400)] + [
        f"tail{rng.randrange(5000)}" for _ in range(600)
    ]
    rng.shuffle(data)
    df = spark.createDataFrame([(v,) for v in data], "k string").repartition(8)
    inv = 20  # phi = 5% of 1000 = 50
    got = {r["value"]: r["cnt"] for r in heavy_hitters(df, "k", inv).collect()}
    exact = Counter(data)
    want = {v: c for v, c in exact.items() if c * inv >= len(data)}
    assert got == want


def test_heavy_hitters_long_dtype_and_nulls(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,), (None,), (None,), (None,)],
        "k long",
    )
    # nulls are ignored: N = 4 non-null rows, phi=1/2 -> only value 1
    rows = {r["value"]: r["cnt"] for r in heavy_hitters(df, "k", 2).collect()}
    assert rows == {1: 3}


def test_heavy_hitters_counters_below_inverse_rejected(spark):
    df = spark.createDataFrame([("a",)], "k string")
    try:
        heavy_hitters(df, "k", 10, counters=5)
        assert False, "expected AssertionError"
    except AssertionError:
        pass


# --- duplicate_spans ---


def test_duplicate_spans_hand_case(spark):
    docs = spark.createDataFrame(
        [
            (1, "x x a b c y"),
            (2, "z a b c w q"),
            (3, "unrelated words here entirely now yes"),
        ],
        "doc_id long, text string",
    )
    rows = duplicate_spans(docs, "text", "doc_id", n_tokens=3).collect()
    got = {(r["span"], r["n_docs"], r["n_occ"]) for r in rows}
    assert got == {("a b c", 2, 2)}


def test_duplicate_spans_counts_all_occurrences(spark):
    # doc 1 contains the span twice; n_occ counts occurrences, n_docs docs
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c d")], "doc_id long, text string"
    )
    rows = duplicate_spans(docs, "text", "doc_id", n_tokens=2).collect()
    got = {(r["span"], r["n_docs"], r["n_occ"]) for r in rows}
    assert got == {("a b", 2, 3)}


def test_duplicate_spans_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    assert duplicate_spans(docs, "text", "doc_id", n_tokens=3).count() == 0
    rows = duplicate_spans(docs, "text", "doc_id", n_tokens=2).collect()
    assert {(r["span"], r["n_docs"], r["n_occ"]) for r in rows} == {("a b", 2, 2)}


def test_duplicate_spans_fingerprint_mode_same_rows(spark, documents_df=None):
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{(i * j) % 7}" for j in range(12)))
            for i in range(1, 30)
        ],
        "doc_id long, text string",
    )
    plain = duplicate_spans(docs, "text", "doc_id", n_tokens=4)
    fp = duplicate_spans(docs, "text", "doc_id", n_tokens=4, fingerprint=True)
    as_set = lambda df: {
        (r["span"], r["n_docs"], r["n_occ"]) for r in df.collect()
    }
    assert as_set(plain) == as_set(fp)


# --- k_core ---


def _kc(spark, edges, k):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["degree"] for r in k_core(df, k).collect()
    }


def test_k_core_triangle_plus_pendant(spark):
    # triangle 1-2-3 plus pendant 3-4: 2-core = the triangle, 4 peeled
    got = _kc(spark, [(1, 2), (2, 3), (1, 3), (3, 4)], 2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_path_peels_layer_by_layer(spark):
    # a path has no 2-core at all; peeling proceeds one end-layer per
    # round (deep cascade — exercises the iteration, not just one pass)
    path = [(i, i + 1) for i in range(1, 12)]
    assert _kc(spark, path, 2) == {}


def test_k_core_clique_survives_whole(spark):
    clique = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    got = _kc(spark, clique, 4)
    assert got == {i: 4 for i in range(1, 6)}


def test_k_core_self_loops_and_dup_edges_ignored(spark):
    got = _kc(
        spark,
        [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3), (3, 3), (3, 2)],
        2,
    )
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_cascade_chain_of_triangles(spark):
    # triangles chained by single bridges: 2-core keeps the triangles
    # AND the bridge edges' endpoints stay (bridge endpoints have degree
    # 3); nothing peels.  Then k=3 peels everything in cascading rounds.
    edges = []
    for t in range(4):
        a, b, c = 3 * t + 1, 3 * t + 2, 3 * t + 3
        edges += [(a, b), (b, c), (a, c)]
        if t:
            edges.append((3 * t, a))  # bridge from previous triangle
    got2 = _kc(spark, edges, 2)
    assert set(got2) == {i for i in range(1, 13)}
    assert _kc(spark, edges, 3) == {}


# --- table_fingerprint ---

from radohydro_spark.operators.profile import table_fingerprint


def _fp(df):
    return {
        r["bucket"]: (r["n_rows"], r["checksum_a"], r["checksum_b"])
        for r in df.collect()
    }


def test_fingerprint_order_and_partitioning_invariant(spark):
    rows = [(i, f"v{i % 7}") for i in range(1, 200)]
    a = spark.createDataFrame(rows, "id long, v string")
    b = spark.createDataFrame(list(reversed(rows)), "id long, v string").repartition(13)
    assert _fp(table_fingerprint(a, ["id", "v"], 8)) == _fp(
        table_fingerprint(b, ["id", "v"], 8)
    )


def test_fingerprint_detects_single_cell_change(spark):
    rows = [(i, f"v{i}") for i in range(1, 100)]
    a = spark.createDataFrame(rows, "id long, v string")
    changed = [(i, "v1x" if i == 1 else f"v{i}") for i in range(1, 100)]
    b = spark.createDataFrame(changed, "id long, v string")
    fa, fb = _fp(table_fingerprint(a, ["id", "v"], 8)), _fp(
        table_fingerprint(b, ["id", "v"], 8)
    )
    diff = {k for k in set(fa) | set(fb) if fa.get(k) != fb.get(k)}
    # the changed row's hash moves it to a (possibly different) bucket:
    # damage localized to the bucket it left and the one it entered
    assert 1 <= len(diff) <= 2


def test_fingerprint_null_vs_empty_distinct(spark):
    a = spark.createDataFrame([(1, None)], "id long, v string")
    b = spark.createDataFrame([(1, "")], "id long, v string")
    assert _fp(table_fingerprint(a, ["id", "v"], 4)) != _fp(
        table_fingerprint(b, ["id", "v"], 4)
    )


def test_fingerprint_detects_duplicated_row(spark):
    # multiset semantics: same distinct rows, different multiplicities
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], "id long, v string")
    assert _fp(table_fingerprint(a, ["id", "v"], 4)) != _fp(
        table_fingerprint(b, ["id", "v"], 4)
    )


def test_k_core_raises_on_max_iter_exhaustion(spark):
    # r11 (ADVICE): a k=2 path peels ONE layer per round; with max_iter
    # smaller than the peel depth the loop must fail loudly instead of
    # returning a non-fixed-point containing degree-<k survivors.
    import pytest

    path = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(path, "src long, dst long")
    with pytest.raises(RuntimeError, match="fixed point"):
        k_core(df, 2, max_iter=2).collect()
    # and a sufficient max_iter on the same graph converges to empty
    assert k_core(df, 2, max_iter=10).count() == 0
