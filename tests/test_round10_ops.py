"""Round-10 operators: sparse TF-IDF cosine pairs, interval coalescing,
exact weighted median."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from radohydro_spark.operators.aggregate import weighted_median
from radohydro_spark.operators.dedup import tfidf_cosine_pairs
from radohydro_spark.operators.rangejoin import coalesce_intervals


# --- tfidf_cosine_pairs ---


def test_tfidf_cosine_identical_docs_score_one(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "zz yy xx ww"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_cosine_pairs(docs, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"], r["cos_sim"]) for r in rows] == [(1, 2, 1.0)]


def test_tfidf_cosine_disjoint_vocab_no_pair(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    assert tfidf_cosine_pairs(docs, threshold=0.0).count() == 0


def test_tfidf_cosine_hot_term_guard_drops_stopword(spark):
    # "the" appears in all 3 docs; with max_doc_freq=2 it leaves the
    # vector space entirely, so docs sharing ONLY "the" never pair
    docs = spark.createDataFrame(
        [(1, "the apples"), (2, "the oranges"), (3, "the apples")],
        "doc_id long, text string",
    )
    rows = tfidf_cosine_pairs(docs, threshold=0.1, max_doc_freq=2).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 3)]


def test_tfidf_cosine_weight_asymmetry(spark):
    # shared rare term scores higher than shared common term
    docs = spark.createDataFrame(
        [
            (1, "rare common"),
            (2, "rare other1"),
            (3, "common other2"),
            (4, "common other3"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()
    }
    assert rows[(1, 2)] > rows[(1, 3)]  # rare-term pair beats common-term pair


# --- coalesce_intervals ---


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_coalesce_intervals_merges_overlap_and_adjacent(spark):
    iv = spark.createDataFrame(
        [
            (1, _ts(0), _ts(1)),
            (1, _ts(0, 30), _ts(2)),  # overlaps previous
            (1, _ts(2), _ts(3)),  # adjacent (hi == lo): merges
            (1, _ts(5), _ts(6)),  # gap: new island
            (2, _ts(0), _ts(1)),  # other key untouched
        ],
        "user_id long, lo timestamp, hi timestamp",
    )
    rows = sorted(
        coalesce_intervals(iv, ["user_id"]).collect(),
        key=lambda r: (r["user_id"], r["island_lo"]),
    )
    assert [
        (r["user_id"], r["island_lo"], r["island_hi"], r["n_intervals"])
        for r in rows
    ] == [
        (1, _ts(0), _ts(3), 3),
        (1, _ts(5), _ts(6), 1),
        (2, _ts(0), _ts(1), 1),
    ]


def test_coalesce_intervals_contained_interval(spark):
    # an interval fully inside an earlier one must not split the island
    iv = spark.createDataFrame(
        [(1, 0, 100), (1, 10, 20), (1, 50, 150)],
        "user_id long, lo long, hi long",
    )
    rows = coalesce_intervals(iv, ["user_id"]).collect()
    assert [(r["island_lo"], r["island_hi"], r["n_intervals"]) for r in rows] == [
        (0, 150, 3)
    ]


def test_coalesce_intervals_tied_starts_deterministic(spark):
    iv = spark.createDataFrame(
        [(1, 0, 5), (1, 0, 9), (1, 9, 12), (1, 20, 21)],
        "user_id long, lo long, hi long",
    )
    rows = sorted(
        coalesce_intervals(iv, ["user_id"]).collect(), key=lambda r: r["island_lo"]
    )
    assert [(r["island_lo"], r["island_hi"], r["n_intervals"]) for r in rows] == [
        (0, 12, 3),
        (20, 21, 1),
    ]


# --- weighted_median ---


def test_weighted_median_hand_case(spark):
    # weights: 1@1, 1@2, 3@3 -> total 5, half-threshold at cum>=2.5 -> 3
    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 3)],
        "k string, v double, w long",
    )
    rows = weighted_median(df, ["k"], "v", "w").collect()
    assert rows[0]["weighted_median"] == 3.0


def test_weighted_median_even_split_lower(spark):
    # 2@10, 2@20: 2*cw=4 >= tw=4 at the 10s -> lower median 10
    df = spark.createDataFrame(
        [("g", 10.0, 2), ("g", 20.0, 2)], "k string, v double, w long"
    )
    assert weighted_median(df, ["k"], "v", "w").collect()[0]["weighted_median"] == 10.0


def test_weighted_median_matches_repeat_expansion(spark):
    # weighted median == plain median of weight-expanded rows
    import statistics

    data = [("a", float(v), w) for v, w in [(5, 3), (1, 2), (9, 1), (4, 4)]]
    df = spark.createDataFrame(data, "k string, v double, w long")
    got = weighted_median(df, ["k"], "v", "w").collect()[0]["weighted_median"]
    expanded = sorted([v for _, v, w in data for _ in range(w)])
    assert got == statistics.median_low(expanded)


def test_weighted_median_null_values_dropped(spark):
    # r11 (ADVICE): NULL values must not contribute weight to the group
    # total — Spark orders NULLS FIRST, DuckDB NULLS LAST, so a counted
    # NULL weight shifts the threshold differently per engine.  With the
    # filter, the NULL row (weight 100) is invisible: median of
    # {1.0 w1, 2.0 w1, 3.0 w1} = 2.0, not 1.0 (which a NULLS FIRST
    # cumulative including w=100 would select).
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 1), ("a", None, 100)],
        "k string, v double, w long",
    )
    rows = weighted_median(df, ["k"], "v", "w").collect()
    assert len(rows) == 1 and rows[0]["weighted_median"] == 2.0
    # all-NULL group disappears entirely
    df2 = spark.createDataFrame(
        [("b", None, 5), ("b", None, 7)], "k string, v double, w long"
    )
    assert weighted_median(df2, ["k"], "v", "w").count() == 0
