"""Round-10 third batch: prefix-filtered exact Jaccard join, funnels,
retention cohorts, bottom-k coordinated sampling."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from radohydro_spark.operators.behavior import funnel, retention_cohorts
from radohydro_spark.operators.dedup import jaccard_prefix_pairs, ngram_jaccard_pairs
from radohydro_spark.operators.sampling import bottom_k_sample


# --- jaccard_prefix_pairs ---


def _rand_corpus(seed: int, n_docs: int = 40, vocab: int = 12, length: int = 14):
    rng = random.Random(seed)
    rows = []
    for i in range(1, n_docs + 1):
        if i % 4 == 0:
            # near-dup of the previous doc: copy with one token changed
            base = rows[-1][1].split()
            base[rng.randrange(len(base))] = f"w{rng.randrange(vocab)}"
            rows.append((i, " ".join(base)))
        else:
            rows.append(
                (i, " ".join(f"w{rng.randrange(vocab)}" for _ in range(length)))
            )
    return rows


def _pairs(df):
    return {
        (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
    }


def test_prefix_join_matches_naive_exact(spark):
    for seed, t in [(1, 0.8), (2, 0.5), (3, 0.9)]:
        docs = spark.createDataFrame(
            _rand_corpus(seed), "doc_id long, text string"
        )
        naive = ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=t, max_doc_freq=None
        )
        fast = jaccard_prefix_pairs(docs, "text", "doc_id", k=3, threshold=t)
        assert _pairs(fast) == _pairs(naive), (seed, t)


def test_prefix_join_identical_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")],
        "doc_id long, text string",
    )
    got = _pairs(jaccard_prefix_pairs(docs, "text", "doc_id", threshold=1.0))
    assert got == {(1, 2, 1.0)}


def test_prefix_join_explodes_only_prefix(spark):
    # threshold 0.8 on a doc with 10 shingles -> prefix length 10-8+1=3
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12)))], "doc_id long, text string"
    )
    # no pairs (single doc) — just assert it runs and returns empty
    assert jaccard_prefix_pairs(docs, "text", "doc_id", threshold=0.8).count() == 0


# --- funnel ---


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), y) for u, m, y in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_hand_case(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
            (2, 0, "view"), (2, 3, "click"),
            (3, 0, "view"),
            (4, 5, "click"), (4, 9, "purchase"),  # no view: never enters
        ],
    )
    rows = funnel(ev, ["view", "click", "purchase"]).orderBy("step_idx").collect()
    assert [(r["step_idx"], r["step_name"], r["n_users"]) for r in rows] == [
        (0, "view", 3),
        (1, "click", 2),
        (2, "purchase", 1),
    ]


def test_funnel_order_is_strict(spark):
    # purchase BEFORE the first view does not count
    ev = _ev(spark, [(1, 5, "view"), (1, 2, "purchase")])
    rows = funnel(ev, ["view", "purchase"]).orderBy("step_idx").collect()
    assert [(r["step_name"], r["n_users"]) for r in rows] == [
        ("view", 1),
        ("purchase", 0),
    ]


def test_funnel_same_timestamp_not_counted(spark):
    # strictly-after semantics: simultaneous events do not advance
    ev = _ev(spark, [(1, 3, "view"), (1, 3, "purchase")])
    rows = funnel(ev, ["view", "purchase"]).orderBy("step_idx").collect()
    assert [(r["step_name"], r["n_users"]) for r in rows] == [
        ("view", 1),
        ("purchase", 0),
    ]


def test_funnel_uses_earliest_completion(spark):
    # first view at t=0; a click at t=1 counts even though a later view
    # (t=10) would not have a following click
    ev = _ev(spark, [(1, 0, "view"), (1, 1, "click"), (1, 10, "view")])
    rows = funnel(ev, ["view", "click"]).orderBy("step_idx").collect()
    assert [(r["step_name"], r["n_users"]) for r in rows] == [
        ("view", 1),
        ("click", 1),
    ]


# --- retention_cohorts ---


def test_retention_hand_case(spark):
    # user 1 first active week of Jan 1 (Mon), returns 2 weeks later;
    # user 2 same cohort, never returns; user 3 cohort of Jan 8
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 14 * 24 * 60, "view"),
            (2, 60, "view"),
            (3, 7 * 24 * 60, "view"),
        ],
    )
    rows = retention_cohorts(ev).orderBy("cohort_period", "periods_later").collect()
    got = [
        (str(r["cohort_period"]), r["periods_later"], r["n_users"]) for r in rows
    ]
    assert got == [
        ("2024-01-01", 0, 2),
        ("2024-01-01", 2, 1),
        ("2024-01-08", 0, 1),
    ]


def test_retention_user_counted_once_per_period(spark):
    ev = _ev(spark, [(1, 0, "view"), (1, 10, "click"), (1, 20, "view")])
    rows = retention_cohorts(ev).collect()
    assert [(r["periods_later"], r["n_users"]) for r in rows] == [(0, 1)]


def test_retention_month_bucket(spark):
    ev = _ev(spark, [(1, 0, "view"), (1, 40 * 24 * 60, "view")])
    rows = retention_cohorts(ev, bucket="month").orderBy("periods_later").collect()
    got = [(str(r["cohort_period"]), r["periods_later"], r["n_users"]) for r in rows]
    assert got == [("2024-01-01", 0, 1), ("2024-01-01", 1, 1)]


# --- bottom_k_sample ---


def test_bottom_k_deterministic_and_nested(spark):
    df = spark.range(1, 500).withColumnRenamed("id", "k")
    s10 = {r["k"] for r in bottom_k_sample(df, "k", 10).collect()}
    s10b = {r["k"] for r in bottom_k_sample(df, "k", 10).collect()}
    s50 = {r["k"] for r in bottom_k_sample(df, "k", 50).collect()}
    assert s10 == s10b and len(s10) == 10 and len(s50) == 50
    assert s10 <= s50  # bottom-k nesting: growing k extends the sample


def test_bottom_k_coordinated_across_tables(spark):
    # two different tables over the same key domain pick the same keys
    a = spark.range(1, 300).withColumnRenamed("id", "k")
    b = spark.range(1, 300).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("other")
    )
    ka = {r["k"] for r in bottom_k_sample(a, "k", 20).collect()}
    kb = {r["k"] for r in bottom_k_sample(b, "k", 20).collect()}
    assert ka == kb


def test_bottom_k_plan_is_take_ordered(spark):
    df = spark.range(1, 10_000).withColumnRenamed("id", "k")
    plan = bottom_k_sample(df, "k", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --- exact_quantiles ---

from radohydro_spark.operators.sketch import exact_quantiles


def _eq_ref(vals, num, den):
    # type-1 quantile: value at rank ceil(phi*N), 1-indexed
    s = sorted(vals)
    rank = -(-(len(s) * num) // den)
    return s[rank - 1]


def test_exact_quantiles_matches_rank_definition(spark):
    rng = random.Random(11)
    vals = [rng.uniform(-100, 100) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(16)
    fr = [(1, 100), (1, 2), (9, 10), (99, 100), (1, 1)]
    got = {
        (r["num"], r["den"]): r["value"]
        for r in exact_quantiles(df, "x", fr, sample_stride=37).collect()
    }
    for num, den in fr:
        assert got[(num, den)] == _eq_ref(vals, num, den), (num, den)


def test_exact_quantiles_hot_duplicate_value(spark):
    # one value dominating the distribution: the duplicate run must not
    # be collected (the hi-fallback path) and the answer is exact
    vals = [1.0] * 5 + [42.0] * 9000 + [99.0] * 5
    rng = random.Random(3)
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    got = {
        (r["num"], r["den"]): r["value"]
        for r in exact_quantiles(df, "x", [(1, 2), (999, 1000)], sample_stride=50).collect()
    }
    assert got[(1, 2)] == 42.0
    assert got[(999, 1000)] == _eq_ref(vals, 999, 1000)


def test_exact_quantiles_integer_column_and_nulls(spark):
    df = spark.createDataFrame(
        [(v,) for v in [3, 1, 2, None, 5, 4, None]], "x long"
    )
    got = {
        (r["num"], r["den"]): r["value"]
        for r in exact_quantiles(df, "x", [(1, 2), (1, 1)], sample_stride=2).collect()
    }
    assert got[(1, 2)] == 3  # N=5 non-null, rank ceil(2.5)=3 -> value 3
    assert got[(1, 1)] == 5


def test_exact_quantiles_stride_one_and_large(spark):
    vals = list(range(1, 101))
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").repartition(4)
    for stride in (1, 1000):
        got = exact_quantiles(df, "x", [(1, 4)], sample_stride=stride).collect()
        assert got[0]["value"] == 25.0


# --- greedy_max_coverage ---

from radohydro_spark.operators.sampling import greedy_max_coverage


def _gmc(spark, rows, k, shingle_k=1):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return [
        (r["sel_round"], r["doc_id"], r["gain"])
        for r in greedy_max_coverage(df, "text", "doc_id", k, shingle_k=shingle_k)
        .orderBy("sel_round")
        .collect()
    ]


def test_greedy_coverage_hand_case(spark):
    # doc 1 covers {a,b,c}; doc 2 {c,d}; doc 3 {a,b}. Greedy: 1 (gain 3),
    # then 2 (gain 1: d), then stop (3 adds nothing)
    rows = [(1, "a b c"), (2, "c d"), (3, "a b")]
    assert _gmc(spark, rows, 3) == [(1, 1, 3), (2, 2, 1)]


def test_greedy_coverage_tie_breaks_on_doc_id(spark):
    rows = [(7, "x y"), (3, "p q"), (9, "x y")]
    got = _gmc(spark, rows, 2)
    # round 1: all gain 2, min doc_id 3 wins; round 2: 7 beats 9
    assert got == [(1, 3, 2), (2, 7, 2)]


def test_greedy_coverage_submodular_gains_nonincreasing(spark):
    rng = random.Random(5)
    rows = [
        (i, " ".join(f"t{rng.randrange(40)}" for _ in range(15)))
        for i in range(1, 30)
    ]
    got = _gmc(spark, rows, 6)
    gains = [g for _, _, g in got]
    assert gains == sorted(gains, reverse=True)  # submodularity
    assert len({d for _, d, _ in got}) == len(got)  # no repicks


def test_greedy_coverage_matches_python_reference(spark):
    rng = random.Random(9)
    rows = [
        (i, " ".join(f"t{rng.randrange(25)}" for _ in range(10)))
        for i in range(1, 20)
    ]
    sets = {i: set(t.split()) for i, t in rows}
    covered, ref = set(), []
    for rnd in range(1, 5):
        best = max(
            ((d, len(s - covered)) for d, s in sets.items() if d not in {x[1] for x in ref}),
            key=lambda x: (x[1], -x[0]),
        )
        if best[1] == 0:
            break
        ref.append((rnd, best[0], best[1]))
        covered |= sets[best[0]]
    assert _gmc(spark, rows, 4) == ref


# --- time_weighted_avg ---

from radohydro_spark.operators.aggregate import time_weighted_avg


def test_twap_hand_case(spark):
    # user 1: value 10 held 60s, value 20 held 30s, last sample dropped
    # -> (10*60 + 20*30) / 90 = 13.333333
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
            (1, dt.datetime(2024, 1, 1, 0, 1, 0), 20.0),
            (1, dt.datetime(2024, 1, 1, 0, 1, 30), 99.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = time_weighted_avg(df, ["user_id"], "ts", "value").collect()
    assert [(r["user_id"], r["twa"], r["total_seconds"]) for r in rows] == [
        (1, 13.333333, 90)
    ]


def test_twap_single_sample_key_excluded(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 5.0)], "user_id long, ts timestamp, value double"
    )
    assert time_weighted_avg(df, ["user_id"], "ts", "value").count() == 0


def test_twap_duration_weighting_beats_sample_count(spark):
    # 1 hour at value 100, then 10 rapid samples at value 0 (1s apart):
    # the chatty samples contribute 10s of weight, not 10 "votes"
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 100.0)] + [
        (1, base + dt.timedelta(hours=1, seconds=i), 0.0) for i in range(11)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = time_weighted_avg(df, ["user_id"], "ts", "value").collect()[0]
    assert out["total_seconds"] == 3610
    assert out["twa"] == round(100.0 * 3600 / 3610, 6)


def test_twap_timestamp_ties_deterministic(spark):
    # two samples at the identical timestamp: the smaller value gets the
    # zero-duration slot by the (ts, value) total order — result stable
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 7.0),
        (1, base, 3.0),
        (1, base + dt.timedelta(seconds=10), 1.0),
    ]
    for _ in range(2):
        out = time_weighted_avg(
            spark.createDataFrame(rows, "user_id long, ts timestamp, value double"),
            ["user_id"],
            "ts",
            "value",
        ).collect()[0]
        assert (out["twa"], out["total_seconds"]) == (7.0, 10)


def test_greedy_coverage_string_ids(spark):
    # r11 (ADVICE): the result/picked-doc frames must derive the id type
    # from the input schema — string doc ids crashed the hardcoded
    # 'doc_id long' schema despite the generic id_col parameter.
    df = spark.createDataFrame(
        [("d-one", "a b c"), ("d-two", "c d"), ("d-three", "a b")],
        "doc_id string, text string",
    )
    got = [
        (r["sel_round"], r["doc_id"], r["gain"])
        for r in greedy_max_coverage(df, "text", "doc_id", 3, shingle_k=1)
        .orderBy("sel_round")
        .collect()
    ]
    assert got == [(1, "d-one", 3), (2, "d-two", 1)]
    out_schema = greedy_max_coverage(df, "text", "doc_id", 1, shingle_k=1).schema
    assert out_schema["doc_id"].dataType.simpleString() == "string"


def test_exact_quantiles_multi_fraction_shares_one_pass3_scan(spark):
    # r11 (ADVICE): pass 3 collects ALL bracketing intervals in one
    # union-filter scan.  Correctness of many fractions at once against
    # the rank definition (including duplicates straddling candidates).
    vals = sorted([i % 97 for i in range(1, 1201)])
    df = spark.createDataFrame([(v,) for v in vals], "x int").repartition(7)
    fracs = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100), (1, 1)]
    got = {
        (r["num"], r["den"]): r["value"]
        for r in exact_quantiles(df, "x", fracs, sample_stride=31).collect()
    }
    n = len(vals)
    for num, den in fracs:
        rank = -(-(n * num) // den)
        assert got[(num, den)] == vals[rank - 1], (num, den)


# --- overlap_pairs (r11) ---

from radohydro_spark.operators.dedup import overlap_pairs


def test_overlap_pairs_matches_bruteforce(spark):
    def brute(rows, k, c):
        import itertools

        sh = {}
        for i, t in rows:
            toks = t.split()
            sh[i] = {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
        out = {}
        for a, b in itertools.combinations(sorted(sh), 2):
            n = len(sh[a] & sh[b])
            if n >= c:
                out[(a, b)] = n
        return out

    for seed, c in [(1, 3), (2, 5), (5, 2)]:
        rows = _rand_corpus(seed)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["n_common"]
            for r in overlap_pairs(df, "text", "doc_id", k=3, min_overlap=c).collect()
        }
        assert got == brute(rows, 3, c), (seed, c)


def test_overlap_pairs_absolute_count_survives_length_dilution(spark):
    # the motivating case: a 60-token quote inside a much longer document
    # shares ~58 3-shingles (caught by count) though its Jaccard is tiny
    quote = " ".join(f"q{i}" for i in range(60))
    filler = " ".join(f"f{i}" for i in range(900))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote)], "doc_id long, text string"
    )
    rows = overlap_pairs(df, "text", "doc_id", k=3, min_overlap=50).collect()
    assert len(rows) == 1 and rows[0]["n_common"] == 58
    # and the Jaccard twin at any reasonable threshold misses it
    j = jaccard_prefix_pairs(df, "text", "doc_id", k=3, threshold=0.5).collect()
    assert j == []


def test_overlap_pairs_drops_small_sets_early(spark):
    # a doc with fewer than min_overlap shingles can never qualify
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "a b c d e f g h i j k l")],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in overlap_pairs(df, "text", "doc_id", k=3, min_overlap=2).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 2, (2, 3): 2}
    got5 = overlap_pairs(df, "text", "doc_id", k=3, min_overlap=5).collect()
    assert got5 == []


def test_overlap_pairs_k1_token_sets_and_degenerate_bounds(spark):
    """r12: the k=1 path (shingles = the token set itself — the basket
    shape dedup_overlap_pairs_zipf runs) checked against brute force,
    plus the degenerate bounds: min_overlap=1 (prefix = every token)
    and an empty corpus."""
    import itertools
    import random

    rng = random.Random(31)
    rows = [
        (i, " ".join(sorted({f"p{rng.randrange(40)}" for _ in range(6)})))
        for i in range(1, 50)
    ]

    def brute(c):
        sh = {i: set(t.split()) for i, t in rows}
        return {
            (a, b): len(sh[a] & sh[b])
            for a, b in itertools.combinations(sorted(sh), 2)
            if len(sh[a] & sh[b]) >= c
        }

    for c in (1, 3):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["n_common"]
            for r in overlap_pairs(
                df, "text", "doc_id", k=1, min_overlap=c
            ).collect()
        }
        assert got == brute(c), c
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert overlap_pairs(empty, "text", "doc_id", k=1, min_overlap=2).collect() == []


# --- mmr_select (r11) ---

from radohydro_spark.operators.sampling import mmr_select


def test_mmr_prefers_diverse_over_redundant(spark):
    # q = [1,0]; 1 and 2 nearly aligned with q (twins), 3 diverse with
    # lower relevance.  Pure relevance (and MMR at high lambda) picks
    # both twins; at lambda=0.3 the second twin's ~1.0 redundancy to the
    # first crushes its score (3·0.99 − 7·1.0 < 3·0.50 − 7·0.61) and the
    # diverse vector wins round 2 — the hand-computable crossover.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.14]),   # twin A
        (2, [0.99, 0.141]),  # twin B
        (3, [0.5, 0.87]),    # diverse
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["sel_round"], r["vec_id"])
        for r in mmr_select(
            df, "embedding", "vec_id", query_id=0, k=2, lam_num=3, lam_den=10
        )
        .orderBy("sel_round")
        .collect()
    ]
    assert got[0][1] in (1, 2)
    assert got[1][1] == 3
    # at high lambda the same corpus yields relevance-order (both twins)
    rel = [
        r["vec_id"]
        for r in mmr_select(
            df, "embedding", "vec_id", query_id=0, k=2, lam_num=9, lam_den=10
        )
        .orderBy("sel_round")
        .collect()
    ]
    assert set(rel) == {1, 2}


def test_mmr_round1_is_argmax_relevance_with_id_tiebreak(spark):
    rows = [
        (0, [1.0, 0.0]),
        (7, [0.8, 0.6]),
        (3, [0.8, 0.6]),   # same vector, smaller id wins the tie
        (9, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = mmr_select(df, "embedding", "vec_id", query_id=0, k=1).collect()
    assert len(got) == 1 and got[0]["vec_id"] == 3


def test_mmr_excludes_query_and_is_deterministic(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(25)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = [(r["sel_round"], r["vec_id"], r["score"])
         for r in mmr_select(df, "embedding", "vec_id", query_id=0, k=6).collect()]
    b = [(r["sel_round"], r["vec_id"], r["score"])
         for r in mmr_select(df, "embedding", "vec_id", query_id=0, k=6).collect()]
    assert a == b and len(a) == 6
    assert all(v != 0 for _, v, _ in a)          # query excluded
    assert len({v for _, v, _ in a}) == 6        # no repicks


# --- bm25_topk / rrf_fuse (r11) ---

from radohydro_spark.operators.retrieval import bm25_topk, rrf_fuse


def _bm25_ref(docs, queries, k1=1.2, b=0.75):
    import math

    toks = {d: t.split() for d, t in docs}
    lens = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(lens.values()) / float(n)
    df = {}
    for d, ts in toks.items():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtext in queries:
        for d, ts in toks.items():
            s = 0
            for t in sorted(set(qtext.split())):
                tf = ts.count(t)
                if tf == 0:
                    continue
                idf = math.log(1.0 + (float(n) - df[t] + 0.5) / (df[t] + 0.5))
                frac = tf * (k1 + 1.0) / (
                    tf + k1 * ((1.0 - b) + b * lens[d] / avgdl)
                )
                s += int(math.floor(idf * frac * 1e6 + 0.5))
            if s:
                out[(qid, d)] = s
    return out


def test_bm25_matches_python_reference(spark):
    rng = random.Random(17)
    docs = [
        (i, " ".join(f"t{rng.randrange(30)}" for _ in range(rng.randrange(5, 40))))
        for i in range(1, 60)
    ]
    queries = [(0, "t1 t2 t3"), (1, "t7 t9")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in bm25_topk(ddf, qdf, k=1000).collect()
    }
    assert got == _bm25_ref(docs, queries)


def test_bm25_rank_prefers_rare_terms_and_short_docs(spark):
    # 'rare' appears in one doc -> that doc must outrank docs matching
    # only the common term; among equal-tf docs the shorter wins
    docs = [
        (1, "common common filler filler filler filler"),
        (2, "common rare"),
        (3, "common " + " ".join(["pad"] * 20)),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame([(0, "common rare")], "query_id long, text string")
    rows = bm25_topk(ddf, qdf, k=3).orderBy("rank").collect()
    assert rows[0]["doc_id"] == 2          # rare-term match dominates
    ranks = {r["doc_id"]: r["rank"] for r in rows}
    assert ranks[1] < ranks[3]             # same terms, shorter doc wins


def test_rrf_fuse_hand_case_and_integer_scores(spark):
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (10, 2), (40, 3)], "doc_id long, rank int")
    rows = rrf_fuse([a, b], k=4).orderBy("fused_rank").collect()
    c = lambda r: 1_000_000 // (60 + r)
    expect = {
        10: c(1) + c(2),
        20: c(2) + c(1),
        30: c(3),
        40: c(3),
    }
    got = {r["doc_id"]: r["fused_score"] for r in rows}
    assert got == expect
    # 10 and 20 tie exactly (symmetric ranks) -> smaller id first
    assert [r["doc_id"] for r in rows] == [10, 20, 30, 40]


def test_rrf_single_ranking_is_identity_order(spark):
    a = spark.createDataFrame([(5, 1), (9, 2), (2, 3)], "doc_id long, rank int")
    rows = rrf_fuse([a], k=10).orderBy("fused_rank").collect()
    assert [r["doc_id"] for r in rows] == [5, 9, 2]


def test_bm25_boundary_margin_on_driver_corpora(spark):
    """r12 (VERDICT task 2): the ONE transcendental seam in the ledger —
    bm25_topk quantizes floor(ln(...)·frac·1e6 + 0.5) AFTER an ln that
    Spark (JVM Math.log) and DuckDB (libm) evaluate independently.  A
    1-ulp disagreement flips score_micro only if a contribution's
    pre-floor value sits within that ulp of an integer boundary; at
    these magnitudes (x ≤ ~3e7) the worst perturbation is x·2⁻⁵² ≈
    1e-8.  Pin the measured minimum boundary distance over EVERY scored
    contribution of the driver fixture (documents × _BM25_Q) above
    1e-6 at all three pinned scales — two orders of magnitude of
    headroom, so no ≤1-ulp engine pair can flip any score."""
    import __spark_entry__ as entrymod
    from radohydro_spark.operators.retrieval import bm25_boundary_margin

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet").select(
            "doc_id", "text"
        )
        qdf = spark.createDataFrame(
            entrymod._BM25_Q, "query_id long, text string"
        )
        m = bm25_boundary_margin(docs, qdf)
        assert m > 1e-6, (sf, m)


def test_tfidf_idf_boundary_margin_on_driver_corpora(spark):
    """r12: the BM25 seam-class twin in tfidf_cosine_pairs — iw
    quantizes round(ln((N+1)/(df+1))·1000) HALF_UP after a cross-engine
    ln.  The seam's entire input space is the corpus's distinct
    document frequencies; pin every idf point's distance from its
    k+0.5 rounding boundary above 1e-6 at all three pinned scales
    (worst 1-ulp ln perturbation at these magnitudes: ~1e-12)."""
    from radohydro_spark.operators.dedup import tfidf_idf_boundary_margin

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet").select(
            "doc_id", "text"
        )
        m = tfidf_idf_boundary_margin(docs)
        assert m > 1e-6, (sf, m)
