"""Round-16 sixth wave: the single-snapshot entropy diversity screen
(global + per-group), the mutual-information / lift association
diagram, the reference-decile PSI (production binning), and the
Benford first-digit screen."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------- entropy_by


def test_entropy_profile_python_replay(spark):
    from radohydro_spark.operators.profile import entropy_profile

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1 + [(None,)]
    df = spark.createDataFrame(rows, "cat string")
    got = {
        r["cat"]: r
        for r in entropy_profile(df, "cat").collect()
    }
    assert set(got) == {"a", "b", "c"}
    n = 10
    for cat, c in [("a", 6), ("b", 3), ("c", 1)]:
        p = c / n
        assert got[cat]["n"] == c
        assert got[cat]["p"] == round(p, 9)
        assert got[cat]["h_contrib"] == round(-(p * math.log(p)), 9)


def test_entropy_single_category_is_zero_not_negzero(spark):
    """p = 1 gives -(1·ln 1) = -0.0; the emitted double must hash as
    0.0 under the driver's +0.0 canonicalisation (both engines)."""
    from radohydro_spark.operators.profile import entropy_profile

    df = spark.createDataFrame([("x",)] * 4, "cat string")
    [r] = entropy_profile(df, "cat").collect()
    assert r["p"] == 1.0
    assert r["h_contrib"] + 0.0 == 0.0


def test_entropy_by_single_group_pins_global(spark):
    from radohydro_spark.operators.profile import (
        entropy_by,
        entropy_profile,
    )

    rows = [("g", c) for c in ["a", "a", "b", "b", "b", "c"]]
    df = spark.createDataFrame(rows, "g string, cat string")
    via_by = {
        (r["cat"],): (r["n"], r["p"], r["h_contrib"])
        for r in entropy_by(df, "cat", ["g"]).collect()
    }
    via_global = {
        (r["cat"],): (r["n"], r["p"], r["h_contrib"])
        for r in entropy_profile(df, "cat").collect()
    }
    assert via_by == via_global


def test_entropy_by_null_group_and_cat_excluded(spark):
    from radohydro_spark.operators.profile import entropy_by

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), (None, "a"), ("h", "b")],
        "g string, cat string",
    )
    got = entropy_by(df, "cat", ["g"]).collect()
    assert {(r["g"], r["cat"]) for r in got} == {("g", "a"), ("h", "b")}
    # each surviving group has exactly one category -> p = 1
    assert all(r["p"] == 1.0 for r in got)


def test_entropy_by_empty_groups_raises_named(spark):
    from radohydro_spark.operators.profile import entropy_by

    df = spark.createDataFrame([("a",)], "cat string")
    with pytest.raises(ValueError, match="entropy_by.*group_cols"):
        entropy_by(df, "cat", [])


# ------------------------------------------------------ mutual_info


def test_mutual_info_independent_is_zero(spark):
    """A perfectly product-form table: every cell's lift is 1 and
    mi_contrib is exactly ln(1) = 0 (no tolerance needed — the doubles
    divide to exact dyadic proportions)."""
    from radohydro_spark.operators.profile import mutual_info

    rows = []
    for x, rx in [("x1", 1), ("x2", 1)]:
        for y, ry in [("y1", 1), ("y2", 3)]:
            rows += [(x, y)] * (rx * ry)
    df = spark.createDataFrame(rows, "x string, y string")
    got = mutual_info(df, "x", "y").collect()
    assert len(got) == 4
    for r in got:
        assert r["lift"] == 1.0
        assert r["mi_contrib"] + 0.0 == 0.0


def test_mutual_info_python_replay_dependent(spark):
    from radohydro_spark.operators.profile import mutual_info

    rows = [("a", "p")] * 4 + [("a", "q")] * 1 + [("b", "q")] * 5
    df = spark.createDataFrame(rows, "x string, y string")
    got = {(r["x_cat"], r["y_cat"]): r for r in mutual_info(df, "x", "y").collect()}
    n = 10
    marg_x = {"a": 5, "b": 5}
    marg_y = {"p": 4, "q": 6}
    cells = {("a", "p"): 4, ("a", "q"): 1, ("b", "q"): 5}
    assert set(got) == set(cells)
    for (x, y), c in cells.items():
        p_xy, p_x, p_y = c / n, marg_x[x] / n, marg_y[y] / n
        r = got[(x, y)]
        assert r["n_xy"] == c and r["n_x"] == marg_x[x] and r["n_y"] == marg_y[y]
        assert r["lift"] == round(p_xy / (p_x * p_y), 9)
        assert r["mi_contrib"] == round(
            p_xy * math.log(p_xy / (p_x * p_y)), 9
        )


def test_mutual_info_null_rows_excluded(spark):
    from radohydro_spark.operators.profile import mutual_info

    df = spark.createDataFrame(
        [("a", "p"), ("a", None), (None, "p")], "x string, y string"
    )
    got = mutual_info(df, "x", "y").collect()
    assert len(got) == 1 and got[0]["n_xy"] == 1 and got[0]["n_x"] == 1


# ------------------------------------------------- psi_quantile_bins


def _psi_contrib(n_old, n_new, tot_o, tot_n, eps=1e-6):
    p_o = max(n_old / tot_o, eps)
    p_n = max(n_new / tot_n, eps)
    return round((p_o - p_n) * math.log(p_o / p_n), 9)


def test_psi_qbins_uniform_reference_fills_all_buckets(spark):
    """Old = 1..100 exactly once: decile edges are 10, 20, ..., 90 by
    the lower-boundary law, so each bucket holds exactly 10 old rows;
    an identical new snapshot drifts nowhere."""
    from radohydro_spark.operators.profile import psi_quantile_bins

    old = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
    got = {
        r["bucket"]: r
        for r in psi_quantile_bins(old, old, "v", n_bins=10).collect()
    }
    assert set(got) == set(range(10))
    for b, r in got.items():
        assert r["n_old"] == 10 and r["n_new"] == 10
        assert r["psi_contrib"] + 0.0 == 0.0


def test_psi_qbins_new_clamps_into_edge_buckets(spark):
    from radohydro_spark.operators.profile import psi_quantile_bins

    old = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
    new = spark.createDataFrame([(-5,), (0,), (1000,)], "v long")
    got = {
        r["bucket"]: r
        for r in psi_quantile_bins(old, new, "v", n_bins=10).collect()
    }
    # below-support values -> bucket 0; above-support -> bucket 9
    assert got[0]["n_new"] == 2
    assert got[9]["n_new"] == 1
    assert got[0]["psi_contrib"] == _psi_contrib(10, 2, 100, 3)
    assert got[5]["psi_contrib"] == _psi_contrib(10, 0, 100, 3)


def test_psi_qbins_point_mass_merges_buckets_deterministically(spark):
    """90% of old mass on one value: most decile edges coincide, the
    comparison bucket law merges them, and the bucket ids stay stable
    (no empty phantom rows, no float wobble)."""
    from radohydro_spark.operators.profile import psi_quantile_bins

    rows = [(5,)] * 90 + [(i,) for i in range(6, 16)]
    old = spark.createDataFrame(rows, "v long")
    got = psi_quantile_bins(old, old, "v", n_bins=10).collect()
    buckets = {r["bucket"] for r in got}
    # v = 5 fails every "v > edge" test (all inner edges >= 5) -> bucket 0
    assert 0 in buckets
    assert sum(r["n_old"] for r in got) == 100
    by = {r["bucket"]: r for r in got}
    assert by[0]["n_old"] == 90


def test_psi_qbins_bad_bins_raises_named(spark):
    from radohydro_spark.operators.profile import psi_quantile_bins

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="psi_quantile_bins.*n_bins"):
        psi_quantile_bins(df, df, "v", n_bins=1)


def test_psi_qbins_output_contract_matches_psi_drift(spark):
    from radohydro_spark.operators.profile import (
        psi_drift,
        psi_quantile_bins,
    )

    df = spark.createDataFrame([(i,) for i in range(1, 21)], "v long")
    a = psi_drift(df, df, "v")
    b = psi_quantile_bins(df, df, "v")
    assert a.columns == b.columns


# ---------------------------------------------------- benford_digits


def test_benford_digits_python_replay(spark):
    from radohydro_spark.operators.profile import benford_digits

    vals = [1.5, 19.0, 123.4, 2.0, 29.99, 999.0, 3.14]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["digit"]: r for r in benford_digits(df, "v").collect()}
    counts = {1: 3, 2: 2, 9: 1, 3: 1}
    assert set(got) == set(counts)
    total = 7
    for d, c in counts.items():
        r = got[d]
        p_ben = math.log(1.0 + 1.0 / d) / math.log(10.0)
        p_obs = c / total
        diff = p_obs - p_ben
        assert r["n"] == c
        assert r["share_ppm"] == (1_000_000 * c) // total
        assert r["p_benford"] == round(p_ben, 9)
        assert r["chi2_contrib"] == round(total * (diff * diff) / p_ben, 9)


def test_benford_digits_excludes_sub_one_and_null(spark):
    from radohydro_spark.operators.profile import benford_digits

    df = spark.createDataFrame(
        [(0.7,), (0.0,), (-123.0,), (None,), (42.0,)], "v double"
    )
    got = benford_digits(df, "v").collect()
    assert len(got) == 1
    assert got[0]["digit"] == 4 and got[0]["n"] == 1


def test_benford_digits_perfect_benford_zero_chi2(spark):
    """Feed exact Benford-proportioned counts scaled so p_obs lands on
    the same doubles? It cannot (ln ratios are irrational) — instead
    assert monotonicity: the canonical 30.1%/17.6%/12.5% shape yields
    tiny contribs while an anti-Benford (uniform) shape yields large
    ones for digit 1."""
    from radohydro_spark.operators.profile import benford_digits

    uniform = spark.createDataFrame(
        [(float(d) * 10,) for d in range(1, 10)], "v double"
    )
    got = {r["digit"]: r for r in benford_digits(uniform, "v").collect()}
    # digit 1 expected at 30.1% but observed 11.1% -> the largest gap
    assert got[1]["chi2_contrib"] == max(
        r["chi2_contrib"] for r in got.values()
    )


# -------------------------------------------------------- vocab_growth


def test_vocab_growth_python_replay(spark):
    from radohydro_spark.functions.text import vocab_growth

    docs = [
        (0, "the cat"),
        (1, "the dog"),
        (2, "a cat and a dog"),
        (3, "new words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["bucket"]: r for r in vocab_growth(df, n_buckets=2).collect()}
    # max_id = 3 -> bucket = id*2 div 4: ids 0,1 -> 0; ids 2,3 -> 1
    assert set(got) == {0, 1}
    assert got[0]["n_docs"] == 2 and got[1]["n_docs"] == 2
    assert got[0]["n_tokens"] == 4 and got[1]["n_tokens"] == 8
    # prefix 0 vocab: {the, cat, dog} = 3; bucket 1 adds {a, and, new,
    # words, here} = 5
    assert got[0]["vocab_new"] == 3 and got[1]["vocab_new"] == 5
    assert got[1]["vocab_cum"] == 8 and got[1]["tokens_cum"] == 12
    assert got[1]["docs_cum"] == 4


def test_vocab_growth_prefix_exactness(spark):
    """vocab_cum at bucket b must equal the distinct-token count of the
    corpus prefix through b, computed independently."""
    from radohydro_spark.functions.text import vocab_growth

    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choices(words, k=rng.randint(1, 8))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n_buckets = 5
    got = {r["bucket"]: r for r in vocab_growth(df, n_buckets=5).collect()}
    mx = 24
    for b, r in got.items():
        prefix_vocab = set()
        for i, text in docs:
            if (i * n_buckets) // (mx + 1) <= b:
                prefix_vocab.update(
                    t.lower() for t in text.split() if t
                )
        assert r["vocab_cum"] == len(prefix_vocab), f"bucket {b}"


def test_vocab_growth_null_rows_excluded(spark):
    from radohydro_spark.functions.text import vocab_growth

    df = spark.createDataFrame(
        [(0, "x y"), (1, None), (None, "z"), (3, "x")],
        "doc_id long, text string",
    )
    got = vocab_growth(df, n_buckets=2).collect()
    assert sum(r["n_docs"] for r in got) == 2
    assert max(r["vocab_cum"] for r in got) == 2  # {x, y}


def test_vocab_growth_bad_buckets_raises_named(spark):
    from radohydro_spark.functions.text import vocab_growth

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_growth.*n_buckets"):
        vocab_growth(df, n_buckets=1)


# --------------------------------------- stream_key_counts / top_k_slice


def test_stream_key_counts_equals_batch(spark, tmp_path):
    """availableNow drain == batch groupBy(window, key).count()
    row-for-row (no hashing, no sketch — the exact-count contract)."""
    import datetime

    from radohydro_spark.streaming import (
        run_available_now,
        stream_key_counts,
    )

    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(minutes=11 * i), f"k{i % 4}")
        for i in range(50)
    ]
    src = tmp_path / "src"
    spark.createDataFrame(rows, "ts timestamp, k string").write.parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema("ts timestamp, k string").parquet(str(src))
    )
    out = run_available_now(
        stream_key_counts(stream, "ts", "k", "1 hour", watermark="1 hour"),
        "t_stream_keycounts",
        str(tmp_path / "ck"),
        "complete",
    ).collect()
    got = {(r.ts, r.value): r.cnt for r in out}
    want: dict = {}
    for ts, k in rows:
        w = ts.replace(minute=0, second=0)
        want[(w, k)] = want.get((w, k), 0) + 1
    assert got == want


def test_top_k_slice_tie_law_and_ppm(spark):
    import datetime

    from radohydro_spark.streaming import top_k_slice

    w = datetime.datetime(2024, 3, 1)
    rows = [
        (w, "b", 5),
        (w, "a", 5),
        (w, "c", 7),
        (w, "d", 3),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value string, cnt long")
    got = top_k_slice(df, k=3).orderBy("rank").collect()
    # ties at cnt=5 break by value ASC: a before b
    assert [(r["rank"], r["value"]) for r in got] == [
        (1, "c"),
        (2, "a"),
        (3, "b"),
    ]
    n = 20
    assert [r["share_ppm"] for r in got] == [
        (1_000_000 * 7) // n,
        (1_000_000 * 5) // n,
        (1_000_000 * 5) // n,
    ]


def test_top_k_slice_bad_k_raises_named(spark):
    import datetime

    from radohydro_spark.streaming import top_k_slice

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 1), "a", 1)],
        "ts timestamp, value string, cnt long",
    )
    with pytest.raises(ValueError, match="top_k_slice: k"):
        top_k_slice(df, k=0)


def test_stream_key_counts_null_keys_excluded(spark, tmp_path):
    import datetime

    from radohydro_spark.streaming import (
        run_available_now,
        stream_key_counts,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = [(base, "a"), (base, None), (base, "a")]
    src = tmp_path / "src"
    spark.createDataFrame(rows, "ts timestamp, k string").write.parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema("ts timestamp, k string").parquet(str(src))
    )
    out = run_available_now(
        stream_key_counts(stream, "ts", "k", "1 day", watermark="1 hour"),
        "t_stream_keycounts_null",
        str(tmp_path / "ck"),
        "complete",
    ).collect()
    assert [(r.value, r.cnt) for r in out] == [("a", 2)]


# ------------------------------------------------------------ ttest_by


def _welch(xs, ys):
    n1, n2 = len(xs), len(ys)
    s1, s2 = float(sum(xs)), float(sum(ys))
    sxx1 = float(sum(v * v for v in xs))
    sxx2 = float(sum(v * v for v in ys))
    m1, m2 = s1 / n1, s2 / n2
    v1 = max(sxx1 - n1 * m1 * m1, 0.0) / (n1 - 1.0)
    v2 = max(sxx2 - n2 * m2 * m2, 0.0) / (n2 - 1.0)
    se2 = v1 / n1 + v2 / n2
    t = (m2 - m1) / math.sqrt(se2)
    dfw = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - 1.0)
        + (v2 / n2) * (v2 / n2) / (n2 - 1.0)
    )
    return m1, m2, t, dfw


def test_ttest_by_python_replay(spark):
    from radohydro_spark.operators.profile import ttest_by

    xs = [1.00, 2.00, 3.00, 4.00]          # cents: 100..400
    ys = [2.50, 3.50, 4.50]                # cents: 250..450
    old = spark.createDataFrame([("g", v) for v in xs], "g string, v double")
    new = spark.createDataFrame([("g", v) for v in ys], "g string, v double")
    [r] = ttest_by(old, new, "v", ["g"]).collect()
    cx = [round(v * 100) for v in xs]
    cy = [round(v * 100) for v in ys]
    m1, m2, t, dfw = _welch(cx, cy)
    assert r["n_old"] == 4 and r["n_new"] == 3
    assert r["mean_old"] == round(m1 / 100.0, 9)
    assert r["mean_new"] == round(m2 / 100.0, 9)
    assert r["mean_diff"] == round((m2 - m1) / 100.0, 9)
    assert r["t_stat"] == round(t, 9)
    assert r["welch_df"] == round(dfw, 9)


def test_ttest_by_degenerate_groups_null_stats(spark):
    from radohydro_spark.operators.profile import ttest_by

    old = spark.createDataFrame(
        [("one_sided", 1.0), ("tiny", 1.0), ("const", 5.0), ("const", 5.0)],
        "g string, v double",
    )
    new = spark.createDataFrame(
        [("tiny", 2.0), ("tiny", 3.0), ("const", 5.0), ("const", 5.0)],
        "g string, v double",
    )
    got = {r["g"]: r for r in ttest_by(old, new, "v", ["g"]).collect()}
    # one-sided: group exists, new side empty -> means/diff/t all gated
    r = got["one_sided"]
    assert r["n_new"] == 0 and r["mean_new"] is None
    assert r["mean_diff"] is None and r["t_stat"] is None
    # n1 = 1 < 2 -> t/df NULL but both means report
    r = got["tiny"]
    assert r["mean_old"] == 1.0 and r["mean_new"] == 2.5
    assert r["t_stat"] is None and r["welch_df"] is None
    # constant on both sides -> se2 == 0 -> NULL t
    r = got["const"]
    assert r["t_stat"] is None and r["mean_diff"] == 0.0


def test_ttest_by_empty_groups_raises_named(spark):
    from radohydro_spark.operators.profile import ttest_by

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="ttest_by.*group_cols"):
        ttest_by(df, df, "v", [])


# ------------------------------------------------------ mutual_info_by


def test_mutual_info_by_single_group_pins_global(spark):
    from radohydro_spark.operators.profile import (
        mutual_info,
        mutual_info_by,
    )

    rows = [("g", x, y) for x, y in
            [("a", "p")] * 3 + [("a", "q")] * 2 + [("b", "p")] * 1]
    df = spark.createDataFrame(rows, "g string, x string, y string")
    via_by = {
        (r["x_cat"], r["y_cat"]): (
            r["n_xy"], r["n_x"], r["n_y"], r["lift"], r["mi_contrib"]
        )
        for r in mutual_info_by(df, "x", "y", ["g"]).collect()
    }
    via_global = {
        (r["x_cat"], r["y_cat"]): (
            r["n_xy"], r["n_x"], r["n_y"], r["lift"], r["mi_contrib"]
        )
        for r in mutual_info(df, "x", "y").collect()
    }
    assert via_by == via_global


def test_mutual_info_by_groups_isolated(spark):
    """Marginals must come from the row's own group only."""
    from radohydro_spark.operators.profile import mutual_info_by

    rows = [("g1", "a", "p")] * 4 + [("g2", "a", "q")] * 6
    df = spark.createDataFrame(rows, "g string, x string, y string")
    got = {(r["g"], r["x_cat"], r["y_cat"]): r
           for r in mutual_info_by(df, "x", "y", ["g"]).collect()}
    assert got[("g1", "a", "p")]["n_x"] == 4
    assert got[("g2", "a", "q")]["n_x"] == 6
    assert all(r["lift"] == 1.0 for r in got.values())


def test_mutual_info_by_empty_groups_raises_named(spark):
    from radohydro_spark.operators.profile import mutual_info_by

    df = spark.createDataFrame([("g", "a", "p")], "g string, x string, y string")
    with pytest.raises(ValueError, match="mutual_info_by.*group_cols"):
        mutual_info_by(df, "x", "y", [])


# -------------------------------------------------------- schema_drift


def test_schema_drift_status_laws(spark):
    from radohydro_spark.operators.profile import schema_drift

    old = spark.createDataFrame(
        [(1, "x", None), (2, "y", 5.0)], "k long, s string, gone double"
    )
    new = spark.createDataFrame(
        [(1, "x", 7), (2, "z", 8), (3, None, 9)],
        "k long, s string, fresh long",
    )
    got = {r["column"]: r for r in schema_drift(old, new).collect()}
    assert got["gone"]["status"] == "removed"
    assert got["fresh"]["status"] == "added"
    # k: nulls 0/0, min 1/1, max 2/3 -> changed
    assert got["k"]["status"] == "changed"
    # s: null ppm 0 -> 333333, max y -> z -> changed
    assert got["s"]["status"] == "changed"
    assert got["s"]["null_ppm_old"] == 0
    assert got["s"]["null_ppm_new"] == (1_000_000 * 1) // 3


def test_schema_drift_stable_column(spark):
    from radohydro_spark.operators.profile import schema_drift

    old = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    new = spark.createDataFrame(
        [(1,), (2,), (2,), (1,), (2,), (None,), (None,)], "k long"
    )
    # ppm old = 333333, ppm new = 2/7 -> 285714 -> changed
    [r] = schema_drift(old, new).collect()
    assert r["status"] == "changed"
    # same null RATE via matching ppm -> stable
    old2 = spark.createDataFrame([(1,), (2,)], "k long")
    new2 = spark.createDataFrame([(1,), (2,), (2,), (1,)], "k long")
    [r2] = schema_drift(old2, new2).collect()
    assert r2["status"] == "stable"
    assert r2["n_distinct_old"] == 2 and r2["n_distinct_new"] == 2


def test_schema_drift_no_columns_raises_named(spark):
    from radohydro_spark.operators.profile import schema_drift

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="schema_drift"):
        schema_drift(df, df, ["missing"])


# -------------------------------------------------- label_propagation


def test_label_propagation_python_replay(spark):
    """Triangle {1,2,3} + pendant 4-3: replay the synchronous rounds
    by hand."""
    from radohydro_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )

    def lpa_py(adj, iters):
        labels = {n: n for n in adj}
        for _ in range(iters):
            new = {}
            for n, nbrs in adj.items():
                votes: dict = {}
                for m in nbrs:
                    votes[labels[m]] = votes.get(labels[m], 0) + 1
                new[n] = min(
                    votes, key=lambda lb: (-votes[lb], lb)
                ) if votes else labels[n]
            labels = new
        return labels

    adj = {1: {2, 3}, 2: {1, 3}, 3: {1, 2, 4}, 4: {3}}
    for iters in (1, 2, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(edges, iters=iters).collect()
        }
        assert got == lpa_py(adj, iters), f"iters={iters}"


def test_label_propagation_tie_breaks_to_smallest(spark):
    from radohydro_spark.operators.graph import label_propagation

    # node 3 sees labels {1, 2} once each -> takes 1
    edges = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iters=1).collect()
    }
    assert got[3] == 1


def test_label_propagation_self_loop_excluded(spark):
    from radohydro_spark.operators.graph import label_propagation

    # self-loop on 2 must not freeze it: neighbor 1's label wins
    edges = spark.createDataFrame([(2, 2), (1, 2)], "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iters=1).collect()
    }
    assert got[2] == 1


def test_label_propagation_bad_iters_raises_named(spark):
    from radohydro_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="label_propagation.*iters"):
        label_propagation(edges, iters=0)


# --------------------------------------------------- asof_join_nearest


def _ts(h, m=0, s=0):
    import datetime

    return datetime.datetime(2024, 5, 1, h, m, s)


def test_asof_nearest_picks_closest_either_direction(spark):
    from radohydro_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(13))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(9), "a"), ("u", _ts(10, 30), "b"), ("u", _ts(14), "c")],
        "k string, ts timestamp, tag string",
    )
    got = {
        r["id"]: r["tag_asof"]
        for r in asof_join_nearest(left, right, ["k"]).collect()
    }
    # 10:00 -> prior 9:00 (60 min) vs next 10:30 (30 min): next wins
    assert got[1] == "b"
    # 13:00 -> prior 10:30 (150) vs next 14:00 (60): next wins
    assert got[2] == "c"


def test_asof_nearest_tie_goes_backward_and_exact_match(spark):
    from radohydro_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, "u", _ts(12)), (2, "u", _ts(10))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(11), "before"), ("u", _ts(13), "after"),
         ("u", _ts(10), "exact")],
        "k string, ts timestamp, tag string",
    )
    got = {
        r["id"]: r["tag_asof"]
        for r in asof_join_nearest(left, right, ["k"]).collect()
    }
    # 12:00 -> db = df = 60 min: tie goes BACKWARD
    assert got[1] == "before"
    # right row exactly AT left.ts -> db = 0, wins as prior
    assert got[2] == "exact"


def test_asof_nearest_tolerance_gates_each_side(spark):
    from radohydro_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, "u", _ts(12))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(9), "far_prior"), ("u", _ts(12, 45), "near_next")],
        "k string, ts timestamp, tag string",
    )
    # tolerance 1h: prior (3h) invalid, next (45min) valid
    [r] = asof_join_nearest(
        left, right, ["k"], tolerance_s=3600
    ).collect()
    assert r["tag_asof"] == "near_next"
    # tolerance 10min: neither side valid -> NULLs
    [r2] = asof_join_nearest(
        left, right, ["k"], tolerance_s=600
    ).collect()
    assert r2["tag_asof"] is None and r2["ts_asof"] is None


def test_asof_nearest_no_right_rows_yields_nulls(spark):
    from radohydro_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, "u", _ts(12))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("other", _ts(12), "x")], "k string, ts timestamp, tag string"
    )
    [r] = asof_join_nearest(left, right, ["k"]).collect()
    assert r["tag_asof"] is None


def test_asof_nearest_agrees_with_backward_when_only_prior(spark):
    """With every right row before every left row, nearest must equal
    the plain backward asof_join."""
    from radohydro_spark.operators.asof import asof_join, asof_join_nearest

    left = spark.createDataFrame(
        [(i, "u", _ts(12, i)) for i in range(5)],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(8, i), f"t{i}") for i in range(3)],
        "k string, ts timestamp, tag string",
    )
    near = {
        r["id"]: (r["ts_asof"], r["tag_asof"])
        for r in asof_join_nearest(left, right, ["k"]).collect()
    }
    back = {
        r["id"]: (r["ts_asof"], r["tag_asof"])
        for r in asof_join(left, right, ["k"]).collect()
    }
    assert near == back


# -------------------------------------------------------- entropy_slice


def test_entropy_slice_matches_entropy_profile_law(spark):
    """A drained (ts, value, cnt) slice must reproduce entropy_profile
    run on the equivalent exploded rows, per window."""
    import datetime

    from radohydro_spark.operators.profile import entropy_profile
    from radohydro_spark.streaming import entropy_slice

    w1, w2 = datetime.datetime(2024, 3, 1), datetime.datetime(2024, 3, 2)
    slices = spark.createDataFrame(
        [(w1, "a", 6), (w1, "b", 3), (w1, "c", 1), (w2, "a", 2)],
        "ts timestamp, value string, cnt long",
    )
    got = {
        (r["ts"], r["value"]): (r["p"], r["h_contrib"])
        for r in entropy_slice(slices).collect()
    }
    rows_w1 = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    ref = {
        r["cat"]: (r["p"], r["h_contrib"])
        for r in entropy_profile(
            spark.createDataFrame(rows_w1, "cat string"), "cat"
        ).collect()
    }
    for v in ("a", "b", "c"):
        assert got[(w1, v)] == ref[v]
    # single-key window: p = 1, h = 0
    assert got[(w2, "a")] == (1.0, 0.0)


# ------------------------------------------- r16 review regression pins


def test_psi_qbins_rejects_past_edge_resolution(spark):
    """The integer-percent law has 99 inner edges; n_bins past 100
    would generate duplicate percents (ambiguous edge aliases) — the
    validator now names that cap (r16 review)."""
    from radohydro_spark.operators.profile import psi_quantile_bins

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="psi_quantile_bins.*2..100"):
        psi_quantile_bins(df, df, "v", n_bins=101)
    # the densest legal grid still works end-to-end
    big = spark.createDataFrame([(i,) for i in range(1, 1001)], "v long")
    got = psi_quantile_bins(big, big, "v", n_bins=100).collect()
    assert len(got) == 100
    assert all(r["psi_contrib"] + 0.0 == 0.0 for r in got)


def test_vocab_growth_huge_ids_raise_named(spark):
    """id*n_buckets past BIGINT must raise the named in-plan assert,
    not silently wrap the bucket law (r16 review)."""
    from radohydro_spark.functions.text import vocab_growth

    df = spark.createDataFrame(
        [(9_223_372_036_854_775_806, "x y")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="vocab_growth.*exact bucket"):
        vocab_growth(df, n_buckets=10).collect()


def test_asof_nearest_null_timestamps_total_law(spark):
    """NULL-ts left rows get NULL matches; NULL-ts right rows are
    excluded — no order-dependent leak through the window carries
    (r16 review)."""
    from radohydro_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, "u", None), (2, "u", _ts(12))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", None, "ghost"), ("u", _ts(11), "real")],
        "k string, ts timestamp, tag string",
    )
    got = {
        r["id"]: r["tag_asof"]
        for r in asof_join_nearest(left, right, ["k"]).collect()
    }
    assert got[1] is None      # NULL left ts -> no match
    assert got[2] == "real"    # NULL right ts never matches


def test_schema_drift_empty_side_null_ppm(spark):
    from radohydro_spark.operators.profile import schema_drift

    old = spark.createDataFrame([], "k long")
    new = spark.createDataFrame([(1,), (None,)], "k long")
    [r] = schema_drift(old, new).collect()
    assert r["n_rows_old"] == 0
    assert r["null_ppm_old"] is None
    assert r["null_ppm_new"] == 500_000
    assert r["status"] == "changed"


def test_shared_ppm_guard_raises_named(spark):
    """The one shared checked-ppm law (laws.py) raises its named
    assert past the 9e12 bound for every consumer."""
    import datetime

    from radohydro_spark.streaming import top_k_slice

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 1), "a", 9_000_000_000_001)],
        "ts timestamp, value string, cnt long",
    )
    with pytest.raises(Exception, match="top_k_slice.*ppm domain"):
        top_k_slice(df, k=1).collect()


def test_shared_ppm_guard_values_unchanged(spark):
    """The helper swap must not move a single share_ppm value."""
    from radohydro_spark.operators.sketch import heavy_hitters_by

    rows = [("g", v) for v in ["a"] * 7 + ["b"] * 3]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["value"]: r["share_ppm"]
           for r in heavy_hitters_by(df, "v", ["g"], k=2).collect()}
    assert got == {"a": 700_000, "b": 300_000}


# ------------------------------------------------ hypothesis property pins

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=-500, max_value=500), min_size=2,
             max_size=8),
    st.lists(st.integers(min_value=-500, max_value=500), min_size=2,
             max_size=8),
)
def test_ttest_by_property_python_replay(spark, xs, ys):
    """Welch law replay over arbitrary small integer samples (values
    are cents/100 so the quantization is exact)."""
    from radohydro_spark.operators.profile import ttest_by

    old = spark.createDataFrame(
        [("g", v / 100.0) for v in xs], "g string, v double"
    )
    new = spark.createDataFrame(
        [("g", v / 100.0) for v in ys], "g string, v double"
    )
    [r] = ttest_by(old, new, "v", ["g"]).collect()
    fx, fy = [float(v) for v in xs], [float(v) for v in ys]
    m1 = sum(fx) / len(fx)
    m2 = sum(fy) / len(fy)
    assert r["mean_old"] == round(m1 / 100.0, 9)
    assert r["mean_diff"] == round((m2 - m1) / 100.0, 9)
    se2_zero = len(set(xs)) == 1 and len(set(ys)) == 1
    if se2_zero:
        assert r["t_stat"] is None
    else:
        _, _, t, dfw = _welch(fx, fy)
        assert r["t_stat"] == round(t, 9)
        assert r["welch_df"] == round(dfw, 9)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
def test_top_k_slice_property_share_and_order(spark, pairs):
    """Shares are the exact floored ppm of each count; ranks follow
    (cnt DESC, value ASC); Σ share_ppm never exceeds 10^6."""
    import datetime

    from radohydro_spark.streaming import top_k_slice

    w = datetime.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [(w, v, c) for v, c in pairs], "ts timestamp, value string, cnt long"
    )
    got = top_k_slice(df, k=10).orderBy("rank").collect()
    total = sum(c for _, c in pairs)
    want_order = sorted(pairs, key=lambda t: (-t[1], t[0]))
    assert [r["value"] for r in got] == [v for v, _ in want_order]
    for r in got:
        c = dict(pairs)[r["value"]]
        assert r["share_ppm"] == (1_000_000 * c) // total
    assert sum(r["share_ppm"] for r in got) <= 1_000_000


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=2,
             max_size=12, unique=True)
)
def test_vocab_growth_property_totals(spark, ids):
    """Across any id set: Σ vocab_new = |distinct tokens|, Σ n_docs =
    |docs|, cumulative columns are the running sums, every bucket is in
    range."""
    from radohydro_spark.functions.text import vocab_growth

    docs = [(i, f"t{i % 7} shared") for i in ids]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = sorted(
        vocab_growth(df, n_buckets=4).collect(), key=lambda r: r["bucket"]
    )
    vocab = {f"t{i % 7}" for i in ids} | {"shared"}
    assert sum(r["vocab_new"] for r in rows) == len(vocab)
    assert sum(r["n_docs"] for r in rows) == len(ids)
    run_docs = run_vocab = 0
    for r in rows:
        assert 0 <= r["bucket"] < 4
        run_docs += r["n_docs"]
        run_vocab += r["vocab_new"]
        assert r["docs_cum"] == run_docs
        assert r["vocab_cum"] == run_vocab


# ------------------------------------------------------------ qq_table


def test_qq_table_python_replay(spark):
    from radohydro_spark.operators.profile import qq_table

    old = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
    new = spark.createDataFrame(
        [(i,) for i in range(1, 51)] + [(i * 10,) for i in range(5, 55)],
        "v long",
    )
    got = {r["percent"]: r for r in qq_table(old, new, "v").collect()}

    def disc(vals, q):
        vals = sorted(vals)
        n = len(vals)
        for i, v in enumerate(vals, 1):
            if 100 * i >= q * n:
                return v

    ov = list(range(1, 101))
    nv = list(range(1, 51)) + [i * 10 for i in range(5, 55)]
    for q in (1, 5, 10, 25, 50, 75, 90, 95, 99):
        r = got[q]
        assert r["q_old"] == disc(ov, q), q
        assert r["q_new"] == disc(nv, q), q
        assert r["diff"] == r["q_new"] - r["q_old"]


def test_qq_table_empty_side_reports_null(spark):
    from radohydro_spark.operators.profile import qq_table

    old = spark.createDataFrame([(i,) for i in range(10)], "v long")
    new = spark.createDataFrame([], "v long")
    got = qq_table(old, new, "v", qs=(50,)).collect()
    [r] = got
    assert r["q_old"] is not None
    assert r["q_new"] is None and r["diff"] is None


def test_qq_table_identical_sides_zero_diff(spark):
    from radohydro_spark.operators.profile import qq_table

    df = spark.createDataFrame([(i % 37,) for i in range(500)], "v long")
    got = qq_table(df, df, "v").collect()
    assert len(got) == 9
    assert all(r["diff"] == 0 for r in got)


def test_qq_table_bad_percents_raise_named(spark):
    from radohydro_spark.operators.profile import qq_table

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="qq_table: qs"):
        qq_table(df, df, "v", qs=(0,))


# ------------------------------------------------------ rare_categories


def test_rare_categories_threshold_law(spark):
    from radohydro_spark.operators.profile import rare_categories

    rows = [("g", "common")] * 990 + [("g", "rare")] * 9 + [("g", "one")]
    df = spark.createDataFrame(rows, "g string, cat string")
    got = {
        r["cat"]: r
        for r in rare_categories(df, "cat", ["g"], max_ppm=10_000).collect()
    }
    # rare: 9/1000 = 9000 ppm < 10000; one: 1000 ppm; common: 990000
    assert set(got) == {"rare", "one"}
    assert got["rare"]["share_ppm"] == 9000
    assert got["one"]["share_ppm"] == 1000


def test_rare_categories_min_n_drops_singletons(spark):
    from radohydro_spark.operators.profile import rare_categories

    rows = [("g", "common")] * 995 + [("g", "rare")] * 4 + [("g", "one")]
    df = spark.createDataFrame(rows, "g string, cat string")
    got = rare_categories(df, "cat", ["g"], max_ppm=10_000, min_n=2).collect()
    assert [r["cat"] for r in got] == ["rare"]


def test_rare_categories_global_form_and_validation(spark):
    from radohydro_spark.operators.profile import rare_categories

    df = spark.createDataFrame(
        [("a",)] * 999 + [("b",)], "cat string"
    )
    got = rare_categories(df, "cat", max_ppm=5000).collect()
    assert [(r["cat"], r["share_ppm"]) for r in got] == [("b", 1000)]
    with pytest.raises(ValueError, match="rare_categories: max_ppm"):
        rare_categories(df, "cat", max_ppm=0)


def test_qq_table_duplicate_percents_raise_named(spark):
    """Duplicate qs previously died deep in Spark with an opaque
    AMBIGUOUS_REFERENCE — the validator now names it (r16 review)."""
    from radohydro_spark.operators.profile import qq_table

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="qq_table.*DISTINCT"):
        qq_table(df, df, "v", qs=(50, 50))


def test_rare_categories_survives_cat_named_group_col(spark):
    """A group column literally named 'cat' or 'n' must not collide
    with the operator's internals (r16 review)."""
    from radohydro_spark.operators.profile import rare_categories

    rows = [("g1", "common")] * 999 + [("g1", "odd")]
    df = spark.createDataFrame(rows, "cat string, n string")
    got = rare_categories(df, "n", ["cat"], max_ppm=5000).collect()
    assert [(r["cat"], r["n"]) for r in got] == [("g1", 1)]


# --------------------------------------------- drift baseline lifecycle


def test_tvd_baseline_roundtrip_pins_direct_law(spark, tmp_path):
    """compare-vs-store must be bit-identical to tvd_drift on both raw
    sides (the shared _tvd_from_counts law)."""
    from radohydro_spark.operators.profile import (
        save_category_baseline,
        tvd_drift,
        tvd_drift_vs_baseline,
    )

    old = spark.createDataFrame(
        [("a",)] * 70 + [("b",)] * 30, "cat string"
    )
    new = spark.createDataFrame(
        [("a",)] * 40 + [("b",)] * 50 + [("c",)] * 10, "cat string"
    )
    path = str(tmp_path / "base")
    store = save_category_baseline(old, "cat", path)
    assert {(r["cat"], r["n"]) for r in store.collect()} == {
        ("a", 70),
        ("b", 30),
    }
    [direct] = tvd_drift(old, new, "cat").collect()
    [via_store] = tvd_drift_vs_baseline(new, "cat", path).collect()
    assert direct.asDict() == via_store.asDict()
    # d_a = |70*100-40*100| = 3000 is the largest numerator
    assert via_store["top_category"] == "a"


def test_tvd_baseline_bad_store_schema_raises_named(spark, tmp_path):
    from radohydro_spark.operators.profile import tvd_drift_vs_baseline

    path = str(tmp_path / "wrong")
    spark.createDataFrame([(1, "x")], "id long, label string").write.parquet(
        path
    )
    df = spark.createDataFrame([("a",)], "cat string")
    with pytest.raises(ValueError, match="tvd_drift_vs_baseline.*contract"):
        tvd_drift_vs_baseline(df, "cat", path)


def test_tvd_baseline_new_category_counts(spark, tmp_path):
    """A category unseen in the baseline must surface (full-outer
    semantics survive the store)."""
    from radohydro_spark.operators.profile import (
        save_category_baseline,
        tvd_drift_vs_baseline,
    )

    old = spark.createDataFrame([("a",)] * 10, "cat string")
    new = spark.createDataFrame([("z",)] * 10, "cat string")
    path = str(tmp_path / "base2")
    save_category_baseline(old, "cat", path)
    [r] = tvd_drift_vs_baseline(new, "cat", path).collect()
    # disjoint supports: TVD = 1 -> num = 2*n1*n2 = 200, ppm = 10^6
    assert r["tvd_num"] == 200 and r["tvd_ppm"] == 1_000_000


def test_psi_baseline_roundtrip_pins_direct_law(spark, tmp_path):
    """compare-vs-store must be bit-identical to psi_quantile_bins on
    both raw sides (shared edge/bucket/psi laws)."""
    from radohydro_spark.operators.profile import (
        psi_quantile_bins,
        psi_vs_baseline,
        save_decile_baseline,
    )

    old = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
    new = spark.createDataFrame(
        [(i,) for i in range(50, 180)] + [(-3,)], "v long"
    )
    path = str(tmp_path / "psibase")
    save_decile_baseline(old, "v", path, n_bins=10)
    direct = {
        r["bucket"]: r.asDict()
        for r in psi_quantile_bins(old, new, "v", n_bins=10).collect()
    }
    via = {
        r["bucket"]: r.asDict()
        for r in psi_vs_baseline(new, "v", path).collect()
    }
    assert direct == via


def test_psi_baseline_bad_store_raises_named(spark, tmp_path):
    from radohydro_spark.operators.profile import psi_vs_baseline

    path = str(tmp_path / "bad")
    spark.createDataFrame([(1,)], "wrong long").write.parquet(
        path + "/edges"
    )
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="psi_vs_baseline.*contract"):
        psi_vs_baseline(df, "v", path)


def test_save_decile_baseline_bad_bins_raises_named(spark, tmp_path):
    from radohydro_spark.operators.profile import save_decile_baseline

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="save_decile_baseline.*2..100"):
        save_decile_baseline(df, "v", str(tmp_path / "x"), n_bins=101)
