"""Round-16 fifth wave: chi-square + Jensen-Shannon categorical drift
(global + per-group), per-group exact-moments correlation/OLS
(corr_by), per-group KMV distinct sketch/estimate (kmv_by /
kmv_estimate_by) and exact per-group heavy hitters
(heavy_hitters_by)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _ph(s: str) -> int:
    """Python twin of functions.text.portable_hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --------------------------------------------------- chi2_drift (+_by)


def _chi2_expected(pairs):
    """Python replay of the chi2_drift law: pairs = {cat: (c1, c2)}."""
    n1 = sum(c1 for c1, _ in pairs.values())
    n2 = sum(c2 for _, c2 in pairs.values())
    out = {}
    for cat, (c1, c2) in pairs.items():
        d = abs(c1 * n2 - c2 * n1)
        contrib = round((d / n1) * (d / n2) / (c1 + c2), 9)
        out[cat] = (c1, c2, d, contrib)
    return out


def test_chi2_python_replay(spark):
    from radohydro_spark.operators.profile import chi2_drift

    old = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 10 + [("c",)] * 5, "cat string"
    )
    new = spark.createDataFrame(
        [("a",)] * 12 + [("b",)] * 25 + [("d",)] * 3, "cat string"
    )
    got = {
        r.cat: (r.n_old, r.n_new, r.d, r.chi2_contrib)
        for r in chi2_drift(old, new, "cat").collect()
    }
    exp = _chi2_expected(
        {"a": (30, 12), "b": (10, 25), "c": (5, 0), "d": (0, 3)}
    )
    assert got == exp
    # the summed statistic matches the classical 2xK formula
    n1, n2 = 45, 40
    chi2 = sum(v[3] for v in exp.values())
    classic = 0.0
    for c1, c2 in [(30, 12), (10, 25), (5, 0), (0, 3)]:
        s = c1 + c2
        for obs, n in [(c1, n1), (c2, n2)]:
            e = n * s / (n1 + n2)
            classic += (obs - e) ** 2 / e
    assert math.isclose(chi2, classic, rel_tol=1e-6)


def test_chi2_one_sided_and_empty(spark):
    from radohydro_spark.operators.profile import chi2_drift

    old = spark.createDataFrame([("a",), ("b",)], "cat string")
    empty = spark.createDataFrame([], "cat string")
    rows = chi2_drift(old, empty, "cat").collect()
    assert {r.cat for r in rows} == {"a", "b"}
    assert all(r.chi2_contrib is None for r in rows)
    # d still exact: |c1*0 - 0*n1| = 0
    assert all(r.d == 0 for r in rows)
    assert chi2_drift(empty, empty, "cat").collect() == []


def test_chi2_by_single_group_matches_global(spark):
    from radohydro_spark.operators.profile import chi2_drift, chi2_drift_by

    rows_o = [("g", c) for c in ["a"] * 7 + ["b"] * 3]
    rows_n = [("g", c) for c in ["a"] * 2 + ["b"] * 9 + ["c"] * 1]
    old = spark.createDataFrame(rows_o, "g string, cat string")
    new = spark.createDataFrame(rows_n, "g string, cat string")
    by = {
        r.cat: (r.n_old, r.n_new, r.d, r.chi2_contrib)
        for r in chi2_drift_by(old, new, "cat", ["g"]).collect()
    }
    glob = {
        r.cat: (r.n_old, r.n_new, r.d, r.chi2_contrib)
        for r in chi2_drift(old, new, "cat").collect()
    }
    assert by == glob


def test_chi2_by_null_exclusion_and_contract(spark):
    from radohydro_spark.operators.profile import chi2_drift_by

    old = spark.createDataFrame(
        [("g", "a"), (None, "a"), ("g", None)], "g string, cat string"
    )
    new = spark.createDataFrame([("g", "a")], "g string, cat string")
    rows = chi2_drift_by(old, new, "cat", ["g"]).collect()
    assert len(rows) == 1 and rows[0].n_old == 1 and rows[0].n_new == 1
    with pytest.raises(ValueError, match="chi2_drift_by: group_cols"):
        chi2_drift_by(old, new, "cat", [])


# ---------------------------------------------------- jsd_drift (+_by)


def _jsd_expected(pairs):
    n1 = sum(c1 for c1, _ in pairs.values())
    n2 = sum(c2 for _, c2 in pairs.values())
    out = {}
    for cat, (c1, c2) in pairs.items():
        p, q = c1 / n1, c2 / n2
        t1 = 0.0 if c1 == 0 else p * math.log(2.0 * p / (p + q))
        t2 = 0.0 if c2 == 0 else q * math.log(2.0 * q / (p + q))
        out[cat] = (c1, c2, round(p, 9), round(q, 9), round((t1 + t2) / 2.0, 9))
    return out


def test_jsd_python_replay_disjoint_support_finite(spark):
    from radohydro_spark.operators.profile import jsd_drift

    # categories c and d exist on ONE side only — the epsilon-free
    # law must stay finite there (the whole point vs PSI)
    old = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "cat string"
    )
    new = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 5 + [("d",)] * 3, "cat string"
    )
    got = {
        r.cat: (r.n_old, r.n_new, r.p_old, r.p_new, r.jsd_contrib)
        for r in jsd_drift(old, new, "cat").collect()
    }
    exp = _jsd_expected({"a": (6, 2), "b": (3, 5), "c": (1, 0), "d": (0, 3)})
    assert got == exp
    total = sum(v[4] for v in exp.values())
    assert 0.0 <= total <= math.log(2.0) + 1e-12


def test_jsd_identical_mixtures_zero(spark):
    from radohydro_spark.operators.profile import jsd_drift

    df = spark.createDataFrame([("a",)] * 4 + [("b",)] * 2, "cat string")
    rows = jsd_drift(df, df, "cat").collect()
    assert all(abs(r.jsd_contrib) == 0.0 for r in rows)


def test_jsd_by_single_group_matches_global_and_contracts(spark):
    from radohydro_spark.operators.profile import jsd_drift, jsd_drift_by

    rows_o = [("g", c) for c in ["a"] * 5 + ["b"] * 2]
    rows_n = [("g", c) for c in ["a"] * 1 + ["b"] * 6 + ["c"] * 2]
    old = spark.createDataFrame(rows_o, "g string, cat string")
    new = spark.createDataFrame(rows_n, "g string, cat string")
    by = {
        r.cat: (r.n_old, r.n_new, r.p_old, r.p_new, r.jsd_contrib)
        for r in jsd_drift_by(old, new, "cat", ["g"]).collect()
    }
    glob = {
        r.cat: (r.n_old, r.n_new, r.p_old, r.p_new, r.jsd_contrib)
        for r in jsd_drift(old, new, "cat").collect()
    }
    assert by == glob
    with pytest.raises(ValueError, match="jsd_drift_by: group_cols"):
        jsd_drift_by(old, new, "cat", [])


def test_jsd_by_one_sided_group_null(spark):
    from radohydro_spark.operators.profile import jsd_drift_by

    old = spark.createDataFrame([("g1", "a"), ("g2", "a")], "g string, cat string")
    new = spark.createDataFrame([("g1", "a")], "g string, cat string")
    rows = {r.g: r for r in jsd_drift_by(old, new, "cat", ["g"]).collect()}
    assert rows["g2"].jsd_contrib is None and rows["g2"].p_old is None
    assert rows["g1"].jsd_contrib == 0.0


# -------------------------------------------------------------- corr_by


def test_corr_by_python_replay(spark):
    from radohydro_spark.operators.profile import corr_by

    data = [
        ("g", 1.25, 10.5),
        ("g", 2.50, 19.25),
        ("g", 3.75, 31.0),
        ("g", 5.00, 38.5),
        ("h", 1.0, 8.0),
        ("h", 2.0, 6.0),
        ("h", 3.0, 4.0),
    ]
    df = spark.createDataFrame(data, "g string, x double, y double")
    got = {r.g: r for r in corr_by(df, "x", "y", ["g"]).collect()}

    for g in ["g", "h"]:
        xs = [round(x * 100) for gg, x, _ in data if gg == g]
        ys = [round(y * 100) for gg, _, y in data if gg == g]
        n = len(xs)
        sx, sy = float(sum(xs)), float(sum(ys))
        sxx = float(sum(v * v for v in xs))
        syy = float(sum(v * v for v in ys))
        sxy = float(sum(a * b for a, b in zip(xs, ys)))
        mx, my = sx / n, sy / n
        var_x = max(sxx / n - mx * mx, 0.0)
        var_y = max(syy / n - my * my, 0.0)
        cov = sxy / n - mx * my
        r = got[g]
        assert r.n == n
        assert r.mean_x == round(mx / 100.0, 9)
        assert r.mean_y == round(my / 100.0, 9)
        assert r.corr == round(cov / math.sqrt(var_x * var_y), 9)
        slope = cov / var_x * 1.0
        assert r.slope == round(slope, 9)
        assert r.intercept == round(my / 100.0 - slope * (mx / 100.0), 9)
    # sign sanity: g is increasing, h strictly decreasing
    assert got["g"].corr > 0.99 and got["h"].corr == -1.0


def test_corr_by_constant_column_null_and_exclusions(spark):
    from radohydro_spark.operators.profile import corr_by

    df = spark.createDataFrame(
        [("g", 2.0, 1.0), ("g", 2.0, 5.0), ("g", 2.0, 9.0),
         ("g", None, 1.0), (None, 1.0, 1.0)],
        "g string, x double, y double",
    )
    rows = corr_by(df, "x", "y", ["g"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n == 3  # NULL x and NULL group excluded
    assert r.corr is None and r.slope is None and r.intercept is None
    assert r.mean_x == 2.0
    with pytest.raises(ValueError, match="corr_by: group_cols"):
        corr_by(df, "x", "y", [])


def test_corr_by_scale_factors(spark):
    from radohydro_spark.operators.profile import corr_by

    # x has 3 decimals -> scale_x=1000 keeps the law exact; the
    # slope/intercept descaling must account for the asymmetric scales
    data = [("g", 0.001, 10.0), ("g", 0.002, 20.0), ("g", 0.003, 30.0)]
    df = spark.createDataFrame(data, "g string, x double, y double")
    r = corr_by(df, "x", "y", ["g"], scale_x=1000, scale_y=1).collect()[0]
    assert r.corr == 1.0
    assert r.slope == 10000.0  # dy/dx = 10 / 0.001
    assert abs(r.intercept) < 1e-9
    assert r.mean_x == 0.002 and r.mean_y == 20.0


# ------------------------------------------- kmv_by / kmv_estimate_by


def test_kmv_by_matches_python_md5_replay(spark):
    from radohydro_spark.operators.sketch import kmv_by

    rows = [("t1", f"u{i}") for i in range(40)] + [
        ("t2", f"u{i}") for i in range(5)
    ]
    # duplicates must not perturb the sketch
    df = spark.createDataFrame(rows * 3, "g string, k string")
    got = [
        (r.g, r.hv)
        for r in kmv_by(df, "k", ["g"], k=8).orderBy("g", "hv").collect()
    ]
    exp = []
    for g, n in [("t1", 40), ("t2", 5)]:
        hs = sorted({_ph(f"u{i}") for i in range(n)})[:8]
        exp += [(g, h) for h in hs]
    assert got == exp


def test_kmv_by_null_exclusion(spark):
    from radohydro_spark.operators.sketch import kmv_by

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), (None, "b")], "g string, k string"
    )
    rows = kmv_by(df, "k", ["g"], k=4).collect()
    assert [(r.g, r.hv) for r in rows] == [("g", _ph("a"))]


def test_kmv_by_merge_property(spark):
    """Union sketch == sketch of union (mergeability): bottom-k of the
    concatenated per-half sketches equals the direct sketch."""
    from radohydro_spark.operators.sketch import kmv_by

    k = 6
    a = spark.createDataFrame(
        [("g", f"x{i}") for i in range(20)], "g string, k string"
    )
    b = spark.createDataFrame(
        [("g", f"x{i}") for i in range(10, 35)], "g string, k string"
    )
    sa = kmv_by(a, "k", ["g"], k=k)
    sb = kmv_by(b, "k", ["g"], k=k)
    merged = sorted(
        {r.hv for r in sa.collect()} | {r.hv for r in sb.collect()}
    )[:k]
    direct = [r.hv for r in kmv_by(a.union(b), "k", ["g"], k=k).orderBy("hv").collect()]
    assert merged == direct


def test_kmv_estimate_by_exact_below_k_and_estimator_above(spark):
    from radohydro_spark.operators.sketch import kmv_estimate_by

    k = 16
    rows = [("small", f"s{i}") for i in range(9)] + [
        ("big", f"b{i}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, k string")
    got = {r.g: r for r in kmv_estimate_by(df, "k", ["g"], k=k).collect()}
    # below k: exact
    assert got["small"].n_sketch == 9 and got["small"].distinct_est == 9
    # above k: the (k-1)*2^32 div theta estimator, replayed in Python
    hs = sorted({_ph(f"b{i}") for i in range(500)})
    theta = hs[k - 1]
    assert got["big"].theta == theta
    assert got["big"].distinct_est == ((k - 1) << 32) // theta
    # the estimate lands within ~3/sqrt(k) of truth for this seed-free law
    assert abs(got["big"].distinct_est - 500) / 500 < 3 / math.sqrt(k)


# ------------------------------------------------------ heavy_hitters_by


def test_heavy_hitters_by_law_and_ties(spark):
    from radohydro_spark.operators.sketch import heavy_hitters_by

    rows = (
        [("g", "a")] * 5
        + [("g", "b")] * 5  # tie with a -> value ASC breaks it
        + [("g", "c")] * 3
        + [("g", "d")] * 1
        + [("h", "z")] * 2
    )
    df = spark.createDataFrame(rows, "g string, v string")
    got = [
        (r.g, r.rank, r.value, r.cnt, r.share_ppm)
        for r in heavy_hitters_by(df, "v", ["g"], k=3)
        .orderBy("g", "rank")
        .collect()
    ]
    assert got == [
        ("g", 1, "a", 5, (1_000_000 * 5) // 14),
        ("g", 2, "b", 5, (1_000_000 * 5) // 14),
        ("g", 3, "c", 3, (1_000_000 * 3) // 14),
        ("h", 1, "z", 2, 1_000_000),
    ]


def test_heavy_hitters_by_null_exclusion_and_contract(spark):
    from radohydro_spark.operators.sketch import heavy_hitters_by

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), (None, "a")], "g string, v string"
    )
    rows = heavy_hitters_by(df, "v", ["g"], k=5).collect()
    assert len(rows) == 1 and rows[0].share_ppm == 1_000_000
    with pytest.raises(ValueError, match="heavy_hitters_by: group_cols"):
        heavy_hitters_by(df, "v", [], k=5)


def test_heavy_hitters_by_k_cut_exact(spark):
    from radohydro_spark.operators.sketch import heavy_hitters_by

    rows = [("g", f"v{i}") for i in range(10) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = [
        (r.rank, r.value, r.cnt)
        for r in heavy_hitters_by(df, "v", ["g"], k=4)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, "v9", 10), (2, "v8", 9), (3, "v7", 8), (4, "v6", 7)]
