"""Round-16: the four r15 ADVICE closures (auc_by 0/1 label assert,
wasserstein_drift_by one-sided guard short-circuit, mmr_select
per-round literal/broadcast choice, bench record schema — the last is
exercised by inspection, not here) and the round's new operators: the
per-group psi_drift_by / calibration_bins_by / cusum_by twins and the
streaming per-window KMV distinct sketch."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _ph(s: str) -> int:
    """Python twin of functions.text.portable_hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _trunc_div(a: int, b: int) -> int:
    """Spark `div` == DuckDB `//` (1.0.0): truncation toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ----------------------------------------- r15 ADVICE #1: auc labels


def test_auc_by_label_outside_01_raises_named(spark):
    from radohydro_spark.operators.profile import auc_by

    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 1), ("g", 3, 2)], "g string, s long, y long"
    )
    with pytest.raises(Exception, match="auc_by.*0/1 label domain"):
        auc_by(df, "s", "y", ["g"]).collect()


def test_auc_global_label_outside_01_raises_named(spark):
    from radohydro_spark.operators.profile import auc_mann_whitney

    df = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2)], "s long, y long"
    )
    with pytest.raises(
        Exception, match="auc_mann_whitney.*0/1 label domain"
    ):
        auc_mann_whitney(df, "s", "y").collect()


def test_auc_by_valid_labels_still_exact(spark):
    """The added guard must not perturb the law: replay a tied case."""
    from radohydro_spark.operators.profile import auc_by

    rows = [("g", s, y) for s, y in
            [(1, 0), (1, 1), (2, 0), (3, 1), (3, 1), (4, 0)]]
    df = spark.createDataFrame(rows, "g string, s long, y long")
    r = auc_by(df, "s", "y", ["g"]).collect()[0]
    # tie-averaged ranks: value 1 -> ranks {1,2} avg 1.5; 2 -> 3;
    # 3 -> {4,5} avg 4.5; 4 -> 6.  R+ = 1.5 + 4.5 + 4.5 = 10.5
    assert r.rank_sum_pos_x2 == 21
    n_pos, n_neg = 3, 3
    num = 21 - n_pos * (n_pos + 1)
    assert r.auc_ppm == (1_000_000 * num) // (2 * n_pos * n_neg)


# ------------------------------- r15 ADVICE #2: w1_by one-sided guard


def test_w1_by_one_sided_wide_range_does_not_raise(spark):
    """A group present on ONE side with a value range past the 9e12
    micro-unit bound must NOT trip the in-plan contract: every
    cross-multiplication term is provably zero there and the
    documented output is emd_micro = NULL (r15 ADVICE)."""
    from radohydro_spark.operators.profile import wasserstein_drift_by

    wide = 10_000_000_000_001  # > 9e12 range within the one-sided group
    old = spark.createDataFrame(
        [("lonely", 0), ("lonely", wide), ("both", 5)], "g string, v long"
    )
    new = spark.createDataFrame([("both", 7)], "g string, v long")
    out = {r.g: r for r in wasserstein_drift_by(old, new, "v", ["g"]).collect()}
    r = out["lonely"]
    assert (r.n_old, r.n_new, r.emd_num, r.emd_micro) == (2, 0, 0, None)
    assert out["both"].emd_micro == 2 * 1_000_000  # |5-7| in micro-units


def test_w1_by_two_sided_range_contract_still_raises(spark):
    from radohydro_spark.operators.profile import wasserstein_drift_by

    wide = 10_000_000_000_001
    old = spark.createDataFrame([("g", 0), ("g", wide)], "g string, v long")
    new = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(Exception, match="wasserstein_drift_by"):
        wasserstein_drift_by(old, new, "v", ["g"]).collect()


# ----------------------- r15 ADVICE #3: mmr per-round path selection


def test_mmr_mid_selection_switch_row_identical(spark):
    """lit_budget between round sizes: early rounds take the literal
    path, later rounds the broadcast path — output must equal the
    all-broadcast (lit_budget=0) run row for row."""
    from radohydro_spark.operators.sampling import mmr_select

    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(4)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, vec array<double>")
    # dim=4: rounds 2..3 have len(sel)*dim = 4,8 <= 9 (literal);
    # rounds 4+ have 12,16 > 9 (broadcast) -> a genuine mid-switch
    mixed = mmr_select(
        df, "vec", "doc_id", query_id=0, k=5, lit_budget=9
    ).collect()
    allb = mmr_select(
        df, "vec", "doc_id", query_id=0, k=5, lit_budget=0
    ).collect()
    assert [tuple(r) for r in mixed] == [tuple(r) for r in allb]


# ---------------------------------------------------- psi_drift_by


def _psi_by(spark, old_rows, new_rows, n_buckets=10):
    from radohydro_spark.operators.profile import psi_drift_by

    o = spark.createDataFrame(old_rows, "g string, v double")
    n = spark.createDataFrame(new_rows, "g string, v double")
    return psi_drift_by(o, n, "v", ["g"], n_buckets=n_buckets)


def test_psi_by_single_group_matches_global(spark):
    from radohydro_spark.operators.profile import psi_drift

    old_v = [1.0, 2.0, 3.5, 4.0, 9.0, 10.0]
    new_v = [2.0, 2.5, 8.0, 11.0, -1.0]
    o = spark.createDataFrame([(v,) for v in old_v], "v double")
    n = spark.createDataFrame([(v,) for v in new_v], "v double")
    g = {r.bucket: r for r in psi_drift(o, n, "v", n_buckets=5).collect()}
    r = {
        r.bucket: r
        for r in _psi_by(
            spark,
            [("k", v) for v in old_v],
            [("k", v) for v in new_v],
            n_buckets=5,
        ).collect()
    }
    assert set(r) == set(g)
    for b in g:
        assert (
            r[b].n_old, r[b].n_new, r[b].p_old, r[b].p_new,
            r[b].psi_contrib,
        ) == (
            g[b].n_old, g[b].n_new, g[b].p_old, g[b].p_new,
            g[b].psi_contrib,
        )


def test_psi_by_python_replay_two_groups(spark):
    old = [(f"g{i % 2}", float((i * 13) % 29)) for i in range(120)]
    new = [(f"g{i % 2}", float((i * 17) % 37)) for i in range(140)]
    got = {
        (r.g, r.bucket): r for r in _psi_by(spark, old, new).collect()
    }
    for gk in ("g0", "g1"):
        ov = [v for g, v in old if g == gk]
        nv = [v for g, v in new if g == gk]
        lo, hi = min(ov), max(ov)
        width = (hi - lo) / 10.0

        def bucket(x):
            return int(max(min(math.floor((x - lo) / width), 9), 0))

        co: dict[int, int] = {}
        cn: dict[int, int] = {}
        for v in ov:
            co[bucket(v)] = co.get(bucket(v), 0) + 1
        for v in nv:
            cn[bucket(v)] = cn.get(bucket(v), 0) + 1
        to, tn = len(ov), len(nv)
        for b in set(co) | set(cn):
            r = got[(gk, b)]
            assert (r.n_old, r.n_new) == (co.get(b, 0), cn.get(b, 0))
            po = max(co.get(b, 0) / to, 1e-6)
            pn = max(cn.get(b, 0) / tn, 1e-6)
            assert r.p_old == pytest.approx(po, abs=1e-9)
            assert r.p_new == pytest.approx(pn, abs=1e-9)
            assert r.psi_contrib == pytest.approx(
                (po - pn) * math.log(po / pn), abs=1e-8
            )
        # every emitted bucket for the group was accounted for
        assert {b for g2, b in got if g2 == gk} == set(co) | set(cn)


def test_psi_by_one_sided_and_null_groups(spark):
    old = [("k", 1.0), ("k", 5.0), ("old_only", 2.0), (None, 3.0)]
    new = [("k", 2.0), ("new_only", 9.0), (None, 4.0)]
    rows = _psi_by(spark, old, new).collect()
    groups = {r.g for r in rows}
    # NULL groups excluded; new-only groups have no reference grid
    assert groups == {"k", "old_only"}
    oo = [r for r in rows if r.g == "old_only"]
    assert all(
        r.p_new is None and r.psi_contrib is None and r.n_new == 0
        for r in oo
    )
    assert all(r.p_old is not None for r in oo)


def test_psi_by_constant_extent_group_buckets_to_zero(spark):
    old = [("c", 4.0), ("c", 4.0)]
    new = [("c", 4.0), ("c", 99.0)]
    rows = _psi_by(spark, old, new).collect()
    assert {r.bucket for r in rows} == {0}
    r = rows[0]
    assert (r.n_old, r.n_new) == (2, 2)
    assert r.psi_contrib == 0.0  # identical proportions


def test_psi_by_empty_group_cols_raises(spark):
    from radohydro_spark.operators.profile import psi_drift_by

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="psi_drift_by"):
        psi_drift_by(df, df, "v", [])


# ----------------------------------------------- calibration_bins_by


def _cal_by(spark, rows, n_bins=10):
    from radohydro_spark.operators.profile import calibration_bins_by

    df = spark.createDataFrame(rows, "g string, s long, y long")
    return calibration_bins_by(df, "s", "y", ["g"], n_bins=n_bins)


def test_cal_by_single_group_matches_global(spark):
    from radohydro_spark.operators.profile import calibration_bins

    sy = [(3, 0), (5, 1), (17, 0), (23, 1), (23, 0), (41, 1), (60, 0)]
    df = spark.createDataFrame(sy, "s long, y long")
    g = {r.bin: r for r in calibration_bins(df, "s", "y", n_bins=4).collect()}
    r = {
        r.bin: r
        for r in _cal_by(
            spark, [("k", s, y) for s, y in sy], n_bins=4
        ).collect()
    }
    assert set(r) == set(g)
    for b in g:
        assert (
            r[b].bin_lo, r[b].bin_hi, r[b].n, r[b].n_pos, r[b].pos_ppm
        ) == (g[b].bin_lo, g[b].bin_hi, g[b].n, g[b].n_pos, g[b].pos_ppm)


def test_cal_by_python_replay_two_groups(spark):
    rows = [
        (f"g{i % 2}", (i * 31) % 97, (i * 7) % 3 % 2) for i in range(160)
    ]
    got = {
        (r.g, r.bin): r for r in _cal_by(spark, rows, n_bins=8).collect()
    }
    for gk in ("g0", "g1"):
        sub = [(s, y) for g, s, y in rows if g == gk]
        lo = min(s for s, _ in sub)
        hi = max(s for s, _ in sub)
        rng = hi - lo
        agg: dict[int, list[int]] = {}
        for s, y in sub:
            b = min(((s - lo) * 8) // rng, 7) if rng else 0
            n, p = agg.get(b, [0, 0])
            agg[b] = [n + 1, p + y]
        for b, (n, p) in agg.items():
            r = got[(gk, b)]
            assert (r.n, r.n_pos) == (n, p)
            assert r.pos_ppm == (1_000_000 * p) // n
            assert r.bin_lo == lo + (b * rng + 7) // 8
            assert r.bin_hi == (hi if b == 7 else lo + ((b + 1) * rng + 7) // 8)
        assert {b for g2, b in got if g2 == gk} == set(agg)


def test_cal_by_label_and_domain_contracts_raise_named(spark):
    from radohydro_spark.operators.profile import calibration_bins_by

    bad_label = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 2)], "g string, s long, y long"
    )
    with pytest.raises(
        Exception, match="calibration_bins_by.*0/1 label domain"
    ):
        calibration_bins_by(bad_label, "s", "y", ["g"]).collect()
    wide = spark.createDataFrame(
        [("g", 0, 0), ("g", (1 << 62) + 7, 1)], "g string, s long, y long"
    )
    with pytest.raises(
        Exception, match="calibration_bins_by.*binning domain"
    ):
        calibration_bins_by(wide, "s", "y", ["g"], n_bins=10).collect()


def test_cal_by_constant_score_group_and_null_exclusion(spark):
    rows = [("c", 7, 1), ("c", 7, 0), (None, 3, 1)]
    out = _cal_by(spark, rows).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.g, r.bin, r.bin_lo, r.bin_hi, r.n, r.n_pos, r.pos_ppm) == (
        "c", 0, 7, 7, 2, 1, 500_000,
    )


def test_cal_by_empty_group_cols_raises(spark):
    from radohydro_spark.operators.profile import calibration_bins_by

    df = spark.createDataFrame([("g", 1, 0)], "g string, s long, y long")
    with pytest.raises(ValueError, match="calibration_bins_by"):
        calibration_bins_by(df, "s", "y", [])


# -------------------------------------------------------- cusum_by


def _cusum_by(spark, rows):
    from radohydro_spark.operators.profile import cusum_by

    df = spark.createDataFrame(rows, "g string, t long, x long")
    return cusum_by(df, "t", "x", ["g"])


def _cusum_replay(series):
    """Python replay of the global law on [(t, x)] rows."""
    from collections import defaultdict

    by_t: dict[int, list[int]] = defaultdict(list)
    for t, x in series:
        by_t[t].append(x)
    n = len(series)
    tot = sum(x for _, x in series)
    aa = sum(abs(x) for _, x in series)
    cc = cs = 0
    best, at = -1, None
    for t in sorted(by_t):
        cc += len(by_t[t])
        cs += sum(by_t[t])
        d = abs(n * cs - cc * tot)
        if d > best:
            best, at = d, t
    micro = None
    if aa:
        den = n * aa
        micro = (
            _trunc_div(1_000_000 * best, den)
            if best <= 9_000_000_000_000
            else _trunc_div(best, den // 1_000_000)
        )
    return n, tot, best, micro, at


def test_cusum_by_single_group_matches_global(spark):
    from radohydro_spark.operators.profile import cusum_changepoint

    series = [(i, (10 if i < 6 else 40) + (i * 3) % 5) for i in range(12)]
    df = spark.createDataFrame(series, "t long, x long")
    g = cusum_changepoint(df, "t", "x").collect()[0]
    r = _cusum_by(spark, [("k", t, x) for t, x in series]).collect()[0]
    assert (r.n_rows, r.total, r.cusum_num, r.cusum_micro, r.at_value) == (
        g.n_rows, g.total, g.cusum_num, g.cusum_micro, g.at_value,
    )
    assert r.g == "k"


def test_cusum_by_python_replay_three_groups(spark):
    rows = []
    for gi in range(3):
        for i in range(60):
            shift = 25 if (i > 20 + 10 * gi) else 0
            rows.append((f"g{gi}", i, ((i * 7 + gi) % 9) - 4 + shift))
    got = {r.g: r for r in _cusum_by(spark, rows).collect()}
    for gi in range(3):
        gk = f"g{gi}"
        series = [(t, x) for g, t, x in rows if g == gk]
        n, tot, num, micro, at = _cusum_replay(series)
        r = got[gk]
        assert (r.n_rows, r.total, r.cusum_num, r.cusum_micro, r.at_value) \
            == (n, tot, num, micro, at)


def test_cusum_by_tie_law_duplicates_and_zero_group(spark):
    # zero-valued group: micro is NULL, num is 0
    rows = [("z", 1, 0), ("z", 2, 0), ("z", 3, 0)]
    # tie group: symmetric series -> max attained at multiple
    # boundaries, smallest wins
    rows += [("tie", 1, 1), ("tie", 2, 0), ("tie", 3, 1)]
    got = {r.g: r for r in _cusum_by(spark, rows).collect()}
    z = got["z"]
    assert (z.cusum_num, z.cusum_micro) == (0, None)
    t = got["tie"]
    n, tot, num, micro, at = _cusum_replay([(1, 1), (2, 0), (3, 1)])
    assert (t.cusum_num, t.at_value) == (num, at)
    assert t.at_value == 1  # |3*1-1*2| = 1 at t=1 and t=2: smallest


def test_cusum_by_scan_domain_contract_raises_named(spark):
    from radohydro_spark.operators.profile import cusum_by

    big = 3_000_000_000_000_000_000  # 2 rows: 2*2*6e18 >= 2^63
    df = spark.createDataFrame(
        [("g", 1, big), ("g", 2, big)], "g string, t long, x long"
    )
    with pytest.raises(Exception, match="cusum_by.*scan domain"):
        cusum_by(df, "t", "x", ["g"]).collect()


def test_cusum_by_timestamp_order_and_null_group(spark):
    import datetime

    base = datetime.datetime(2024, 5, 1)
    rows = [
        ("k", base + datetime.timedelta(days=i), 5 if i < 3 else 50)
        for i in range(6)
    ] + [(None, base, 7)]
    df = spark.createDataFrame(rows, "g string, t timestamp, x long")
    from radohydro_spark.operators.profile import cusum_by

    out = cusum_by(df, "t", "x", ["g"]).collect()
    assert len(out) == 1 and out[0].g == "k"
    assert out[0].at_value == base + datetime.timedelta(days=2)


def test_cusum_by_empty_group_cols_raises(spark):
    from radohydro_spark.operators.profile import cusum_by

    df = spark.createDataFrame([("g", 1, 1)], "g string, t long, x long")
    with pytest.raises(ValueError, match="cusum_by"):
        cusum_by(df, "t", "x", [])


# -------------------------------------------------------- stream_kmv


def _reduce_kmv(rows, k):
    """The production reduction over an update-mode drain: per window,
    bottom-k of the DISTINCT emitted hashes (snapshots are
    monotone-downward supersets of the final sketch, so this equals the
    final snapshot even when a window spans several micro-batches —
    never assert on the raw union)."""
    per_w: dict = {}
    for r in rows:
        per_w.setdefault(r.ts, set()).add(r.hv)
    return {w: sorted(v)[:k] for w, v in per_w.items()}


def test_stream_kmv_equals_batch_sketch_per_window(spark, tmp_path):
    """availableNow drain == batch kmv_sketch over each window's rows,
    bit-for-bit; per-window emission bounded at k rows."""
    import datetime

    from radohydro_spark.operators.sketch import kmv_sketch
    from radohydro_spark.streaming import run_available_now, stream_kmv

    base = datetime.datetime(2024, 4, 1, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(minutes=13 * i), f"u{i % 37}")
        for i in range(120)
    ]
    src = tmp_path / "src"
    spark.createDataFrame(rows, "ts timestamp, k string").write.parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema("ts timestamp, k string").parquet(str(src))
    )
    out = run_available_now(
        stream_kmv(stream, "ts", "k", "6 hours", k=8, watermark="1 hour"),
        "t_stream_kmv",
        str(tmp_path / "ck"),
        "update",
    ).collect()
    got = _reduce_kmv(out, 8)
    batch = spark.createDataFrame(rows, "ts timestamp, k string")
    windows = sorted(got)
    assert len(windows) >= 3
    for w in windows:
        hi = w + datetime.timedelta(hours=6)
        sub = batch.filter((F.col("ts") >= w) & (F.col("ts") < hi))
        want = [r.hv for r in kmv_sketch(sub, "k", k=8).collect()]
        assert sorted(got[w]) == want
        assert len(got[w]) <= 8
    # the prune actually engaged somewhere: at least one window holds
    # more than 8 distinct keys
    assert any(
        len({k for t, k in rows if w <= t < w + datetime.timedelta(hours=6)})
        > 8
        for w in windows
    )


def test_stream_kmv_matches_python_md5_replay(spark, tmp_path):
    import datetime

    from radohydro_spark.streaming import run_available_now, stream_kmv

    base = datetime.datetime(2024, 4, 2, 0, 0, 0)
    rows = [
        (base + datetime.timedelta(minutes=29 * i), str((i * 11) % 23))
        for i in range(60)
    ]
    src = tmp_path / "src"
    spark.createDataFrame(rows, "ts timestamp, k string").write.parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema("ts timestamp, k string").parquet(str(src))
    )
    out = run_available_now(
        stream_kmv(stream, "ts", "k", "1 day", k=10, watermark="1 hour"),
        "t_stream_kmv2",
        str(tmp_path / "ck"),
        "update",
    ).collect()
    got = {w: set(v) for w, v in _reduce_kmv(out, 10).items()}
    want: dict = {}
    for ts, k in rows:
        w = ts.replace(hour=0, minute=0)
        want.setdefault(w, set()).add(_ph(k))
    assert set(got) == set(want)
    for w in want:
        assert got[w] == set(sorted(want[w])[:10])


# ----------------------------------- mmr arrow scorer (VERDICT #4)


def test_mmr_arrow_scorer_row_identical(spark):
    """The Arrow int64-matmul scorer must equal both SQL forms row for
    row — same integer law, same tie law."""
    from radohydro_spark.operators.sampling import mmr_select

    rows = [
        (i, [float((i * 13 + j * 5) % 17 - 8) for j in range(6)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, vec array<double>")
    arrow = mmr_select(
        df, "vec", "doc_id", query_id=0, k=5, scorer="arrow"
    ).collect()
    bcast = mmr_select(
        df, "vec", "doc_id", query_id=0, k=5, scorer="sql", lit_budget=0
    ).collect()
    lit = mmr_select(
        df, "vec", "doc_id", query_id=0, k=5, scorer="sql",
        lit_budget=10**9,
    ).collect()
    assert (
        [tuple(r) for r in arrow]
        == [tuple(r) for r in bcast]
        == [tuple(r) for r in lit]
    )


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=0, max_value=10**6))
def test_mmr_arrow_scorer_property(spark, seed):
    """Hypothesis pin: random small corpora, arrow == broadcast SQL."""
    import random

    from radohydro_spark.operators.sampling import mmr_select

    rng = random.Random(seed)
    n, dim = rng.randint(6, 25), rng.randint(2, 8)
    rows = [
        (i, [float(rng.randint(-9, 9)) for _ in range(dim)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, vec array<double>")
    k = rng.randint(1, min(5, n - 1))
    a = mmr_select(
        df, "vec", "doc_id", query_id=0, k=k, scorer="arrow"
    ).collect()
    b = mmr_select(
        df, "vec", "doc_id", query_id=0, k=k, scorer="sql", lit_budget=0
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_mmr_scorer_validation(spark):
    from radohydro_spark.operators.sampling import mmr_select

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [2.0, 1.0])], "doc_id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="scorer"):
        mmr_select(df, "vec", "doc_id", query_id=0, k=1, scorer="numpy")


def test_mmr_arrow_string_ids_tie_law(spark):
    """Identical vectors force score ties every round; the per-batch
    local tie-break on string ids must agree with the SQL path."""
    from radohydro_spark.operators.sampling import mmr_select

    rows = [(f"d{i:02d}", [1.0, 1.0, 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, vec array<double>")
    a = mmr_select(
        df, "vec", "doc_id", query_id="d00", k=4, scorer="arrow"
    ).collect()
    b = mmr_select(
        df, "vec", "doc_id", query_id="d00", k=4, scorer="sql",
        lit_budget=0,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert [r.doc_id for r in a] == ["d01", "d02", "d03", "d04"]


# --------------------------------------------------- stream_psi_buckets


def test_stream_psi_matches_python_replay(spark, tmp_path):
    """availableNow drain == the batch psi law per window on the pinned
    grid/reference (python float replay, clamp law included)."""
    import datetime

    from radohydro_spark.streaming import run_available_now, stream_psi_buckets

    base = datetime.datetime(2024, 6, 1, 0, 0, 0)
    # values straddle the grid on both sides to exercise the clamp
    rows = [
        (base + datetime.timedelta(minutes=11 * i), float((i * 37) % 140 - 20))
        for i in range(100)
    ]
    src = tmp_path / "src"
    spark.createDataFrame(rows, "ts timestamp, v double").write.parquet(
        str(src)
    )
    stream = (
        spark.readStream.schema("ts timestamp, v double").parquet(str(src))
    )
    LO, HI, NB = 0, 100, 5
    REF = [1, 2, 3, 2, 2]
    out = run_available_now(
        stream_psi_buckets(
            stream, "ts", "v", "6 hours", LO, HI, NB, REF,
            watermark="1 hour",
        ),
        "t_stream_psi",
        str(tmp_path / "ck"),
        "complete",
    ).collect()
    got = {(r.ts, r.bucket): r for r in out}
    # python replay
    from collections import defaultdict

    winb = defaultdict(lambda: defaultdict(int))
    for ts, v in rows:
        w = ts.replace(hour=(ts.hour // 6) * 6, minute=0)
        v2 = min(max(int(v), LO), HI)
        b = min(((v2 - LO) * NB) // (HI - LO), NB - 1)
        winb[w][b] += 1
    rt = sum(REF)
    assert {w for w, _ in got} == set(winb)
    for w, per_b in winb.items():
        n = sum(per_b.values())
        for b in range(NB):
            r = got[(w, b)]
            assert (r.n, r.n_bucket) == (n, per_b.get(b, 0)), (w, b)
            p_ref = max(REF[b] / rt, 1e-6)
            p_win = max(per_b.get(b, 0) / n, 1e-6)
            assert r.p_ref == pytest.approx(p_ref, abs=1e-9)
            assert r.p_win == pytest.approx(p_win, abs=1e-9)
            assert r.psi_contrib == pytest.approx(
                (p_ref - p_win) * math.log(p_ref / p_win), abs=1e-8
            )
    # every window emits ALL buckets (zero counts included)
    assert len(got) == len(winb) * NB


def test_stream_psi_contracts(spark):
    from radohydro_spark.streaming import stream_psi_buckets

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(ValueError, match="hi must exceed lo"):
        stream_psi_buckets(stream, "timestamp", "value", "1 hour",
                           5, 5, 4, [1, 1, 1, 1])
    with pytest.raises(ValueError, match="binning domain"):
        stream_psi_buckets(stream, "timestamp", "value", "1 hour",
                           0, (1 << 62), 4, [1, 1, 1, 1])
    with pytest.raises(AssertionError):
        stream_psi_buckets(stream, "timestamp", "value", "1 hour",
                           0, 10, 4, [1, 1, 1])  # wrong ref length
    with pytest.raises(AssertionError):
        stream_psi_buckets(stream, "timestamp", "value", "1 hour",
                           0, 10, 4, [0, 0, 0, 0])  # zero reference


# ------------------- r16 review: raw-column 0/1 label guard (all four)


def test_label_guard_catches_fractional_labels(spark):
    """A probability column (0.9) used as the label must raise, not
    truncate to 0 past the guard (r16 review: the check runs on the
    RAW column, before the long cast)."""
    from radohydro_spark.operators.profile import (
        auc_by,
        auc_mann_whitney,
        calibration_bins,
        calibration_bins_by,
    )

    df = spark.createDataFrame(
        [("g", 1, 0.0), ("g", 2, 0.9)], "g string, s long, y double"
    )
    with pytest.raises(Exception, match="auc_by.*0/1 label domain"):
        auc_by(df, "s", "y", ["g"]).collect()
    with pytest.raises(
        Exception, match="auc_mann_whitney.*0/1 label domain"
    ):
        auc_mann_whitney(df, "s", "y").collect()
    with pytest.raises(
        Exception, match="calibration_bins_by.*0/1 label domain"
    ):
        calibration_bins_by(df, "s", "y", ["g"]).collect()
    with pytest.raises(
        Exception, match="calibration_bins:.*0/1 label domain"
    ):
        calibration_bins(df, "s", "y").collect()
    # float 0.0 / 1.0 labels are IN domain (raw compare, then cast)
    ok = spark.createDataFrame(
        [("g", 1, 0.0), ("g", 2, 1.0), ("g", 3, 1.0)],
        "g string, s long, y double",
    )
    r = auc_by(ok, "s", "y", ["g"]).collect()[0]
    assert (r.n_pos, r.n_neg) == (2, 1)


def test_mmr_arrow_null_and_ragged_vectors_match_sql(spark):
    """NULL-embedding rows score NULL in the SQL forms and lose the
    argmax; the Arrow kernel must mirror that instead of crashing in
    np.stack (r16 review).  Wrong-dim vectors get the same treatment
    (zip_with pads with NULL -> NULL score)."""
    from radohydro_spark.operators.sampling import mmr_select

    rows = [
        (0, [1.0, 2.0, 3.0]),
        (1, [3.0, 1.0, 2.0]),
        (2, None),                 # NULL embedding
        (3, [2.0, 3.0, 1.0]),
        (4, [9.0, 9.0, 9.0, 9.0]),  # ragged (dim 4 vs 3)
        (5, [1.0, 1.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, vec array<double>")
    a = mmr_select(
        df, "vec", "doc_id", query_id=0, k=3, scorer="arrow"
    ).collect()
    b = mmr_select(
        df, "vec", "doc_id", query_id=0, k=3, scorer="sql", lit_budget=0
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    picked = {r.doc_id for r in a}
    assert 2 not in picked and 4 not in picked


def test_stream_kmv_multibatch_eviction_and_merge(spark, tmp_path):
    """Multi-batch drain (maxFilesPerTrigger=1): early windows time out
    between batches (state evicted — r16 review: a custom stateful op
    gets no free watermark cleanup), an in-horizon straggler still
    merges with its window's surviving state, and the reduced drain
    equals the batch law per window."""
    import datetime

    from radohydro_spark.operators.sketch import kmv_sketch
    from radohydro_spark.streaming import run_available_now, stream_kmv

    base = datetime.datetime(2024, 4, 5, 0, 0, 0)
    # file 1: hours 0..9, many keys; file 2: hour 20 plus a straggler
    # back in hour 9 (inside the 1h watermark horizon after batch 1)
    f1 = [
        (base + datetime.timedelta(hours=h, minutes=m), f"u{h}_{m % 13}")
        for h in range(10)
        for m in range(0, 60, 7)
    ]
    f2 = [
        (base + datetime.timedelta(hours=20, minutes=m), f"v{m % 9}")
        for m in range(0, 60, 5)
    ] + [(base + datetime.timedelta(hours=9, minutes=59), "straggler")]
    src = tmp_path / "src"
    spark.createDataFrame(f1, "ts timestamp, k string").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    spark.createDataFrame(f2, "ts timestamp, k string").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_available_now(
        stream_kmv(stream, "ts", "k", "1 hour", k=6, watermark="1 hour"),
        "t_stream_kmv_mb",
        str(tmp_path / "ck"),
        "update",
    ).collect()
    got = _reduce_kmv(out, 6)
    batch = spark.createDataFrame(
        f1 + f2, "ts timestamp, k string"
    )
    assert len(got) == 11  # hours 0..9 + hour 20
    for w, hvs in got.items():
        hi = w + datetime.timedelta(hours=1)
        sub = batch.filter((F.col("ts") >= w) & (F.col("ts") < hi))
        want = [r.hv for r in kmv_sketch(sub, "k", k=6).collect()]
        assert hvs == want, w
    # the straggler's window (hour 9) must include its hash — proof the
    # second batch MERGED into surviving state rather than restarting
    w9 = base + datetime.timedelta(hours=9)
    sub9 = batch.filter(
        (F.col("ts") >= w9)
        & (F.col("ts") < w9 + datetime.timedelta(hours=1))
    )
    assert got[w9] == [r.hv for r in kmv_sketch(sub9, "k", k=6).collect()]


# ------------------------------------------------------- quantiles_by


def _q_by(spark, rows, qs=(25, 50, 75, 95, 99)):
    from radohydro_spark.operators.profile import quantiles_by

    df = spark.createDataFrame(rows, "g string, v long")
    return quantiles_by(df, "v", ["g"], qs=qs)


def _disc(vals, q):
    """percentile_disc lower-boundary replay: smallest v with
    100*rank >= q*n over the sorted multiset."""
    s = sorted(vals)
    n = len(s)
    for i, v in enumerate(s, start=1):
        if 100 * i >= q * n:
            return v
    return s[-1]


def test_quantiles_by_python_replay_and_ties(spark):
    rows = [(f"g{i % 3}", ((i * 17) % 50) // (i % 3 + 1)) for i in range(300)]
    got = {r.g: r for r in _q_by(spark, rows).collect()}
    for gk in ("g0", "g1", "g2"):
        vals = [v for g, v in rows if g == gk]
        r = got[gk]
        assert r.n_rows == len(vals)
        for q in (25, 50, 75, 95, 99):
            assert getattr(r, f"q{q}") == _disc(vals, q), (gk, q)


def test_quantiles_by_hand_case_and_single_value(spark):
    rows = [("a", v) for v in (1, 2, 3, 4)] + [("b", 7), ("b", 7)]
    got = {r.g: r for r in _q_by(spark, rows, qs=(50, 100)).collect()}
    # n=4: p50 = smallest v with rank >= 2 -> 2; p100 -> 4
    assert (got["a"].q50, got["a"].q100) == (2, 4)
    assert (got["b"].q50, got["b"].q100) == (7, 7)


def test_quantiles_by_null_exclusion_and_contracts(spark):
    from radohydro_spark.operators.profile import quantiles_by

    rows = [("k", 1), (None, 2), ("k", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = quantiles_by(df, "v", ["g"], qs=(50,)).collect()
    assert len(out) == 1 and out[0].g == "k" and out[0].n_rows == 1
    with pytest.raises(ValueError, match="quantiles_by"):
        quantiles_by(df, "v", [])
    with pytest.raises(ValueError, match="integer percents"):
        quantiles_by(df, "v", ["g"], qs=(0,))
    with pytest.raises(ValueError, match="integer percents"):
        quantiles_by(df, "v", ["g"], qs=())
