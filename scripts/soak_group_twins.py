"""Soak: the r15 per-group twin family at many-groups scale.

The per-group twins (tvd_drift_by / ks_drift_by / auc_by /
wasserstein_drift_by / gini_by) trade the global forms' range-partition
machinery for group-partitioned windows under a documented contract:
one group's domain must fit one task's sort, and the shuffle carries
Σ_g |group g's domain| counter rows.  This leg drives the DESIGN
regime — MANY groups × bounded per-group domains — and asserts:

* closed-form correctness per group (every group is built identically,
  so the statistic must be IDENTICAL across all G groups and equal to
  the hand formula: the uniform-vs-shifted KS law d_num = k²·D·S, the
  per-group TVD of a planted category skew),
* linear shuffle growth in the group count (G → 2G at fixed per-group
  size must move ~2× the bytes; the group windows add no pair term),
* zero spill.

    python scripts/soak_group_twins.py
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _stage_totals(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    tot = {"shuffle_mb": 0.0, "spill_disk_mb": 0.0}
    for s in stages:
        tot["shuffle_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
        tot["spill_disk_mb"] += s.get("diskBytesSpilled", 0) / 1e6
    return tot


def _leg(spark, name, fn, check, prev=None):
    from radohydro_spark.plans.pipeline import release_persisted

    before = _stage_totals(spark)
    t0 = time.time()
    rows = fn().collect()
    wall = time.time() - t0
    after = _stage_totals(spark)
    shuffle = after["shuffle_mb"] - before["shuffle_mb"]
    check(rows)
    out = {
        "leg": name,
        "groups": len(rows),
        "wall_s": round(wall, 2),
        "shuffle_mb": round(shuffle, 1),
        "spill_disk_mb": round(
            after["spill_disk_mb"] - before["spill_disk_mb"], 1
        ),
    }
    if prev:
        out["shuffle_ratio_vs_prev"] = round(shuffle / prev, 2)
    print(json.dumps(out), flush=True)
    release_persisted()
    return shuffle


def main() -> None:
    from radohydro_spark import get_spark
    from radohydro_spark.operators.profile import ks_drift_by, tvd_drift_by

    spark = get_spark(
        "soak_group_twins",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )

    # ---- ks_drift_by: G groups, each uniform on D values with k
    # copies/value; new side shifted by S.  Per group (identical by
    # construction): n1 = n2 = k*D, d_num = k^2*D*S,
    # at_value = S*k... the smallest value attaining the max is v =
    # S-1 + ... replayed once in python below instead of derived.
    D, K, S = 2_000, 2, 200

    def _series(g_n, shift):
        # exact integer construction: per group, id div g_n enumerates
        # 0..D*K-1 once, so each value 0..D-1 appears exactly K times
        n = g_n * D * K
        return spark.range(n).select(
            F.expr(f"CAST(id % {g_n} AS STRING)").alias("g"),
            F.expr(f"CAST((id div {g_n}) % {D} + {shift} AS BIGINT)").alias(
                "v"
            ),
        )

    # python replay of ONE group's law (all groups identical)
    from collections import Counter

    c1 = Counter({v: K for v in range(D)})
    c2 = Counter({v + S: K for v in range(D)})
    n1 = n2 = K * D
    f1 = f2 = 0
    best = (-1, None)
    for v in sorted(set(c1) | set(c2)):
        f1 += c1.get(v, 0)
        f2 += c2.get(v, 0)
        d = abs(f1 * n2 - f2 * n1)
        if d > best[0]:
            best = (d, v)
    want_d, want_at = best
    want_ppm = (1_000_000 * want_d) // (n1 * n2)

    prev = None
    for g_n in (5_000, 10_000):
        old = _series(g_n, 0)
        new = _series(g_n, S)

        def check(rows, g_n=g_n):
            assert len(rows) == g_n, len(rows)
            for r in rows[:: max(1, g_n // 7)]:  # sample groups
                assert (r.n_old, r.n_new) == (n1, n2), r
                assert r.d_num == want_d and r.at_value == want_at, r
                assert r.ks_ppm == want_ppm, r

        prev = _leg(
            spark,
            f"ks_by_{g_n}_groups_x_{D}_values",
            lambda o=old, n=new: ks_drift_by(o, n, "v", ["g"]),
            check,
            prev,
        )

    # ---- tvd_drift_by: G groups, 16 categories; old uniform, new
    # skewed (category 0 doubled at the expense of category 1)
    C = 16
    per_cat = 500

    def _cats(g_n, skew):
        # per group, j = id div g_n enumerates 0..C*per_cat-1 once:
        # cat = j % C (per_cat rows each); the skewed side remaps the
        # first per_cat/2 occurrences of category 1 to category 0
        rows = g_n * C * per_cat
        cat = F.expr(f"(id div {g_n}) % {C}")
        if skew:
            half = F.expr(f"(id div {g_n}) div {C} < {per_cat // 2}")
            cat = F.when((cat == 1) & half, F.lit(0)).otherwise(cat)
        return spark.range(rows).select(
            F.expr(f"CAST(id % {g_n} AS STRING)").alias("g"),
            cat.cast("string").alias("c"),
        )

    co = Counter({str(c): per_cat for c in range(C)})
    cn = Counter({str(c): per_cat for c in range(C)})
    cn["0"] += per_cat // 2
    cn["1"] -= per_cat // 2
    tn1, tn2 = sum(co.values()), sum(cn.values())
    tvd_num = sum(
        abs(co.get(c, 0) * tn2 - cn.get(c, 0) * tn1)
        for c in set(co) | set(cn)
    )
    tvd_ppm = (1_000_000 * tvd_num) // (2 * tn1 * tn2)

    prev = None
    for g_n in (5_000, 10_000):
        old = _cats(g_n, skew=False)
        new = _cats(g_n, skew=True)

        def check(rows, g_n=g_n):
            assert len(rows) == g_n, len(rows)
            for r in rows[:: max(1, g_n // 7)]:
                assert (r.n_old, r.n_new) == (tn1, tn2), r
                assert r.tvd_num == tvd_num and r.tvd_ppm == tvd_ppm, r

        prev = _leg(
            spark,
            f"tvd_by_{g_n}_groups_x_{C}_cats",
            lambda o=old, n=new: tvd_drift_by(o, n, "c", ["g"]),
            check,
            prev,
        )


if __name__ == "__main__":
    main()
