"""Soak: the r16 fifth-wave operators at many-groups / large-domain scale.

Four legs, each with a closed-form correctness assertion and a
shuffle-growth check against the documented plan bound:

* chi2_drift_by / jsd_drift_by — G identically-built groups with a
  planted category skew: the per-category diagram must be IDENTICAL
  across groups and equal to the hand formula; shuffle (counters:
  Σ_g |domain|) must grow ~linearly in G, never in rows.
* heavy_hitters_by — planted 3× hot value per group must rank 1 in
  every group; counter-sized shuffle, linear in G.
* kmv_by — per-group bottom-k over a LARGE per-group key domain: the
  mapInPandas prune must keep the candidate exchange bounded by
  partitions·G·k, so doubling the ROW count at fixed G leaves the
  shuffle ~flat (the global kmv_sketch argument, segmented).
* corr_by — y = 2x exactly: corr must come back 1.0 (±1e-9 for the
  final sqrt rounding) for every group from ONE counter-sized
  aggregate; doubling rows leaves shuffle ~flat (six counters/group).

    python scripts/soak_r16b.py
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
    before = _stage_totals(spark)
    t0 = time.time()
    rows = fn().collect()
    wall = time.time() - t0
    after = _stage_totals(spark)
    shuffle = after["shuffle_mb"] - before["shuffle_mb"]
    check(rows)
    out = {
        "leg": name,
        "rows_out": len(rows),
        "wall_s": round(wall, 2),
        "shuffle_mb": round(shuffle, 1),
        "spill_disk_mb": round(
            after["spill_disk_mb"] - before["spill_disk_mb"], 1
        ),
    }
    if prev:
        out["shuffle_ratio_vs_prev"] = round(shuffle / prev, 2)
    print(json.dumps(out), flush=True)
    return shuffle


def main() -> None:
    from radohydro_spark import get_spark
    from radohydro_spark.operators.profile import (
        chi2_drift_by,
        corr_by,
        jsd_drift_by,
    )
    from radohydro_spark.operators.sketch import heavy_hitters_by, kmv_by

    spark = get_spark(
        "soak_r16b",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )

    # ---- chi2/jsd: G groups, 20-category domain, planted skew ------
    # old: cat uniform over 20; new: cat 0 gets a 2x planted boost.
    def drift_sides(g, per_side):
        # grp = id mod g, j = id div g: every group sees the SAME
        # j-sequence 0..per_side-1, so compositions are identical by
        # construction (id mod g and id mod 20 would be CORRELATED)
        base = spark.range(g * per_side).select(
            (F.col("id") % g).alias("grp"),
            ((F.col("id") / g).cast("long") % 20).cast("string").alias("cat"),
        )
        boosted = spark.range(g * per_side).select(
            (F.col("id") % g).alias("grp"),
            F.when((F.col("id") / g).cast("long") % 10 == 0, F.lit("0"))
            .otherwise(((F.col("id") / g).cast("long") % 20).cast("string"))
            .alias("cat"),
        )
        return base, boosted

    def chi2_fn(g, per_side):
        old, new = drift_sides(g, per_side)
        return lambda: chi2_drift_by(old, new, "cat", ["grp"])

    def chi2_check(rows):
        # every group identically built -> identical diagrams
        by_cat = {}
        for r in rows:
            by_cat.setdefault(r.cat, set()).add(
                (r.n_old, r.n_new, r.d, r.chi2_contrib)
            )
        assert all(len(v) == 1 for v in by_cat.values()), "groups diverge"
        # the boost doubles cat 0 and ERASES cat 10 on the new side;
        # the vanished category is the largest mover: d = c1*n2 with
        # c2 = 0, contrib = (d/n1)(d/n2)/c1 — replay the law per row
        top = max(rows, key=lambda r: r.chi2_contrib)
        assert top.cat == "10" and top.n_new == 0, top
        n1 = sum(r.n_old for r in rows if r.grp == rows[0].grp)
        n2 = sum(r.n_new for r in rows if r.grp == rows[0].grp)
        for r in rows[:100]:
            assert r.d == abs(r.n_old * n2 - r.n_new * n1)
            assert r.chi2_contrib == round(
                (r.d / n1) * (r.d / n2) / (r.n_old + r.n_new), 9
            )

    prev = _leg(
        spark, "chi2_by G=5k per_side=1k (10M rows)",
        chi2_fn(5000, 1000), chi2_check,
    )
    _leg(
        spark, "chi2_by G=10k per_side=1k (20M rows)",
        chi2_fn(10000, 1000), chi2_check, prev,
    )

    def jsd_fn(g, per_side):
        old, new = drift_sides(g, per_side)
        return lambda: jsd_drift_by(old, new, "cat", ["grp"])

    def jsd_check(rows):
        by_cat = {}
        for r in rows:
            by_cat.setdefault(r.cat, set()).add(
                (r.n_old, r.n_new, r.jsd_contrib)
            )
        assert all(len(v) == 1 for v in by_cat.values())
        # the erased category is the largest mover (p*ln2 with q = 0)
        assert max(rows, key=lambda r: r.jsd_contrib).cat == "10"

    prev = _leg(
        spark, "jsd_by G=5k per_side=1k", jsd_fn(5000, 1000), jsd_check
    )
    _leg(
        spark, "jsd_by G=10k per_side=1k",
        jsd_fn(10000, 1000), jsd_check, prev,
    )

    # ---- heavy_hitters_by: planted hot value per group -------------
    def hh_df(g, per_grp):
        return spark.range(g * per_grp).select(
            (F.col("id") % g).alias("grp"),
            F.when((F.col("id") / g).cast("long") % 25 < 3, F.lit("hot"))
            .otherwise(((F.col("id") / g).cast("long") % 100).cast("string"))
            .alias("v"),
        )

    def hh_check(rows):
        r1 = [r for r in rows if r.rank == 1]
        assert all(r.value == "hot" for r in r1), r1[:3]

    prev = _leg(
        spark, "hh_by G=5k per_grp=2k (10M rows)",
        lambda: heavy_hitters_by(hh_df(5000, 2000), "v", ["grp"], k=5),
        hh_check,
    )
    _leg(
        spark, "hh_by G=10k per_grp=2k (20M rows)",
        lambda: heavy_hitters_by(hh_df(10000, 2000), "v", ["grp"], k=5),
        hh_check, prev,
    )

    # ---- kmv_by: large per-group key domain, prune bound -----------
    def kmv_df(rows, g):
        return spark.range(rows).select(
            (F.col("id") % g).alias("grp"),
            (F.col("id")).cast("string").alias("k"),
        )

    def kmv_check_k(rows):
        from collections import Counter

        c = Counter(r.grp for r in rows)
        assert all(v == 64 for v in c.values())

    prev = _leg(
        spark, "kmv_by rows=4M G=100 k=64 (40k distinct/grp)",
        lambda: kmv_by(kmv_df(4_000_000, 100), "k", ["grp"], k=64),
        kmv_check_k,
    )
    _leg(
        spark, "kmv_by rows=8M G=100 k=64 (80k distinct/grp)",
        lambda: kmv_by(kmv_df(8_000_000, 100), "k", ["grp"], k=64),
        kmv_check_k, prev,
    )

    # ---- corr_by: y = 2x exactly, one counter aggregate ------------
    def corr_df(rows, g):
        return spark.range(rows).select(
            (F.col("id") % g).alias("grp"),
            ((F.col("id") / g).cast("long") % 1000).cast("double").alias("x"),
            (((F.col("id") / g).cast("long") % 1000) * 2)
            .cast("double").alias("y"),
        )

    def corr_check(rows):
        assert all(abs(r.corr - 1.0) < 1e-9 for r in rows)
        assert all(abs(r.slope - 2.0) < 1e-9 for r in rows)

    prev = _leg(
        spark, "corr_by rows=10M G=10k",
        lambda: corr_by(corr_df(10_000_000, 10_000), "x", "y", ["grp"]),
        corr_check,
    )
    _leg(
        spark, "corr_by rows=20M G=10k",
        lambda: corr_by(corr_df(20_000_000, 10_000), "x", "y", ["grp"]),
        corr_check, prev,
    )


if __name__ == "__main__":
    main()
