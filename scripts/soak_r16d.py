"""Soak: the r16 seventh-wave operators at large-domain / many-groups
scale.

* qq_table — identical snapshots over a LARGE distinct value domain:
  every diff == 0 and q_old == q_new at every percent; the one
  union-tagged domain-counter exchange is the only shuffle, ~linear
  in |domain|, wall ~linear in rows.
* rare_categories — G groups, one planted sub-threshold category per
  group among 20 common ones: EXACTLY G rare rows come back, each at
  the hand-computed ppm; counter shuffle ~linear in G.

    python scripts/soak_r16d.py
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
    from radohydro_spark.operators.profile import qq_table, rare_categories

    spark = get_spark(
        "soak_r16d",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )

    # ---- qq_table: identical snapshots, huge domain -----------------
    def qq_fn(n):
        df = spark.range(n).select((F.col("id") % (n // 4)).alias("v"))
        return lambda: qq_table(df, df, "v")

    def qq_check(rows):
        assert len(rows) == 9
        for r in rows:
            assert r.diff == 0 and r.q_old == r.q_new, r
            assert r.q_old is not None

    prev = _leg(
        spark, "qq_table 10M rows / 2.5M distinct",
        qq_fn(10_000_000), qq_check,
    )
    _leg(
        spark, "qq_table 20M rows / 5M distinct",
        qq_fn(20_000_000), qq_check, prev,
    )

    # ---- rare_categories: one planted rarity per group ---------------
    def rare_fn(g, per_grp):
        # j = id div g over 0..per_grp-1: j == 0 -> the singleton rare
        # category "rare"; else one of 20 common categories
        df = spark.range(g * per_grp).select(
            (F.col("id") % g).alias("grp"),
            F.when((F.col("id") / g).cast("long") == 0, F.lit("rare"))
            .otherwise(
                ((F.col("id") / g).cast("long") % 20).cast("string")
            )
            .alias("c"),
        )
        # common cats hold ~per_grp/20 each; the rare one exactly 1
        return lambda: rare_categories(
            df, "c", ["grp"], max_ppm=(2_000_000 // per_grp)
        )

    def rare_check_factory(g, per_grp):
        want_ppm = 1_000_000 // per_grp

        def check(rows):
            assert len(rows) == g, (len(rows), g)
            for r in rows[:1000]:
                assert r.cat == "rare" and r.n == 1, r
                assert r.share_ppm == want_ppm, r

        return check

    prev = _leg(
        spark, "rare_categories G=5k per_grp=2000 (10M rows)",
        rare_fn(5_000, 2000), rare_check_factory(5_000, 2000),
    )
    _leg(
        spark, "rare_categories G=10k per_grp=2000 (20M rows)",
        rare_fn(10_000, 2000), rare_check_factory(10_000, 2000), prev,
    )

    print("SOAK r16d: all closed-form checks passed", flush=True)


if __name__ == "__main__":
    main()
