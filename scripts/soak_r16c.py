"""Soak: the r16 sixth-wave operators at many-groups / large-domain /
many-rows scale.

Eight legs, each with a closed-form correctness assertion and a
shuffle-growth check against the documented plan bound:

* ttest_by — G groups with the new side planted exactly +5.00 above
  the old: mean_diff == 5.0 and t > 0 in EVERY group; shuffle must
  stay ~FLAT as rows double at fixed G (six counters per group).
* mutual_info_by — G groups, product-form (x, y) cells: every lift
  == 1.0 and mi_contrib == 0.0; counter shuffle ~linear in G.
* entropy_by — G groups, uniform 20-category mix: every h_contrib ==
  round((1/20)·ln 20, 9); counter shuffle ~linear in G.
* psi_quantile_bins — identical old/new snapshots over a LARGE
  distinct value domain: every psi_contrib == 0.0 and each decile
  bucket holds ~10% of the mass; the domain-counter aggregate is the
  only shuffle (edges are a 1-row broadcast — no row ever shuffles
  on a key), so shuffle ~linear in |domain|, wall ~linear in rows.
* vocab_growth — every doc carries one UNIQUE token + one shared
  token: vocab_cum(b) == docs_cum(b) + 1 exactly at every bucket;
  the token-domain min aggregate is the one row-scaling shuffle.
* label_propagation — disjoint 4-cliques: after 2 rounds every node
  must carry its clique's min id (LPA's closed form on cliques);
  one candidate-vote shuffle per round, linear in |edges|.
* stream_key_counts + top_k_slice — many windows at a bounded key
  domain: drained rows == windows·|domain| EXACTLY (the state bound
  made visible); top-3 slice emits 3·windows rows with the planted
  hot key rank 1 in every window.
* asof_join_nearest — right rows on an exact 100 s grid, left rows
  at +30 s offsets: the PRIOR side is provably nearer everywhere, so
  ts_asof == the grid floor for every row; wall/shuffle ~linear in
  |L|+|R| (the one-exchange dual-window plan).

    python scripts/soak_r16c.py
"""

from __future__ import annotations

import datetime
import json
import math
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
    from radohydro_spark.functions.text import vocab_growth
    from radohydro_spark.operators.asof import asof_join_nearest
    from radohydro_spark.operators.graph import label_propagation
    from radohydro_spark.operators.profile import (
        entropy_by,
        mutual_info_by,
        psi_quantile_bins,
        ttest_by,
    )

    spark = get_spark(
        "soak_r16c",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )

    # ---- ttest_by: planted +5.00 shift, flat counters at fixed G ---
    def ttest_fn(g, per_side):
        old = spark.range(g * per_side).select(
            (F.col("id") % g).alias("grp"),
            (((F.col("id") / g).cast("long") % 100) * 0.25).alias("v"),
        )
        new = old.select("grp", (F.col("v") + 5.0).alias("v"))
        return lambda: ttest_by(old, new, "v", ["grp"], scale=100)

    def ttest_check(rows):
        for r in rows:
            assert r.mean_diff == 5.0, r
            assert r.t_stat is not None and r.t_stat > 0
            assert r.n_old == r.n_new

    prev = _leg(
        spark, "ttest_by G=10k per_side=500 (10M rows)",
        ttest_fn(10_000, 500), ttest_check,
    )
    _leg(
        spark, "ttest_by G=10k per_side=1000 (20M rows)",
        ttest_fn(10_000, 1000), ttest_check, prev,
    )

    # ---- mutual_info_by: product-form cells per group --------------
    def mi_fn(g, per_grp):
        df = spark.range(g * per_grp).select(
            (F.col("id") % g).alias("grp"),
            ((F.col("id") / g).cast("long") % 4).cast("string").alias("x"),
            ((F.col("id") / g).cast("long") % 5).cast("string").alias("y"),
        )
        # j mod 4 and j mod 5 over j = 0..per_grp-1 with per_grp a
        # multiple of 20 -> exactly independent (CRT: each (x, y) cell
        # appears per_grp/20 times)
        return lambda: mutual_info_by(df, "x", "y", ["grp"])

    def mi_check(rows):
        for r in rows:
            assert r.lift == 1.0, r
            assert r.mi_contrib + 0.0 == 0.0, r

    prev = _leg(
        spark, "mutual_info_by G=5k per_grp=2000 (10M rows)",
        mi_fn(5_000, 2000), mi_check,
    )
    _leg(
        spark, "mutual_info_by G=10k per_grp=2000 (20M rows)",
        mi_fn(10_000, 2000), mi_check, prev,
    )

    # ---- entropy_by: uniform 20-category mix ------------------------
    want_h = round(-((1 / 20) * math.log(1 / 20)), 9)

    def ent_fn(g, per_grp):
        df = spark.range(g * per_grp).select(
            (F.col("id") % g).alias("grp"),
            ((F.col("id") / g).cast("long") % 20).cast("string").alias("c"),
        )
        return lambda: entropy_by(df, "c", ["grp"])

    def ent_check(rows):
        for r in rows:
            assert r.h_contrib == want_h, r

    prev = _leg(
        spark, "entropy_by G=5k per_grp=2000 (10M rows)",
        ent_fn(5_000, 2000), ent_check,
    )
    _leg(
        spark, "entropy_by G=10k per_grp=2000 (20M rows)",
        ent_fn(10_000, 2000), ent_check, prev,
    )

    # ---- psi_quantile_bins: identical snapshots, huge domain --------
    def psi_fn(n):
        df = spark.range(n).select((F.col("id") % (n // 4)).alias("v"))
        return lambda: psi_quantile_bins(df, df, "v", n_bins=10)

    def psi_check(rows):
        tot = sum(r.n_old for r in rows)
        for r in rows:
            assert r.psi_contrib + 0.0 == 0.0, r
            assert r.n_old == r.n_new
            # decile law: each bucket within 2x of the uniform share
            assert r.n_old <= 2 * tot // 10 + 4

    prev = _leg(
        spark, "psi_qbins 10M rows / 2.5M distinct",
        psi_fn(10_000_000), psi_check,
    )
    _leg(
        spark, "psi_qbins 20M rows / 5M distinct",
        psi_fn(20_000_000), psi_check, prev,
    )

    # ---- vocab_growth: unique-token-per-doc closed form -------------
    def vg_fn(n_docs):
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("shared t"), F.col("id").cast("string")
            ).alias("text"),
        )
        return lambda: vocab_growth(docs, "text", "doc_id", n_buckets=10)

    def vg_check(rows):
        for r in rows:
            # one unique token per doc + the one shared token, which
            # belongs to bucket 0
            want = r.docs_cum + 1
            assert r.vocab_cum == want, r
            assert r.n_tokens == 2 * r.n_docs

    prev = _leg(spark, "vocab_growth 500k docs", vg_fn(500_000), vg_check)
    _leg(spark, "vocab_growth 1M docs", vg_fn(1_000_000), vg_check, prev)

    # ---- label_propagation: disjoint 4-cliques converge in 2 -------
    def lpa_fn(n_cliques):
        # clique c = nodes {4c, 4c+1, 4c+2, 4c+3}, all 6 edges
        pairs = [(i, j) for i in range(4) for j in range(4) if i < j]
        base = spark.range(n_cliques)
        edges = None
        for i, j in pairs:
            e = base.select(
                (F.col("id") * 4 + i).alias("src"),
                (F.col("id") * 4 + j).alias("dst"),
            )
            edges = e if edges is None else edges.unionAll(e)
        return lambda: label_propagation(edges, iters=2)

    def lpa_check(rows):
        for r in rows:
            assert r.label == (r.node // 4) * 4, r

    prev = _leg(
        spark, "label_propagation 25k cliques (100k nodes, 150k edges)",
        lpa_fn(25_000), lpa_check,
    )
    _leg(
        spark, "label_propagation 50k cliques (200k nodes, 300k edges)",
        lpa_fn(50_000), lpa_check, prev,
    )

    # ---- stream top-k: drained rows at the state bound --------------
    import tempfile
    import uuid

    from radohydro_spark.streaming import (
        run_available_now,
        stream_key_counts,
        top_k_slice,
    )

    def stream_fn(n_rows, n_windows):
        base_ts = datetime.datetime(2024, 1, 1)
        src = tempfile.mkdtemp(prefix="soak_topk_src_")
        per_w = n_rows // n_windows
        df = spark.range(n_rows).select(
            (
                F.lit(base_ts)
                + F.make_interval(hours=(F.col("id") / per_w).cast("int"))
            ).alias("ts"),
            # key 0 planted 3x hot inside each window
            F.when(F.col("id") % 4 < 2, F.lit(0))
            .otherwise((F.col("id") % 20))
            .cast("string")
            .alias("k"),
        )
        df.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema("ts timestamp, k string").parquet(
            src
        )

        def run():
            counts = stream_key_counts(
                stream, "ts", "k", "1 hour", watermark="1 hour"
            )
            out = run_available_now(
                counts,
                "soak_topk_" + uuid.uuid4().hex[:8],
                tempfile.mkdtemp(prefix="soak_topk_ck_"),
                "complete",
            )
            n_slices = out.count()
            assert n_slices <= n_windows * 19, (
                n_slices,
                "state bound violated",
            )
            return top_k_slice(out, k=3)

        return run

    def stream_check(rows):
        by_w: dict = {}
        for r in rows:
            by_w.setdefault(r.ts, []).append(r)
        for w, rs in by_w.items():
            top = min(rs, key=lambda r: r.rank)
            assert top.value == "0", (w, rs)

    prev = _leg(
        spark, "stream_top_k 2M rows / 500 windows",
        stream_fn(2_000_000, 500), stream_check,
    )
    _leg(
        spark, "stream_top_k 4M rows / 1000 windows",
        stream_fn(4_000_000, 1000), stream_check, prev,
    )

    # ---- asof_nearest: grid closed form ------------------------------
    def asof_fn(n_left, n_right, n_keys):
        base_ts = datetime.datetime(2024, 1, 1)
        right = spark.range(n_right).select(
            (F.col("id") % n_keys).alias("k"),
            (
                F.lit(base_ts)
                + F.make_interval(
                    secs=(F.col("id") / n_keys).cast("long") * 100
                )
            ).alias("ts"),
            F.col("id").alias("tag"),
        )
        left = spark.range(n_left).select(
            F.col("id").alias("lid"),
            (F.col("id") % n_keys).alias("k"),
            (
                F.lit(base_ts)
                + F.make_interval(
                    secs=(
                        (F.col("id") / n_keys).cast("long")
                        % (n_right // n_keys)
                    )
                    * 100
                    + 30
                )
            ).alias("ts"),
        )
        return lambda: asof_join_nearest(
            left, right, ["k"], ts_col="ts"
        ).select(
            "lid",
            F.unix_micros("ts").alias("lt"),
            F.unix_micros("ts_asof").alias("mt"),
        )

    def asof_check(rows):
        for r in rows[:10000]:
            # left at grid+30s: prior (30s) beats next (70s) everywhere
            assert r.mt == r.lt - 30_000_000, r

    prev = _leg(
        spark, "asof_nearest 2M left / 1M right / 10k keys",
        asof_fn(2_000_000, 1_000_000, 10_000), asof_check,
    )
    _leg(
        spark, "asof_nearest 4M left / 2M right / 10k keys",
        asof_fn(4_000_000, 2_000_000, 10_000), asof_check, prev,
    )

    print("SOAK r16c: all closed-form checks passed", flush=True)


if __name__ == "__main__":
    main()
