"""Round-14 additions: batched-selection BPE training, the
perplexity-cutpoint calibration helper, and the ks_drift /
dedup_paragraphs reworks (whose tests live next to their r13 siblings
in test_round13_ops.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from radohydro_spark.functions.text import bpe_train_merges


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------- perplexity cut calibration


def test_calibrate_perplexity_cuts_reproduces_target_fractions(spark):
    """The CCNet recipe: derive (lo, hi) from a quantile pass, pin them,
    and the bucketer's fixed-threshold split reproduces the target
    head/middle/tail fractions on the calibration corpus."""
    from radohydro_spark.functions.text import (
        calibrate_perplexity_cuts,
        perplexity_buckets,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    lo, hi = calibrate_perplexity_cuts(df)
    assert isinstance(lo, int) and isinstance(hi, int) and lo < hi
    out = perplexity_buckets(df, cuts_micro=(lo, hi))
    counts = {
        r["ppl_bucket"]: r["n"]
        for r in out.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    for bucket in ("head", "middle", "tail"):
        frac = counts.get(bucket, 0) / total
        assert abs(frac - 1 / 3) < 0.05, (bucket, frac, counts)


def test_calibrate_perplexity_cuts_custom_fractions(spark):
    from radohydro_spark.functions.text import (
        calibrate_perplexity_cuts,
        perplexity_buckets,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    lo, hi = calibrate_perplexity_cuts(df, head_frac=0.1, tail_frac=0.2)
    out = perplexity_buckets(df, cuts_micro=(lo, hi))
    counts = {
        r["ppl_bucket"]: r["n"]
        for r in out.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert abs(counts.get("head", 0) / total - 0.1) < 0.05
    assert abs(counts.get("tail", 0) / total - 0.2) < 0.05


def test_calibrate_perplexity_cuts_degenerate_raises(spark):
    from radohydro_spark.functions.text import calibrate_perplexity_cuts

    # every document identical -> one score value -> lo == hi
    df = _docs(spark, [(i, "a b a b a b") for i in range(20)])
    with pytest.raises(ValueError, match="degenerate"):
        calibrate_perplexity_cuts(df)


# ------------------------------------------------------- batched BPE train


def test_bpe_batch_top1_path_unchanged(spark):
    # batch_top=1 must be EXACTLY the serial trainer: same schema (no
    # `round` column), same table
    df = _docs(spark, [(1, "banana bandana"), (2, "ananas banana")])
    serial = bpe_train_merges(df, n_merges=3)
    assert serial.columns == ["merge_rank", "pa", "pb", "n"]
    assert [tuple(r) for r in serial.collect()] == [
        (1, "a", "n", 8),
        (2, "an", "a", 4),
        (3, "an", "ana", 3),
    ]


def test_bpe_batched_schema_and_hand_case(spark):
    # "aa bb aa cc": pairs (a,a)x2, (b,b), (c,c) — all symbol-disjoint
    # except none conflict, so one round of batch_top=3 accepts all 3
    df = _docs(spark, [(1, "aa bb aa cc")])
    out = bpe_train_merges(df, n_merges=3, batch_top=3)
    assert out.columns == ["merge_rank", "round", "pa", "pb", "n"]
    rows = [tuple(r) for r in out.orderBy("merge_rank").collect()]
    assert rows == [
        (1, 1, "a", "a", 2),
        (2, 1, "b", "b", 1),
        (3, 1, "c", "c", 1),
    ]


def test_bpe_batched_accepted_pairs_are_symbol_disjoint(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bpe_train_merges(df, n_merges=12, batch_top=4).collect()
    by_round: dict[int, list] = {}
    for r in out:
        by_round.setdefault(r["round"], []).append((r["pa"], r["pb"]))
    for rnd, pairs in by_round.items():
        seen: set[str] = set()
        for pa, pb in pairs:
            assert pa not in seen and pb not in seen, (rnd, pairs)
            seen.update((pa, pb))


def test_bpe_batched_static_rounds_conflict_starved(spark):
    # "banana": every top pair shares 'a'/'n' symbols, so each round
    # accepts ONE pair despite batch_top=2 — static rounds mean fewer
    # TOTAL merges (2 rounds -> 2 merges), never extra rounds
    df = _docs(spark, [(1, "banana banana")])
    out = [
        tuple(r)
        for r in bpe_train_merges(df, n_merges=4, batch_top=2)
        .orderBy("merge_rank")
        .collect()
    ]
    assert [r[1] for r in out] == sorted({r[1] for r in out} | set())  # rounds ascend
    assert max(r[1] for r in out) <= 2  # ceil(4/2) static rounds
    assert len(out) < 4  # conflict-starved: under-fills, no extra rounds


def test_bpe_batched_deterministic_across_runs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [tuple(r) for r in bpe_train_merges(df, n_merges=8, batch_top=4).collect()]
    b = [tuple(r) for r in bpe_train_merges(df, n_merges=8, batch_top=4).collect()]
    assert a == b


def test_bpe_batched_prefix_consistent_with_candidate_law(spark):
    # round-1 acceptance must equal the law computed by hand from the
    # round-1 pair counts: top-C by (n DESC, pa, pb), greedy in rank
    # order against the already-ACCEPTED symbol set
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    B, CF = 4, 4
    out = bpe_train_merges(df, n_merges=B, batch_top=B, cand_factor=CF)
    got = [
        (r["pa"], r["pb"]) for r in out.orderBy("merge_rank").collect()
    ]
    # recompute round-1 candidates relationally
    toks = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.array_join(F.split(F.col("w"), ""), " ").alias("sym"), "cnt"
        )
    )
    s = F.split(F.col("sym"), " ")
    cands = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(s) - 1),
                    lambda i: F.struct(
                        F.element_at(s, i).alias("pa"),
                        F.element_at(s, i + 1).alias("pb"),
                    ),
                )
            ).alias("p"),
            "cnt",
        )
        .filter(F.size(s) >= 2)
        .groupBy("p.pa", "p.pb")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), "pa", "pb")
        .limit(B * CF)
        .collect()
    )
    want, taken = [], set()
    for r in cands:
        if len(want) >= B:
            break
        if r["pa"] in taken or r["pb"] in taken:
            continue
        want.append((r["pa"], r["pb"]))
        taken.update((r["pa"], r["pb"]))
    assert got[: len(want)] == want
