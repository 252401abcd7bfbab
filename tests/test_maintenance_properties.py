"""Property tests for the table-maintenance / packing operators:
merge idempotence, SCD-2 reconstruction invariants, packing bin structure.
Randomized inputs via hypothesis (deterministic shrinking), run on Spark.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from radohydro_spark.functions.text import pack_sequences
from radohydro_spark.operators.merge import merge_upsert
from radohydro_spark.operators.scd import scd2_from_changes

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def change_events(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for i in range(n):
        k = draw(st.integers(min_value=1, max_value=3))
        v = draw(st.sampled_from(["a", "b", "c", None]))
        rows.append((k, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), i, v))
    return rows


@_settings
@given(rows=change_events())
def test_scd2_reconstruction_invariants(spark, rows):
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v string")
    hist = scd2_from_changes(df, ["k"], "ts", ["v"], ["eid"]).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    n_events_in: dict[int, int] = {}
    for k, _, _, _ in rows:
        n_events_in[k] = n_events_in.get(k, 0) + 1
    assert set(by_key) == set(n_events_in)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["version"])
        # versions are 1..n dense
        assert [r["version"] for r in versions] == list(range(1, len(versions) + 1))
        # event counts partition the input
        assert sum(r["n_events"] for r in versions) == n_events_in[k]
        # exactly one open version; intervals chain exactly
        assert versions[-1]["valid_to"] is None
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]
            # consecutive versions differ in the tracked attribute
            assert a["v"] != b["v"]


@_settings
@given(
    target_rows=st.lists(
        st.tuples(st.integers(1, 50), st.sampled_from(["x", "y", None]), st.floats(0, 100)),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    source_rows=st.lists(
        st.tuples(st.integers(1, 60), st.sampled_from(["u", "w"]), st.floats(0, 100), st.booleans()),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_idempotent_and_partitioned(spark, target_rows, source_rows):
    target = spark.createDataFrame(target_rows, "k int, name string, v double")
    source = spark.createDataFrame(
        source_rows, "k int, name string, v double, is_del boolean"
    )
    once = merge_upsert(target, source, ["k"], delete_col="is_del")
    once_rows = once.collect()
    twice = merge_upsert(once, source, ["k"], delete_col="is_del")
    a = sorted((r["k"], r["name"], r["v"]) for r in once_rows)
    b = sorted((r["k"], r["name"], r["v"]) for r in twice.collect())
    assert a == b  # applying the same change batch again is a no-op
    # key partition: every output key came from target or source; deletes gone
    out_keys = {r["k"] for r in once_rows}
    tgt_keys = {t[0] for t in target_rows}
    src = {t[0]: t for t in source_rows}
    for k in out_keys:
        assert k in tgt_keys or k in src
        assert not (k in src and src[k][3])  # deleted keys never survive
    for k, t in src.items():
        if not t[3]:
            assert k in out_keys  # non-delete source rows always land


@_settings
@given(
    texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=20),
    budget=st.integers(min_value=5, max_value=50),
)
def test_packing_bin_invariants(spark, texts, budget):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = sorted(
        pack_sequences(df, budget=budget, order_cols=("doc_id",)).collect(),
        key=lambda r: r["doc_id"],
    )
    cum = 0
    bin_start = {}
    for r in out:
        # bin folds the running token total before the doc; offset is the
        # doc's position inside ITS BIN's stream (r12 fix: after a bin
        # overflow the next doc STARTS its bin at offset 0)
        assert r["bin"] == cum // budget
        start = bin_start.setdefault(r["bin"], cum)
        assert r["offset"] == cum - start
        cum += r["n_tokens"]
    bins = [r["bin"] for r in out]
    assert bins == sorted(bins)  # bins monotone in pack order
    assert not bins or bins[0] == 0
