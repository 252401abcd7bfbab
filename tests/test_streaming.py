"""Structured Streaming tests: stream replay == batch result.

Every test drains a bounded file-source stream with availableNow and
compares against the equivalent batch computation on the same data —
the engine's guarantee that incremental and batch maintenance agree.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from radohydro_spark.operators.spatial import spatial_intersect
from radohydro_spark.operators.weights import apply_nan_policy, basin_weights
from radohydro_spark.sources.synthetic import (
    synthetic_basins,
    synthetic_cells,
    synthetic_obs,
)
from radohydro_spark.streaming import (
    file_stream,
    run_available_now,
    sessionize_stream,
    stateful_running_total,
    streaming_dedup,
    streaming_precip,
    tumbling_agg,
)

from tests.conftest import SF_DIR


def _events_dir(spark, tmp_path):
    p = str(tmp_path / "events_in")
    # normalize whatever ts encoding the testdata uses (int64-nanos in r1,
    # timestamp-NTZ in r3) to plain TIMESTAMP before re-writing for the
    # file-source stream.  inferTimestampNTZ=false is already set by
    # get_spark (session fixture); don't re-set it here — mutating the
    # session-scoped fixture's confs would leak across tests.
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    kind = dict(df.dtypes)["ts"]
    if kind == "bigint":  # int64-nanos encoding
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif kind == "timestamp_ntz":  # pinned-schema fallback
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    df.repartition(4).write.parquet(p)
    return p


def test_streaming_precip_matches_batch(spark, tmp_path):
    obs = synthetic_obs(spark)
    obs_dir = str(tmp_path / "obs")
    obs.write.parquet(obs_dir)

    cells, basins = synthetic_cells(spark), synthetic_basins(spark)
    fragments = apply_nan_policy(spatial_intersect(cells, basins), obs)
    weights = basin_weights(fragments).select("basin_id", "cell_row", "cell_col", "weight")

    stream = file_stream(spark, obs_dir, obs.schema, max_files_per_trigger=2)
    res = streaming_precip(stream, weights, window="1 hour")
    got = run_available_now(
        res, "precip_stream", str(tmp_path / "ckpt"), output_mode="complete"
    )

    batch = (
        synthetic_obs(spark)
        .join(F.broadcast(weights), ["cell_row", "cell_col"])
        .groupBy("basin_id", F.window("ts", "1 hour").start.alias("ts"))
        .agg(
            F.max(F.isnull("value").cast("int")).alias("_n"),
            F.sum(F.col("weight") * F.col("value")).alias("_s"),
        )
        .select(
            "basin_id",
            "ts",
            F.when(F.col("_n") > 0, F.lit(None))
            .otherwise(F.round(F.col("_s") / 10.0, 3))
            .alias("rainfall_mm"),
        )
    )
    g = {(r.basin_id, r.ts): r.rainfall_mm for r in got.collect()}
    b = {(r.basin_id, r.ts): r.rainfall_mm for r in batch.collect()}
    assert g == b and len(g) == 96


def test_tumbling_agg_daily_counts(spark, tmp_path):
    p = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(p).schema
    stream = file_stream(spark, p, schema, max_files_per_trigger=1)
    agg = tumbling_agg(
        stream,
        "ts",
        "1 day",
        [F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total")],
        keys=["event_type"],
        watermark="1 hour",
    )
    got = run_available_now(agg, "daily_counts", str(tmp_path / "ck2"), "complete")
    batch = (
        spark.read.parquet(p)
        .groupBy(F.window("ts", "1 day").start.alias("ts"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_sessionize_stream_total_events_conserved(spark, tmp_path):
    p = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(p).schema
    stream = file_stream(spark, p, schema)
    sess = sessionize_stream(stream, gap="30 minutes", watermark="1 hour")
    got = run_available_now(sess, "sessions", str(tmp_path / "ck3"), "complete")
    n_events = got.agg(F.sum("n_events")).first()[0]
    assert n_events == spark.read.parquet(p).count()
    # sessions for one user never overlap
    rows = sorted(
        got.filter(F.col("user_id") == got.first().user_id).collect(),
        key=lambda r: r.session_start,
    )
    for a, b in zip(rows, rows[1:]):
        assert a.session_end <= b.session_start


def test_streaming_dedup_bounded_state(spark, tmp_path):
    p = _events_dir(spark, tmp_path)
    schema = spark.read.parquet(p).schema
    # duplicate the whole directory contents: every event arrives twice
    dup_dir = str(tmp_path / "dup")
    spark.read.parquet(p).union(spark.read.parquet(p)).repartition(4).write.parquet(dup_dir)
    stream = file_stream(spark, dup_dir, schema)
    got = run_available_now(
        streaming_dedup(stream, ["event_id"], watermark="10 days"),
        "dedup_stream",
        str(tmp_path / "ck4"),
        "append",
    )
    assert got.count() == spark.read.parquet(p).count()


def test_stateful_running_total(spark, tmp_path):
    rows = [(1, f"2024-01-01 {h:02d}:00:00", float(h)) for h in range(6)] + [
        (2, "2024-01-01 00:00:00", None)
    ]
    df = spark.createDataFrame(rows, "basin_id int, ts string, rainfall_mm double").select(
        "basin_id", F.col("ts").cast("timestamp").alias("ts"), "rainfall_mm"
    )
    p = str(tmp_path / "rt")
    df.write.parquet(p)
    stream = file_stream(spark, p, df.schema)
    got = run_available_now(
        stateful_running_total(stream),
        "running_total",
        str(tmp_path / "ck5"),
        "update",
    )
    final = {r.basin_id: (r.n_obs, r.cum_rainfall_mm) for r in got.collect()}
    assert final[1] == (6, 15.0)
    assert final[2] == (0, 0.0)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Two bounded streams through the watermarked band join == the batch
    join with the same band predicate."""
    from radohydro_spark.streaming import stream_stream_join

    rows_l = [(k, f"2024-01-01 {h:02d}:00:00", float(k * 100 + h)) for k in (1, 2, 3) for h in range(6)]
    rows_r = [(k, f"2024-01-01 {h:02d}:{m:02d}:00", h * 10 + m) for k in (1, 2) for h in range(6) for m in (0, 20)]
    ldf = spark.createDataFrame(rows_l, "k int, ts_s string, lv double").select(
        "k", F.to_timestamp("ts_s").alias("ts"), "lv"
    )
    rdf = spark.createDataFrame(rows_r, "k int, ts_s string, rv int").select(
        "k", F.to_timestamp("ts_s").alias("ts"), "rv"
    )
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    ldf.write.parquet(lp)
    rdf.write.parquet(rp)
    ls = file_stream(spark, lp, ldf.schema)
    rs = file_stream(spark, rp, rdf.schema)
    joined = stream_stream_join(
        ls, rs, ["k"], watermark="10 minutes", max_lag="30 minutes", how="inner"
    )
    got = run_available_now(joined, "ssj", str(tmp_path / "ck"), output_mode="append")
    batch = ldf.alias("l").join(
        rdf.alias("r"),
        (F.col("l.k") == F.col("r.k"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("r.ts") <= F.col("l.ts")),
        "inner",
    ).select("l.k", "l.ts", "l.lv", F.col("r.ts").alias("r_ts"), F.col("r.rv").alias("r_rv"))
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert a == b and len(a) > 0


def test_foreach_batch_upsert_multi_batch(spark, tmp_path):
    """foreachBatch streaming MERGE: two micro-batches with disjoint key
    sets (order-independent) must land the same final table as one batch
    merge; a third replay with updates + deletes must match merge_upsert
    applied in batch."""
    import uuid

    from radohydro_spark.operators.merge import merge_upsert
    from radohydro_spark.streaming import foreach_batch_upsert

    src_dir = tmp_path / "changes"
    src_dir.mkdir()
    b1 = spark.createDataFrame(
        [(i, f"v{i}", False) for i in range(1, 6)], "k int, val string, is_del boolean"
    )
    b2 = spark.createDataFrame(
        [(i, f"v{i}", False) for i in range(6, 11)], "k int, val string, is_del boolean"
    )
    b1.coalesce(1).write.parquet(str(src_dir / "f1.parquet"))
    b2.coalesce(1).write.parquet(str(src_dir / "f2.parquet"))

    target = str(tmp_path / "target")
    stream = (
        spark.readStream.schema("k int, val string, is_del boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*/")
    )
    foreach_batch_upsert(
        stream,
        target,
        ["k"],
        "upsert_" + uuid.uuid4().hex[:8],
        str(tmp_path / "ck1"),
        delete_col="is_del",
    )
    got = {(r.k, r.val) for r in spark.read.parquet(target).collect()}
    assert got == {(i, f"v{i}") for i in range(1, 11)}

    # second stream: update half, delete two, insert one
    b3 = spark.createDataFrame(
        [(1, "V1", False), (2, "V2", False), (3, None, True), (9, None, True),
         (42, "v42", False)],
        "k int, val string, is_del boolean",
    )
    src2 = tmp_path / "changes2"
    src2.mkdir()
    b3.coalesce(1).write.parquet(str(src2 / "f3.parquet"))
    snapshot_before = spark.read.parquet(target).localCheckpoint()
    stream2 = (
        spark.readStream.schema("k int, val string, is_del boolean")
        .parquet(str(src2) + "/*/")
    )
    foreach_batch_upsert(
        stream2,
        target,
        ["k"],
        "upsert_" + uuid.uuid4().hex[:8],
        str(tmp_path / "ck2"),
        delete_col="is_del",
    )
    want = {
        (r.k, r.val)
        for r in merge_upsert(snapshot_before, b3, ["k"], "is_del").collect()
    }
    got2 = {(r.k, r.val) for r in spark.read.parquet(target).collect()}
    assert got2 == want
    assert (3, "v3") not in got2 and (42, "v42") in got2 and (1, "V1") in got2


def test_pyds_stream_replay_between_offsets(spark):
    """readBetweenOffsets regenerates exactly the committed span — the
    exactly-once replay contract of the custom streaming source."""
    from radohydro_spark.sources.pyds import RadohydroGridStreamReader

    r = RadohydroGridStreamReader(
        {"n_rows": "3", "n_cols": "4", "n_ts": "6", "t0": "2024-01-01 00:00:00"}
    )
    # walk read() across the horizon
    all_rows, off = [], r.initialOffset()
    for _ in range(10):
        it, nxt = r.read(off)
        all_rows.extend(it)
        if nxt == off:
            break
        off = nxt
    assert off == {"h": 6}
    assert len(all_rows) == 3 * 4 * 6
    # replay any span == the original slice
    replay = list(r.readBetweenOffsets({"h": 2}, {"h": 5}))
    direct = [row for row in all_rows if 2 <= (row[0].hour) < 5]
    assert replay == direct


def test_stateful_user_profile_tws_matches_batch(spark, tmp_path):
    """transformWithStateInPandas composite-state profile == batch GROUP BY.

    Env-gated: the Spark 4 transformWithState driver runner needs
    google.protobuf, which this container lacks; without it the operator
    must raise a clear ImportError (asserted below) instead of crashing
    the streaming query mid-plan."""
    import uuid

    from radohydro_spark.streaming.streams import (
        run_available_now,
        stateful_user_profile_tws,
    )

    sf = "/root/testdata/sf0.001"
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf)
    )
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="google.protobuf"):
            stateful_user_profile_tws(stream)
        return

    prof = stateful_user_profile_tws(stream)
    out = run_available_now(
        prof, "tws_" + uuid.uuid4().hex[:6], str(tmp_path / "ck"), "update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    batch = (
        spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
    )
    got = {r["user_id"]: r for r in final.collect()}
    exp = {r["user_id"]: r for r in batch.collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k]["n_events"] == exp[k]["n_events"]
        assert got[k]["n_types"] == exp[k]["n_types"]
        assert got[k]["sum_cents"] == exp[k]["sum_cents"]


def test_half_up_cents_matches_spark_round_and_handles_empty():
    """r9 regression (ADVICE streams.py:402): the stateful profile's
    cents accumulation used pandas .round() — half-EVEN, which splits
    from Spark's HALF_UP F.round on exact .5 cents (0.125*100 = 12.5 →
    12 vs 13).  half_up_cents is the extracted, directly-testable rule;
    also covers the all-null/empty batch that made min() raise."""
    import pandas as pd

    from radohydro_spark.streaming.streams import half_up_cents

    # exact .5-cent boundaries: half-even would give 12, 38, -12
    assert half_up_cents(pd.Series([0.125])) == 13
    assert half_up_cents(pd.Series([0.385])) == 39
    assert half_up_cents(pd.Series([-0.125])) == -13  # away from zero
    # plain values and sums of exact integers
    assert half_up_cents(pd.Series([1.10, 2.25, 0.01])) == 336
    # empty series (an all-null batch after dropna) sums to 0, no raise
    assert half_up_cents(pd.Series([], dtype="float64")) == 0


def test_half_up_cents_property_vs_decimal():
    """Hypothesis: half_up_cents equals the Decimal ROUND_HALF_UP
    reference on dyadic money values (x = k/8 dollars).  Dyadics are
    EXACTLY representable doubles and x·100 = 12.5·k is itself exact, so
    the .5-cent boundaries (odd k) are hit dead-on — the property tests
    the rounding RULE with zero float wobble.  (Non-dyadic decimals can
    legitimately land an ulp off the boundary after the ·100 product;
    there the operator's contract is only \"same double in, same cents
    out\", which the driver oracles pin instead.)"""
    from decimal import Decimal, ROUND_HALF_UP

    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from radohydro_spark.streaming.streams import half_up_cents

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**40), max_value=2**40), max_size=20
        )
    )
    def inner(raw):
        vals = [k / 8 for k in raw]  # exactly-representable dollars
        want = sum(
            int(
                (Decimal(k) * Decimal(100) / Decimal(8)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )
            for k in raw
        )
        assert half_up_cents(pd.Series(vals, dtype="float64")) == want, raw

    inner()
