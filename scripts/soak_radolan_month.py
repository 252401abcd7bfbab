"""Month-equivalent RADOLAN soak: 720 hourly rasters end-to-end.

The reference dies at ~500 timesteps: it np.dstacks every decoded grid
into one dense in-RAM array and ``sys.exit``s when that outgrows memory
(radohydro.py:257-260), and README.md:17 documents the cliff.  This soak
drives 30 days x 24 hourly 900x900 rasters (~583M decoded obs rows,
~1.4x past the documented cliff in timestep count) through the REAL
ingest entry — ``radohydro_run``: manifest -> date filter -> ASCII
decode UDF -> cell grid -> spatial join -> NULL policy -> weights ->
weighted agg -> per-basin CSV + wide GeoParquet sinks — with the
compute-once persist pool active, and records wall plus executor-truth
shuffle/spill deltas like soak_sf1.py.

Nothing is ever stacked dense: decoded observations stream through the
weighted aggregation one partition at a time, so memory is bounded by
partition size, not by n_timesteps.

    python scripts/soak_radolan_month.py [n_days] [n_basins]

Defaults 30 days / 20 basins.  Day-1's 24 grids are synthesized once and
hard-linked under day-stamped names for days 2..N — file CONTENT repeats
but every file is opened, decoded, and aggregated independently (the
filename carries the timestamp), so the measured work is the real
30-day volume.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import numpy as np

N_ROWS, N_COLS = 900, 900
CELL = 1000.0
X0, Y0 = -523458.0, -4658645.0


def synth_mirror(mirror: str, n_days: int) -> int:
    header = (
        f"ncols {N_COLS}\nnrows {N_ROWS}\nxllcorner {X0}\nyllcorner {Y0}\n"
        f"cellsize {CELL}\nnodata_value -1\n"
    )
    r = np.arange(N_ROWS)[:, None]
    c = np.arange(N_COLS)[None, :]
    day1 = []
    for h in range(24):
        vals = (r * 31 + c * 17 + h * 13) % 120
        nod = ((r * 13 + c * 7) % 5 == 0) & ((h + r + c) % 8 == 0)
        grid = np.where(nod, -1, vals).astype(np.int32)
        body = "\n".join(" ".join(map(str, row)) for row in grid[::-1])
        p = os.path.join(mirror, f"radolan_20240101{h:02d}00.asc")
        with open(p, "w") as f:
            f.write(header + body + "\n")
        day1.append(p)
    n_files = 24
    for d in range(2, n_days + 1):
        for h, src in enumerate(day1):
            os.link(
                src, os.path.join(mirror, f"radolan_202401{d:02d}{h:02d}00.asc")
            )
            n_files += 1
    return n_files


def _stage_totals(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    tot = {
        "shuffle_read_mb": 0.0,
        "shuffle_write_mb": 0.0,
        "mem_spill_mb": 0.0,
        "disk_spill_mb": 0.0,
    }
    for s in stages:
        tot["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
        tot["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
        tot["mem_spill_mb"] += s.get("memoryBytesSpilled", 0) / 1e6
        tot["disk_spill_mb"] += s.get("diskBytesSpilled", 0) / 1e6
    return tot


def main() -> None:
    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n_basins = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    from radohydro_spark import get_spark
    from radohydro_spark.plans.pipeline import radohydro_run
    from radohydro_spark.sources.synthetic import RADOLAN_SCALE, radolan_scale_basins

    spark = get_spark(
        "soak_radolan_month",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )
    mirror = tempfile.mkdtemp(prefix="radolan_month_")
    out = tempfile.mkdtemp(prefix="radolan_month_out_")
    t0 = time.perf_counter()
    n_files = synth_mirror(mirror, n_days)
    t_synth = time.perf_counter() - t0
    print(f"synth: {n_files} rasters in {t_synth:.1f}s", flush=True)

    basins = radolan_scale_basins(spark, RADOLAN_SCALE, n_basins=n_basins)
    before = _stage_totals(spark)
    t0 = time.perf_counter()
    result = radohydro_run(
        spark,
        start="2024-01-01 00:00:00",
        end=f"2024-01-{n_days:02d} 23:59:00",
        shapefile_path=basins,
        mirror_dir=mirror,
        out_dir=out,
        source="radolan",
        date_type="minutes",
    )
    n = result.count()
    wall = time.perf_counter() - t0
    after = _stage_totals(spark)
    delta = {k: round(after[k] - before[k], 1) for k in after}
    csvs = [f for f in os.listdir(out) if f.endswith(".csv")]
    summary = {
        "n_days": n_days,
        "n_rasters": n_files,
        "n_basins": n_basins,
        "obs_rows_decoded": n_files * N_ROWS * N_COLS,
        "result_rows": n,
        "basin_csvs": len(csvs),
        "wall_s": round(wall, 1),
        **delta,
    }
    print(json.dumps(summary))
    shutil.rmtree(mirror, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
