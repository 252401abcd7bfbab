"""End-to-end soak: one full RADOLAN day through the real ingest path.

Synthesizes a 24-file mirror of 900x900 ESRI-ASCII rasters (~19.4M obs
rows, the reference's actual daily workload, radohydro.py:150,181), then
runs ``radohydro_run`` — manifest -> date filter -> ASCII decode UDF ->
cell grid -> spatial join -> NULL policy -> weights -> weighted agg ->
per-basin CSV + wide GeoParquet sinks — and prints wall times.

    python scripts/soak_radolan_day.py [n_basins]

The reference documents "considerable performance decrease" beyond 10k
polygons and an OOM exit when the dense stack outgrows RAM; this script is
the evidence that the Spark path handles the same day without either cliff.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N_ROWS, N_COLS = 900, 900
CELL = 1000.0
X0, Y0 = -523458.0, -4658645.0


def synth_mirror(mirror: str) -> None:
    header = (
        f"ncols {N_COLS}\nnrows {N_ROWS}\nxllcorner {X0}\nyllcorner {Y0}\n"
        f"cellsize {CELL}\nnodata_value -1\n"
    )
    r = np.arange(N_ROWS)[:, None]
    c = np.arange(N_COLS)[None, :]
    for h in range(24):
        vals = (r * 31 + c * 17 + h * 13) % 120
        nod = ((r * 13 + c * 7) % 5 == 0) & ((h + r + c) % 8 == 0)
        grid = np.where(nod, -1, vals).astype(np.int32)
        # ESRI-ASCII rows run north->south; row 0 of the file is the TOP
        body = "\n".join(" ".join(map(str, row)) for row in grid[::-1])
        # digit groups must concatenate to a leading yyyyMMddHHmm (F8)
        with open(os.path.join(mirror, f"radolan_20240101{h:02d}00.asc"), "w") as f:
            f.write(header + body + "\n")


def main() -> None:
    n_basins = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from radohydro_spark import get_spark
    from radohydro_spark.sources.synthetic import RADOLAN_SCALE, radolan_scale_basins

    spark = get_spark("soak")
    mirror = tempfile.mkdtemp(prefix="radolan_mirror_")
    out = tempfile.mkdtemp(prefix="radolan_out_")
    t0 = time.perf_counter()
    synth_mirror(mirror)
    t_synth = time.perf_counter() - t0

    basins = radolan_scale_basins(spark, RADOLAN_SCALE, n_basins=n_basins)
    from radohydro_spark.plans.pipeline import radohydro_run

    t0 = time.perf_counter()
    result = radohydro_run(
        spark,
        start="2024-01-01 00:00:00",
        end="2024-01-01 23:59:00",
        shapefile_path=basins,
        mirror_dir=mirror,
        out_dir=out,
        source="radolan",
        date_type="minutes",
    )
    n = result.count()
    t_run = time.perf_counter() - t0
    csvs = [f for f in os.listdir(out) if f.endswith(".csv")]
    print(
        f"soak: {n_basins} basins, 24 rasters (900x900, 19.4M obs): "
        f"synth {t_synth:.1f}s, pipeline+sinks {t_run:.1f}s, "
        f"{n} result rows, {len(csvs)} basin CSVs"
    )
    shutil.rmtree(mirror, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
