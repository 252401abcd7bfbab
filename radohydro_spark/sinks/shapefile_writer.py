"""ESRI shapefile writer (K2/K3 true format parity) — dependency-free
``.shp``/``.shx``/``.dbf`` emitter, the sink-side twin of the reader in
``sources/shapefile.py``.

The reference's wide vector sink is ``gdf.to_file(...)`` onto a shapefile
(reference geotools/geotools.py:321-330), refused above 500 data columns
because dBase caps fields (README.md:17).  This engine keeps long CSV (K1)
and GeoParquet (K2) as the scale sinks and adds this writer for users whose
downstream tooling requires the actual ESRI format.  The same 500-column
guard applies — crossing it raises with a pointer to the GeoParquet sink
rather than writing a file other tools cannot read.

Format layout follows the public ESRI Shapefile Technical Description
(July 1998) and the dBase III spec, mirroring the reader:

* ``.shp``  — 100-byte header (big-endian file code 9994 / length,
  little-endian version + shape type + bbox); per record an 8-byte
  big-endian header then a little-endian Polygon (type 5) body.
* ``.shx``  — same header; one (offset, content length) pair per record.
* ``.dbf``  — 0x03 version byte, record count, 32-byte field descriptors
  (names hard-truncated to 10 chars — the dBase limit the reference's
  GeoPandas path also hits), fixed-width ASCII rows.

Ring orientation on disk: exterior rings clockwise (negative signed area),
holes counter-clockwise — enforced at write so any reader regroups
correctly.  Writes are driver-side by contract: vector sinks are
dimension-sized (basins / clip-window cell grids), never fact-sized.
"""

from __future__ import annotations

import datetime as _dt
import struct
from typing import Any

from pyspark.sql import DataFrame

from radohydro_spark.geometry.wkb import parse_wkb_polygons

Ring = list[tuple[float, float]]

MAX_DBF_FIELDS = 500  # reference refusal threshold (README.md:17)
# Row-cap for the driver-side collect: vector layers are basin-dimension
# sized by contract (the reference's whole workload is <1e4 basins); a
# fact-sized frame mis-wired into this sink must fail loudly, not OOM the
# driver.  10M rows x ~200 B/row ~ 2 GB — far above any real vector layer,
# far below driver heap death.
MAX_SHAPEFILE_ROWS = 10_000_000


def _signed_area(ring: Ring) -> float:
    s = 0.0
    for (x0, y0), (x1, y1) in zip(ring, ring[1:]):
        s += x0 * y1 - x1 * y0
    return s / 2.0


def _closed(ring: Ring) -> Ring:
    return ring if ring and ring[0] == ring[-1] else ring + [ring[0]]


def _oriented(ring: Ring, clockwise: bool) -> Ring:
    ring = _closed([tuple(p) for p in ring])
    is_cw = _signed_area(ring) <= 0
    return ring if is_cw == clockwise else ring[::-1]


def _polygon_record(polys: list[list[Ring]]) -> bytes:
    """Little-endian Polygon (type 5) record content: all rings of all
    polygons concatenated, exteriors CW, holes CCW."""
    rings: list[Ring] = []
    for rs in polys:
        if not rs:
            continue
        rings.append(_oriented(rs[0], clockwise=True))
        rings.extend(_oriented(h, clockwise=False) for h in rs[1:])
    if not rings:
        return struct.pack("<i", 0)  # null shape
    xs = [x for r in rings for x, _ in r]
    ys = [y for r in rings for _, y in r]
    parts, off = [], 0
    for r in rings:
        parts.append(off)
        off += len(r)
    out = [
        struct.pack("<i4d", 5, min(xs), min(ys), max(xs), max(ys)),
        struct.pack("<ii", len(rings), off),
        struct.pack(f"<{len(parts)}i", *parts),
    ]
    for r in rings:
        out.append(struct.pack(f"<{2 * len(r)}d", *[c for p in r for c in p]))
    return b"".join(out)


def _shp_header(total_words: int, shape_type: int, bbox) -> bytes:
    xmin, ymin, xmax, ymax = bbox
    return (
        struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, total_words)
        + struct.pack("<ii", 1000, shape_type)
        + struct.pack("<4d", xmin, ymin, xmax, ymax)
        + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
    )


def _dbf_field_spec(name: str, values: list[Any]) -> tuple[str, str, int, int]:
    """(name<=10, type, length, decimals) inferred from the column values."""
    non_null = [v for v in values if v is not None]
    sample = non_null[0] if non_null else ""
    if isinstance(sample, bool):
        return name, "L", 1, 0
    if isinstance(sample, int):
        width = max([len(str(v)) for v in non_null] + [1])
        return name, "N", max(width, 1), 0
    if isinstance(sample, float):
        dec = 11
        width = max([len(f"{v:.{dec}f}") for v in non_null] + [1])
        return name, "N", min(max(width, dec + 2), 31), dec
    if isinstance(sample, (_dt.date, _dt.datetime)):
        return name, "D", 8, 0
    width = max([len(str(v)) for v in non_null] + [1])
    return name, "C", min(width, 254), 0


def _dbf_format(value: Any, ftype: str, length: int, dec: int) -> bytes:
    if value is None:
        return (b"?" if ftype == "L" else b" ") * length
    if ftype == "L":
        return b"T" if value else b"F"
    if ftype == "D":
        return f"{value:%Y%m%d}".encode("ascii")
    if ftype == "N" and dec > 0:
        s = f"{value:.{dec}f}"
        if len(s) > length:  # magnitude overflow: shed decimals, keep digits
            s = f"{value:.{max(0, length - len(s.split('.')[0]) - 1)}f}"[:length]
        return s.rjust(length).encode("ascii")
    if ftype == "N":
        return str(value).rjust(length)[:length].encode("ascii")
    return str(value)[:length].ljust(length).encode("latin-1", errors="replace")


def _unique_names(cols: list[str]) -> list[str]:
    """dBase 10-char truncation with collision suffixes (A, A_1, ...)."""
    seen: dict[str, int] = {}
    out = []
    for c in cols:
        base = c[:10]
        if base not in seen:
            seen[base] = 0
            out.append(base)
        else:
            seen[base] += 1
            suffix = f"_{seen[base]}"
            out.append(base[: 10 - len(suffix)] + suffix)
    return out


def write_shapefile(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    encoding: str = "latin-1",
) -> None:
    """Write ``df`` (WKB geometry + attribute columns) as ``<path>.shp`` +
    ``.shx`` + ``.dbf``.

    Driver-side collect by contract — the same dimension-sized-action
    contract as the basin-metadata collect in ``sinks.py``: the shapefile
    format is inherently single-writer (monolithic header + record
    offsets), and vector layers are basin-dimension sized (the reference's
    whole workload is <1e4 basins).  The collect is guarded by
    ``MAX_SHAPEFILE_ROWS`` (checked with a cheap pre-count) so a mis-wired
    fact table fails loudly instead of OOMing the driver; row order is
    preserved, so ``basins_from_shapefile``'s file-order surrogate key
    round-trips.  Raises on >500 attribute columns — the reference's
    documented dBase refusal (README.md:17); the GeoParquet sink
    (``write_wide_geoparquet``) has no such cliff and scales out.
    """
    attr_cols = [c for c in df.columns if c != geom_col]
    if len(attr_cols) > MAX_DBF_FIELDS:
        raise ValueError(
            f"{len(attr_cols)} attribute columns exceed the {MAX_DBF_FIELDS}-field "
            "dBase limit (reference README.md:17) — use write_wide_geoparquet "
            "for wide outputs"
        )
    projected = df.select(*attr_cols, geom_col)
    n_rows = projected.count()
    if n_rows > MAX_SHAPEFILE_ROWS:
        raise ValueError(
            f"refusing to collect {n_rows} rows into a driver-side shapefile "
            f"(cap {MAX_SHAPEFILE_ROWS}): this sink is for dimension-sized "
            "vector layers — a fact-sized frame here is a wiring bug; use "
            "write_wide_geoparquet for distributed output"
        )
    rows = projected.collect()
    base = path[:-4] if path.lower().endswith(".shp") else path

    # --- .shp / .shx ---
    contents = []
    for r in rows:
        wkb = r[geom_col]
        polys = parse_wkb_polygons(bytes(wkb)) if wkb is not None else []
        contents.append(_polygon_record([[list(ring) for ring in p] for p in polys]))
    all_pts = [
        struct.unpack_from("<4d", c, 4)
        for c in contents
        if len(c) > 4
    ]
    if all_pts:
        bbox = (
            min(b[0] for b in all_pts),
            min(b[1] for b in all_pts),
            max(b[2] for b in all_pts),
            max(b[3] for b in all_pts),
        )
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)
    shp_words = 50 + sum(4 + len(c) // 2 for c in contents)
    with open(base + ".shp", "wb") as f:
        f.write(_shp_header(shp_words, 5, bbox))
        for i, c in enumerate(contents, start=1):
            f.write(struct.pack(">ii", i, len(c) // 2))
            f.write(c)
    with open(base + ".shx", "wb") as f:
        f.write(_shp_header(50 + 4 * len(contents), 5, bbox))
        off = 50
        for c in contents:
            f.write(struct.pack(">ii", off, len(c) // 2))
            off += 4 + len(c) // 2

    # --- .dbf ---
    names = _unique_names(attr_cols)
    specs = [
        _dbf_field_spec(n, [r[c] for r in rows])
        for n, c in zip(names, attr_cols)
    ]
    record_size = 1 + sum(s[2] for s in specs)
    header_size = 32 + 32 * len(specs) + 1
    today = _dt.date.today()
    with open(base + ".dbf", "wb") as f:
        f.write(
            struct.pack(
                "<4BIHH20x",
                0x03,
                today.year - 1900,
                today.month,
                today.day,
                len(rows),
                header_size,
                record_size,
            )
        )
        for name, ftype, length, dec in specs:
            f.write(
                name.encode("ascii")[:10].ljust(11, b"\x00")
                + ftype.encode("ascii")
                + b"\x00" * 4
                + struct.pack("<BB", length, dec)
                + b"\x00" * 14
            )
        f.write(b"\x0d")
        for r in rows:
            f.write(b" ")
            for c, (name, ftype, length, dec) in zip(attr_cols, specs):
                f.write(_dbf_format(r[c], ftype, length, dec))
        f.write(b"\x1a")


def write_wide_shapefile(
    result: DataFrame,
    basins: DataFrame,
    path: str,
    ts_fmt: str = "yyMMddHHmm",
) -> None:
    """K2 exact-format parity: the reference's wide basin shapefile
    (one ``%y%m%d%H%M`` FLOAT column per timestep joined onto basin
    geometry, geotools/geotools.py:171-176,321-330) — including its
    500-column dBase refusal.  Long CSV (K1) and GeoParquet stay the scale
    sinks; this exists so a radohydro user's downstream shapefile tooling
    keeps working unchanged."""
    from radohydro_spark.operators.aggregate import pivot_wide

    wide = pivot_wide(result, ts_format=ts_fmt)
    out = basins.join(wide, "basin_id", "left")
    write_shapefile(out, path)
