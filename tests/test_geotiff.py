"""GeoTIFF codec (S9 source / K4 sink): round-trips, format corners, and
the Spark decode path's equivalence with the ASCII-grid source."""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np
import pytest

from radohydro_spark.sources.geotiff import (
    decode_geotiffs,
    encode_geotiff,
    geotiff_meta,
    parse_geotiff,
)


def _grid(nr=7, nc=5, dtype="float32"):
    a = (np.arange(nr * nc, dtype="float64").reshape(nr, nc) * 1.5 - 3.0).astype(dtype)
    return a


def test_roundtrip_float32_deflate():
    a = _grid()
    blob = encode_geotiff(a, ulx=3500000.0, uly=5600000.0, xres=1000.0, yres=-1000.0)
    meta, out = parse_geotiff(blob)
    assert meta["n_rows"] == 7 and meta["n_cols"] == 5
    assert meta["ulx"] == 3500000.0 and meta["uly"] == 5600000.0
    assert meta["xres"] == 1000.0 and meta["yres"] == -1000.0
    np.testing.assert_allclose(out, a.astype("float64"))


def test_roundtrip_int16_uncompressed_multistrip():
    a = (np.arange(200 * 3).reshape(200, 3) % 1000).astype("int16")
    blob = encode_geotiff(a, 0.0, 200.0, 1.0, -1.0, compress=False, rows_per_strip=64)
    meta, out = parse_geotiff(blob)
    np.testing.assert_array_equal(out, a.astype("float64"))


def test_nodata_becomes_nan():
    a = _grid(dtype="float32")
    a[0, 0] = -9999.0
    blob = encode_geotiff(a, 0.0, 7.0, 1.0, -1.0, nodata=-9999.0)
    meta, out = parse_geotiff(blob)
    assert meta["nodata"] == -9999.0
    assert math.isnan(out[0, 0]) and not math.isnan(out[1, 1])


def test_geotiff_meta_probe():
    blob = encode_geotiff(_grid(), 10.0, 20.0, 2.0, -2.0)
    m = geotiff_meta(blob)
    assert (m["ulx"], m["uly"], m["xres"], m["yres"]) == (10.0, 20.0, 2.0, -2.0)


def test_big_endian_parse():
    # hand-rolled minimal MM-order stripped uint16 TIFF, one strip inline
    a = np.array([[1, 2], [3, 40000]], dtype=">u2")
    strip = a.tobytes()
    entries = [
        (256, 3, 1, struct.pack(">H", 2) + b"\x00\x00"),
        (257, 3, 1, struct.pack(">H", 2) + b"\x00\x00"),
        (258, 3, 1, struct.pack(">H", 16) + b"\x00\x00"),
        (259, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
        (273, 4, 1, None),  # patched
        (277, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
        (278, 3, 1, struct.pack(">H", 2) + b"\x00\x00"),
        (279, 4, 1, struct.pack(">I", len(strip))),
        (339, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
    ]
    ifd_at = 8
    data_at = ifd_at + 2 + 12 * len(entries) + 4
    out = struct.pack(">2sHI", b"MM", 42, ifd_at) + struct.pack(">H", len(entries))
    for tag, typ, count, val in entries:
        if val is None:
            val = struct.pack(">I", data_at)
        out += struct.pack(">HHI", tag, typ, count) + val
    out += struct.pack(">I", 0) + strip
    meta, arr = parse_geotiff(out)
    np.testing.assert_array_equal(arr, np.array([[1, 2], [3, 40000]], dtype="float64"))


def test_tiled_deflate_parse():
    # 5x5 float32 in 4x4 tiles (2x2 tile grid, edge tiles padded)
    a = np.arange(25, dtype="float32").reshape(5, 5)
    tw = tl = 4
    tiles = []
    for tr in range(2):
        for tc in range(2):
            tile = np.zeros((tl, tw), dtype="<f4")
            rs = min(tl, 5 - tr * tl)
            cs = min(tw, 5 - tc * tw)
            tile[:rs, :cs] = a[tr * tl : tr * tl + rs, tc * tw : tc * tw + cs]
            tiles.append(zlib.compress(tile.tobytes()))
    entries = [
        (256, 3, 1, struct.pack("<H", 5) + b"\x00\x00"),
        (257, 3, 1, struct.pack("<H", 5) + b"\x00\x00"),
        (258, 3, 1, struct.pack("<H", 32) + b"\x00\x00"),
        (259, 3, 1, struct.pack("<H", 8) + b"\x00\x00"),
        (277, 3, 1, struct.pack("<H", 1) + b"\x00\x00"),
        (322, 3, 1, struct.pack("<H", tw) + b"\x00\x00"),
        (323, 3, 1, struct.pack("<H", tl) + b"\x00\x00"),
        (324, 4, 4, "OFFS"),
        (325, 4, 4, "CNTS"),
        (339, 3, 1, struct.pack("<H", 3) + b"\x00\x00"),
    ]
    ifd_at = 8
    ooline_at = ifd_at + 2 + 12 * len(entries) + 4
    offs_blob_at = ooline_at
    cnts_blob_at = offs_blob_at + 16
    tile_at = cnts_blob_at + 16
    offsets, cnts = [], []
    pos = tile_at
    for t in tiles:
        offsets.append(pos)
        cnts.append(len(t))
        pos += len(t)
    out = struct.pack("<2sHI", b"II", 42, ifd_at) + struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        if val == "OFFS":
            val = struct.pack("<I", offs_blob_at)
        elif val == "CNTS":
            val = struct.pack("<I", cnts_blob_at)
        out += struct.pack("<HHI", tag, typ, count) + val
    out += struct.pack("<I", 0)
    out += struct.pack("<4I", *offsets) + struct.pack("<4I", *cnts)
    for t in tiles:
        out += t
    meta, arr = parse_geotiff(out)
    np.testing.assert_array_equal(arr, a.astype("float64"))


def test_reject_garbage():
    with pytest.raises(ValueError):
        parse_geotiff(b"PK\x03\x04 not a tiff at all")


def test_spark_decode_matches_ascii_source(spark):
    """The same raster through the GeoTIFF and ASCII-grid decoders must
    produce identical obs rows (shared pipeline contract)."""
    from radohydro_spark.schemas import MANIFEST_SCHEMA
    from radohydro_spark.sources.ascii_grid import decode_ascii_grids

    a = _grid(6, 4, "float64")
    a[2, 3] = np.nan
    stored = np.where(np.isnan(a), -1.0, a)
    blob = encode_geotiff(stored.astype("float32"), 0.0, 6.0, 1.0, -1.0, nodata=-1.0)
    hdr = "ncols 4\nnrows 6\nxllcorner 0\nyllcorner 0\ncellsize 1\nNODATA_value -1\n"
    body = "\n".join(" ".join(f"{v:g}" for v in row) for row in stored)
    man_t = spark.createDataFrame(
        [("ra202401010050.tif", None, "recent", bytearray(blob))],
        schema=MANIFEST_SCHEMA,
    )
    man_a = spark.createDataFrame(
        [("ra202401010050.asc", None, "recent", bytearray((hdr + body).encode()))],
        schema=MANIFEST_SCHEMA,
    )
    t_rows = decode_geotiffs(man_t, "minutes").orderBy("cell_row", "cell_col").collect()
    a_rows = decode_ascii_grids(man_a, "minutes").orderBy("cell_row", "cell_col").collect()
    assert len(t_rows) == len(a_rows) == 24
    for tr, ar in zip(t_rows, a_rows):
        assert tr["ts"] == ar["ts"]
        assert (tr["cell_row"], tr["cell_col"]) == (ar["cell_row"], ar["cell_col"])
        if ar["value"] is None:
            assert tr["value"] is None
        else:
            assert math.isclose(tr["value"], ar["value"], rel_tol=1e-6)


def test_sink_roundtrip(spark, tmp_path):
    from radohydro_spark.sinks import write_geotiff

    df = spark.createDataFrame(
        [(r, c, float(r * 10 + c)) for r in range(3) for c in range(4) if (r, c) != (1, 2)],
        "cell_row int, cell_col int, burn double",
    )
    path = str(tmp_path / "out.tif")
    write_geotiff(df, path, ulx=100.0, uly=103.0, xres=1.0, yres=-1.0)
    meta, arr = parse_geotiff(open(path, "rb").read())
    assert meta["ulx"] == 100.0 and meta["yres"] == -1.0
    assert arr[0, 0] == 0.0 and arr[2, 3] == 23.0
    assert math.isnan(arr[1, 2])  # unset cell -> nodata -> NaN
