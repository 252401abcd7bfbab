"""PNG codec round-trips (sources/png.py) + the real decode_media path."""

import struct
import zlib

import numpy as np
import pytest

from radohydro_spark.sources.png import decode_png, encode_png


def test_gray_roundtrip_identity():
    rng = np.random.default_rng(7)
    for w, h in [(8, 6), (5, 3), (1, 1), (13, 9)]:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        img, channels = decode_png(encode_png(px))
        assert channels == 1
        np.testing.assert_array_equal(img, px)


def test_rgb_roundtrip_identity():
    rng = np.random.default_rng(11)
    for w, h in [(7, 5), (2, 3), (16, 1)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        img, channels = decode_png(encode_png(px))
        assert channels == 3
        np.testing.assert_array_equal(img, px)


def _repack_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Re-encode applying the given per-row filter types — exercises the
    decoder's unfilter paths the (filter-0) encoder never emits."""
    h, w = px.shape[:2]
    nch = 1 if px.ndim == 2 else px.shape[2]
    body = px.reshape(h, w * nch).astype(np.int32)
    stride = w * nch
    raw = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur = body[y]
        prev = body[y - 1] if y else np.zeros(stride, np.int32)
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = int(cur[x - nch]) if x >= nch else 0
            b = int(prev[x])
            c = int(prev[x - nch]) if x >= nch and y else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b if y else 0
            elif ft == 3:
                pred = (a + (b if y else 0)) // 2
            else:
                if y == 0:
                    b2, c2 = 0, 0
                else:
                    b2, c2 = b, c
                p = a + b2 - c2
                pa, pb, pc = abs(p - a), abs(p - b2), abs(p - c2)
                pred = a if (pa <= pb and pa <= pc) else (b2 if pb <= pc else c2)
            line[x] = (int(cur[x]) - pred) & 0xFF
        raw.append(ft)
        raw += bytes(line.astype(np.uint8))

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    color_type = 0 if nch == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_all_filter_types_decode():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        blob = _repack_with_filters(px, ftypes)
        img, channels = decode_png(blob)
        assert channels == 3
        np.testing.assert_array_equal(img, px, err_msg=f"filters {ftypes}")


def test_multiple_idat_chunks():
    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    blob = encode_png(px)
    # split the single IDAT into two chunks
    pos = 8
    parts = {}
    order = []
    while pos + 8 <= len(blob):
        length, tag = struct.unpack_from(">I4s", blob, pos)
        parts[tag] = blob[pos + 8 : pos + 8 + length]
        order.append(tag)
        pos += 12 + length
    idat = parts[b"IDAT"]
    half = len(idat) // 2

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    split = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", parts[b"IHDR"])
        + chunk(b"IDAT", idat[:half])
        + chunk(b"IDAT", idat[half:])
        + chunk(b"IEND", b"")
    )
    img, _ = decode_png(split)
    np.testing.assert_array_equal(img, px)


def test_refusals():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"BM123456789")
    blob = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    # IHDR payload starts at offset 16; interlace byte is the last of 13
    assert blob[12:16] == b"IHDR"
    blob[16 + 12] = 1
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(bytes(blob))
    blob = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    blob[16 + 8] = 16  # bit depth
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(blob))


def test_decode_media_dispatches_png(spark):
    from radohydro_spark.operators.multimodal import decode_media

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 90
    px[:, :, 1] = 120
    px[:, :, 2] = 150
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(px)))], "media_id long, payload binary"
    )
    row = decode_media(df).collect()[0]
    assert (row.width, row.height, row.channels) == (4, 4, 3)
    assert abs(row.mean_intensity - 120.0) < 1e-12
