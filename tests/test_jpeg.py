"""Baseline JPEG codec (sources/jpeg.py): round-trips, restart markers,
quantization, refusals, and the real decode_media dispatch."""

import struct

import numpy as np
import pytest

from radohydro_spark.sources.jpeg import (
    _ZZ_IDX,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def test_zigzag_is_spec_order():
    # spot-check the generated scan against the published T.81 sequence
    assert list(_ZZ_IDX[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZZ_IDX[-6:]) == [61, 54, 47, 55, 62, 63]
    assert sorted(_ZZ_IDX) == list(range(64))


def test_block_constant_roundtrip_exact():
    # constant 8x8 blocks + all-ones quant: only exact-integer DC
    # coefficients -> the lossy format becomes bit-exact
    rng = np.random.default_rng(3)
    for _ in range(10):
        bh, bw = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        blocks = rng.integers(0, 256, size=(bh, bw), dtype=np.uint8)
        px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        back = decode_jpeg_gray(encode_jpeg_gray(px))
        np.testing.assert_array_equal(back, px)


def test_arbitrary_content_q1_near_lossless():
    # all-ones quant on arbitrary content: only float DCT rounding -> ±1
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    back = decode_jpeg_gray(encode_jpeg_gray(px))
    assert back.shape == px.shape
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 1


def test_real_quant_table_lossy_but_close():
    q = np.array(
        [
            [16, 11, 10, 16, 24, 40, 51, 61],
            [12, 12, 14, 19, 26, 58, 60, 55],
            [14, 13, 16, 24, 40, 57, 69, 56],
            [14, 17, 22, 29, 51, 87, 80, 62],
            [18, 22, 37, 56, 68, 109, 103, 77],
            [24, 35, 55, 64, 81, 104, 113, 92],
            [49, 64, 78, 87, 103, 121, 120, 101],
            [72, 92, 95, 98, 112, 100, 103, 99],
        ],
        dtype=np.float64,
    )
    yy, xx = np.mgrid[0:64, 0:64]
    px = ((yy * 2 + xx * 2) % 256).astype(np.uint8)
    back = decode_jpeg_gray(encode_jpeg_gray(px, quant=q))
    err = np.abs(back.astype(int) - px.astype(int))
    assert err.mean() < 10


def test_ff_byte_stuffing_roundtrip():
    # values whose DC codes produce 0xFF bytes in the entropy stream must
    # round-trip through stuffing/unstuffing; brute-force a spread of
    # constants to cross plenty of byte boundaries
    for v in range(0, 256, 17):
        px = np.full((8, 8), v, dtype=np.uint8)
        np.testing.assert_array_equal(decode_jpeg_gray(encode_jpeg_gray(px)), px)


def test_restart_marker_decode():
    # hand-splice a DRI segment + RST markers between MCUs: decoder must
    # reset the DC predictor at each restart
    px = np.kron(
        np.array([[10, 200], [60, 137]], dtype=np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    blob = bytearray(encode_jpeg_gray(px))
    sos = blob.find(b"\xff\xda")
    assert sos > 0
    # decode per-MCU entropy segments by re-encoding each block alone
    parts = []
    for blk in (px[:8, :8], px[:8, 8:], px[8:, :8], px[8:, 8:]):
        b = encode_jpeg_gray(blk)
        s = b.find(b"\xff\xda")
        parts.append(b[s + 2 + struct.unpack_from(">H", b, s + 2)[0] : -2])
    dri = b"\xff\xdd\x00\x04\x00\x01"  # restart every 1 MCU
    entropy = b"".join(
        p + (b"\xff" + bytes([0xD0 + i]) if i < 3 else b"")
        for i, p in enumerate(parts)
    )
    sos_len = struct.unpack_from(">H", blob, sos + 2)[0]
    spliced = bytes(blob[:sos]) + dri + bytes(
        blob[sos : sos + 2 + sos_len]
    ) + entropy + b"\xff\xd9"
    np.testing.assert_array_equal(decode_jpeg_gray(spliced), px)


def test_refusals():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"BM\x00\x00")
    with pytest.raises(ValueError, match="multiples of 8"):
        encode_jpeg_gray(np.zeros((10, 16), dtype=np.uint8))
    with pytest.raises(ValueError, match="grayscale"):
        encode_jpeg_gray(np.zeros((8, 8, 3), dtype=np.uint8))
    # flip SOF0 -> SOF2 (progressive): must refuse by marker name
    blob = bytearray(encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8)))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="0xFFC2"):
        decode_jpeg_gray(bytes(blob))


def test_decode_media_dispatches_jpeg(spark):
    from radohydro_spark.operators.multimodal import decode_media

    px = np.kron(
        np.array([[100, 50]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg_gray(px)))], "media_id long, payload binary"
    )
    row = decode_media(df).collect()[0]
    assert (row.width, row.height, row.channels) == (16, 8, 1)
    assert abs(row.mean_intensity - 75.0) < 1e-12


def test_color_420_gray_content_exact():
    # gray constant 16x16 MCUs through the FULL color path (YCbCr forward,
    # chroma subsample, MCU interleave, upsample, inverse transform):
    # Y == v and Cb == Cr == 128 exactly, so round-trip is bit-exact
    from radohydro_spark.sources.jpeg import decode_jpeg, encode_jpeg_color

    rng = np.random.RandomState(3)
    for _ in range(6):
        mh, mw = int(rng.randint(1, 4)), int(rng.randint(1, 4))
        vals = rng.randint(0, 256, (mh, mw)).astype(np.uint8)
        gray = np.kron(vals, np.ones((16, 16), dtype=np.uint8))
        rgb = np.stack([gray] * 3, axis=2)
        img, ch = decode_jpeg(encode_jpeg_color(rgb))
        assert ch == 3
        np.testing.assert_array_equal(img, rgb)


def test_color_444_near_lossless():
    from radohydro_spark.sources.jpeg import decode_jpeg, encode_jpeg_color

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    img, ch = decode_jpeg(encode_jpeg_color(px, subsampling="4:4:4"))
    assert ch == 3 and img.shape == px.shape
    # only color-transform rounding: tight error bound
    assert np.abs(img.astype(int) - px.astype(int)).max() <= 3


def test_color_420_chroma_subsampling_loss_bounded():
    from radohydro_spark.sources.jpeg import decode_jpeg, encode_jpeg_color

    yy, xx = np.mgrid[0:32, 0:32]
    px = np.stack(
        [(yy * 4) % 256, (xx * 4) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    img, _ = decode_jpeg(encode_jpeg_color(px))
    err = np.abs(img.astype(int) - px.astype(int))
    assert err.mean() < 8


def test_color_refusals():
    from radohydro_spark.sources.jpeg import encode_jpeg_color

    with pytest.raises(ValueError, match="multiples of 16"):
        encode_jpeg_color(np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="RGB"):
        encode_jpeg_color(np.zeros((16, 16), dtype=np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_color(np.zeros((16, 16, 3), dtype=np.uint8), subsampling="4:2:2")


def test_decode_media_dispatches_color_jpeg(spark):
    from radohydro_spark.operators.multimodal import decode_media
    from radohydro_spark.sources.jpeg import encode_jpeg_color

    gray = np.kron(
        np.array([[100, 200]], dtype=np.uint8), np.ones((16, 16), np.uint8)
    )
    rgb = np.stack([gray] * 3, axis=2)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg_color(rgb)))], "media_id long, payload binary"
    )
    row = decode_media(df).collect()[0]
    assert (row.width, row.height, row.channels) == (32, 16, 3)
    assert abs(row.mean_intensity - 150.0) < 1e-12
