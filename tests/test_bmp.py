"""BMP codec round-trips (sources/bmp.py) + the real decode_media path."""

import numpy as np
import pytest

from radohydro_spark.sources.bmp import decode_bmp, encode_bmp


def test_gray_roundtrip_identity():
    rng = np.random.default_rng(7)
    for w, h in [(8, 6), (5, 3), (1, 1), (13, 9), (4, 4)]:  # odd widths hit padding
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        img, channels = decode_bmp(encode_bmp(px))
        assert channels == 1
        assert img.shape == (h, w)
        np.testing.assert_array_equal(img, px)


def test_rgb_roundtrip_identity():
    rng = np.random.default_rng(11)
    for w, h in [(7, 5), (2, 3), (16, 1)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        img, channels = decode_bmp(encode_bmp(px))
        assert channels == 3
        assert img.shape == (h, w, 3)
        np.testing.assert_array_equal(img, px)


def test_topdown_row_order():
    # negative height = top-down storage; flip the sign in the header and
    # the payload rows, decode must agree with the bottom-up twin
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)
    blob = bytearray(encode_bmp(px))
    import struct

    w, h = struct.unpack_from("<ii", blob, 18)
    assert (w, h) == (6, 4)
    struct.pack_into("<ii", blob, 18, w, -h)
    offset = struct.unpack_from("<I", blob, 10)[0]
    stride = ((w + 3) // 4) * 4
    rows = [bytes(blob[offset + i * stride : offset + (i + 1) * stride]) for i in range(h)]
    blob[offset:] = b"".join(reversed(rows))
    img, channels = decode_bmp(bytes(blob))
    assert channels == 1
    np.testing.assert_array_equal(img, px)


def test_rejects_non_bmp_and_truncation():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG" + b"\x00" * 100)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(b"BM" + b"\x00" * 10)
    whole = encode_bmp(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(whole[:-3])


def test_decode_media_real_path(spark):
    from radohydro_spark.operators.multimodal import decode_media

    px_a = np.full((3, 5), 10, dtype=np.uint8)
    px_b = np.arange(12, dtype=np.uint8).reshape(4, 3)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px_a))), (2, bytearray(encode_bmp(px_b)))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (5, 3, 1)
    assert rows[1]["mean_intensity"] == pytest.approx(10.0)
    assert (rows[2]["width"], rows[2]["height"]) == (3, 4)
    assert rows[2]["mean_intensity"] == pytest.approx(float(px_b.mean()))


def test_decode_media_rejects_unknown_format(spark):
    from radohydro_spark.operators.multimodal import decode_media

    df = spark.createDataFrame([(1, bytearray(b"nonsense"))], "media_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|only BMP"):
        decode_media(df).collect()
