"""GIF codec (sources/gif.py): LZW round-trips, real growing-dictionary
streams, 89a extensions, refusals, decode_media dispatch."""

import struct

import numpy as np
import pytest

from radohydro_spark.sources.gif import decode_gif, encode_gif


def test_gray_roundtrip_identity():
    rng = np.random.default_rng(7)
    for w, h in [(8, 6), (1, 1), (13, 9), (40, 25)]:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        img, ch = decode_gif(encode_gif(px))
        assert ch == 1
        np.testing.assert_array_equal(img, px)


def test_large_image_multi_subblock():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(100, 200), dtype=np.uint8)
    img, _ = decode_gif(encode_gif(px))
    np.testing.assert_array_equal(img, px)


def _giflib_style_lzw(pixels: bytes, min_code: int = 8) -> bytes:
    """Proper growing-dictionary LZW with giflib's code-count width rule —
    exercises decoder paths (dict growth, width bumps, KwKwK) that the
    library's uncompressed writer never produces."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    running = eoi + 1
    acc = nbits = 0
    out = bytearray()

    def emit(c):
        nonlocal acc, nbits, width, running
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        running += 1
        if running > (1 << width) and width < 12:
            width += 1

    d = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    width, running = min_code + 1, eoi + 1
    wbuf = b""
    for b in pixels:
        nb = wbuf + bytes([b])
        if nb in d:
            wbuf = nb
        else:
            emit(d[wbuf])
            if next_code < 4096:
                d[nb] = next_code
                next_code += 1
            wbuf = bytes([b])
    if wbuf:
        emit(d[wbuf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_decodes_real_growing_dictionary_lzw():
    px = np.tile(np.arange(64, dtype=np.uint8).repeat(3), 300).reshape(60, 960)[
        :, :900
    ]
    px = np.ascontiguousarray(px)
    lzw = _giflib_style_lzw(bytes(px.ravel()))
    assert len(lzw) < px.size // 4  # genuinely compressed
    palette = bytes(v for g in range(256) for v in (g, g, g))
    blocks = bytearray([8])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    blob = (
        b"GIF89a"
        + struct.pack("<HHBBB", 900, 60, 0xF7, 0, 0)
        + palette
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext: skipped
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 900, 60, 0)
        + bytes(blocks)
        + b"\x3b"
    )
    img, ch = decode_gif(blob)
    assert ch == 1
    np.testing.assert_array_equal(img, px)


def test_color_palette_decodes_rgb():
    # non-gray local palette: output must be (h, w, 3)
    px = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    blob = bytearray(encode_gif(px))
    # overwrite the first three global palette entries with distinct colors
    pal_off = 13
    blob[pal_off : pal_off + 9] = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    img, ch = decode_gif(bytes(blob))
    assert ch == 3
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[0, 1]) == (0, 255, 0)
    assert tuple(img[1, 0]) == (0, 0, 255)


def test_refusals():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF")
    blob = bytearray(encode_gif(np.zeros((4, 4), dtype=np.uint8)))
    # image descriptor sits right after header(13) + 256-entry palette(768)
    desc = 13 + 768
    assert blob[desc] == 0x2C
    blob[desc + 9] |= 0x40  # set the interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(blob))
    with pytest.raises(ValueError, match="grayscale"):
        encode_gif(np.zeros((4, 4, 3), dtype=np.uint8))


def test_decode_media_dispatches_gif(spark):
    from radohydro_spark.operators.multimodal import decode_media

    px = np.full((6, 9), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(px)))], "media_id long, payload binary"
    )
    row = decode_media(df).collect()[0]
    assert (row.width, row.height, row.channels) == (9, 6, 1)
    assert abs(row.mean_intensity - 77.0) < 1e-12
