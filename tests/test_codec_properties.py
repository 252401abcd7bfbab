"""Hypothesis property tests for the from-scratch media codecs.

Shapes and content are adversarially generated; round-trips must hold
for every case, not just the fixture laws the driver queries use.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from radohydro_spark.sources.bmp import decode_bmp, encode_bmp
from radohydro_spark.sources.jpeg import decode_jpeg_gray, encode_jpeg_gray
from radohydro_spark.sources.png import decode_png, encode_png

_settings = settings(max_examples=25, deadline=None)


@st.composite
def gray_image(draw, max_side=24):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)


@st.composite
def rgb_image(draw, max_side=16):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@_settings
@given(gray_image())
def test_png_gray_roundtrip_exact(px):
    img, ch = decode_png(encode_png(px))
    assert ch == 1
    np.testing.assert_array_equal(img, px)


@_settings
@given(rgb_image())
def test_png_rgb_roundtrip_exact(px):
    img, ch = decode_png(encode_png(px))
    assert ch == 3
    np.testing.assert_array_equal(img, px)


@_settings
@given(gray_image())
def test_bmp_gray_roundtrip_exact(px):
    img, ch = decode_bmp(encode_bmp(px))
    assert ch == 1
    np.testing.assert_array_equal(img, px)


@_settings
@given(rgb_image())
def test_bmp_rgb_roundtrip_exact(px):
    img, ch = decode_bmp(encode_bmp(px))
    assert ch == 3
    np.testing.assert_array_equal(img, px)


@_settings
@given(st.integers(1, 4), st.integers(1, 4), st.integers(0, 2**31 - 1))
def test_jpeg_q1_roundtrip_within_one(bh, bw, seed):
    # all-ones quant: arbitrary content may shift at most ±1 per pixel
    # (pure float-DCT rounding), any block grid
    px = np.random.RandomState(seed).randint(
        0, 256, (bh * 8, bw * 8), dtype=np.uint8
    )
    back = decode_jpeg_gray(encode_jpeg_gray(px))
    assert back.shape == px.shape
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 1


@_settings
@given(st.integers(1, 4), st.integers(1, 4), st.integers(0, 2**31 - 1))
def test_jpeg_block_constant_exact(bh, bw, seed):
    blocks = np.random.RandomState(seed).randint(
        0, 256, (bh, bw), dtype=np.uint8
    )
    px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    np.testing.assert_array_equal(decode_jpeg_gray(encode_jpeg_gray(px)), px)
