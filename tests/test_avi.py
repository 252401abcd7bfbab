"""AVI/MJPEG container codec (sources/avi.py) + the decode_video path."""

import struct

import numpy as np
import pytest

from radohydro_spark.sources.avi import (
    decode_avi_mjpeg_stats,
    encode_avi_mjpeg,
    extract_frame,
    parse_avi,
)
from radohydro_spark.sources.jpeg import decode_jpeg_gray, encode_jpeg_gray


def _clip(n_frames=5, seed=0):
    frames, arrays = [], []
    for f in range(n_frames):
        blocks = np.array(
            [[(seed + f * 13 + 10) % 256, (seed + f * 13 + 17) % 256]],
            dtype=np.uint8,
        )
        px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        frames.append(encode_jpeg_gray(px))
        arrays.append(px)
    return encode_avi_mjpeg(frames, 16, 8, fps=25), arrays


def test_container_roundtrip():
    blob, arrays = _clip(7)
    meta = parse_avi(blob)
    assert (meta["n_frames"], meta["width"], meta["height"], meta["fps"]) == (
        7, 16, 8, 25,
    )
    for i, px in enumerate(arrays):
        np.testing.assert_array_equal(
            decode_jpeg_gray(extract_frame(blob, meta, i)), px
        )


def test_frame_sampling_stats():
    blob, arrays = _clip(6)
    s = decode_avi_mjpeg_stats(blob, sample_every=3)
    assert s["n_sampled"] == 2  # frames 0, 3
    expect = np.concatenate([arrays[0].ravel(), arrays[3].ravel()]).astype(
        float
    ).mean()
    assert abs(s["mean_intensity"] - expect) < 1e-12


def test_odd_sized_frames_pad_correctly():
    # odd-length JPEG payloads force RIFF word padding between chunks
    frames = []
    for f in range(3):
        px = np.full((8, 8), 50 + f, dtype=np.uint8)
        frames.append(encode_jpeg_gray(px))
    blob = encode_avi_mjpeg(frames, 8, 8)
    meta = parse_avi(blob)
    assert meta["n_frames"] == 3
    for i in range(3):
        np.testing.assert_array_equal(
            decode_jpeg_gray(extract_frame(blob, meta, i)),
            np.full((8, 8), 50 + i, dtype=np.uint8),
        )


def test_refusals():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    blob, _ = _clip(2)
    # flip the codec fourcc in strh to XVID
    pos = blob.find(b"vids") + 4
    bad = blob[:pos] + b"XVID" + blob[pos + 4 :]
    with pytest.raises(ValueError, match="MJPG"):
        parse_avi(bad)
    # header/chunk-count mismatch: claim 9 frames in avih
    avih_pos = blob.find(b"avih") + 8
    bad2 = bytearray(blob)
    struct.pack_into("<I", bad2, avih_pos + 16, 9)
    with pytest.raises(ValueError, match="mismatch"):
        parse_avi(bytes(bad2))
    with pytest.raises(ValueError, match="no frames"):
        encode_avi_mjpeg([], 8, 8)


def test_decode_video_dataframe(spark):
    from radohydro_spark.operators.multimodal import decode_video

    blob, arrays = _clip(4, seed=100)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, payload binary"
    )
    row = decode_video(df, sample_every=2).collect()[0]
    assert (row.n_frames, row.width, row.height, row.fps, row.n_sampled) == (
        4, 16, 8, 25, 2,
    )
    expect = np.concatenate(
        [arrays[0].ravel(), arrays[2].ravel()]
    ).astype(float).mean()
    assert abs(row.mean_intensity - expect) < 1e-12
