"""WAV codec round-trips + the real decode_audio path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from radohydro_spark.sources.wav import decode_wav, encode_wav


def test_roundtrip_mono_int16():
    s = (np.arange(100, dtype=np.int16) * 257 - 12000).astype(np.int16)
    blob = encode_wav(s, 16000)
    back, rate = decode_wav(blob)
    assert rate == 16000
    assert back.shape == (100, 1)
    np.testing.assert_array_equal(back[:, 0], s)


def test_roundtrip_stereo_int16():
    s = np.stack(
        [np.arange(50, dtype=np.int16), -np.arange(50, dtype=np.int16)], axis=1
    )
    back, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(back, s)


def test_roundtrip_8bit():
    s = np.arange(256, dtype=np.uint8)
    back, _ = decode_wav(encode_wav(s, 8000))
    # 8-bit decodes re-centered: x - 128
    np.testing.assert_array_equal(back[:, 0], s.astype(np.int16) - 128)


def test_odd_length_data_word_aligned():
    s = np.arange(7, dtype=np.uint8)  # 7-byte data chunk -> pad byte
    blob = encode_wav(s, 8000)
    assert len(blob) % 2 == 0
    back, _ = decode_wav(blob)
    assert back.shape == (7, 1)


def test_unknown_chunks_skipped():
    s = np.arange(10, dtype=np.int16)
    blob = bytearray(encode_wav(s, 8000))
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(blob[:fmt_end]) + extra + bytes(blob[fmt_end:])
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, rate = decode_wav(spliced)
    assert rate == 8000
    np.testing.assert_array_equal(back[:, 0], s)


def test_truncated_raises():
    blob = encode_wav(np.arange(10, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(blob[:30])
    with pytest.raises(ValueError):
        decode_wav(b"nonsense")


def test_decode_audio_features(spark):
    from radohydro_spark.operators.multimodal import decode_audio

    s = np.array([100, -100, 50, -50, 0, 200], dtype=np.int16)
    blob = encode_wav(s, 8000)
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, payload binary")
    row = decode_audio(df).collect()[0]
    assert row["sample_rate"] == 8000
    assert row["n_channels"] == 1
    assert row["n_samples"] == 6
    assert row["duration_s"] == pytest.approx(6 / 8000)
    x = s.astype(np.float64)
    assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))))
    assert row["peak"] == 200
    # strict sign changes: 100/-100, -100/50, 50/-50; -50/0 and 0/200 not
    assert row["zero_crossings"] == 3
