"""Dependency-free WAV (RIFF/PCM) codec.

Audio twin of ``sources/bmp.py``: no audio library ships in this
container, but WAV PCM is a pure struct/numpy format, so the engine can
encode and decode REAL audio bytes end-to-end — the ``decode_audio``
kernel in ``operators/multimodal.py`` and its driver query run on genuine
RIFF files, not fakes.

Supported: PCM (format tag 1), 8-bit unsigned and 16-bit signed
little-endian, any channel count; unknown chunks (LIST, fact, ...) are
skipped per the RIFF spec.  The reference has no audio surface (this is
part of the training-data-pipeline brief, not radohydro parity).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode samples to a PCM WAV blob.

    ``samples``: int16 array, shape (n,) for mono or (n, channels);
    uint8 arrays encode as 8-bit PCM.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be 1-D (mono) or 2-D (frames x channels)")
    if arr.dtype == np.uint8:
        bits = 8
    elif arr.dtype == np.int16:
        bits = 16
    else:
        raise ValueError(f"unsupported dtype {arr.dtype}; use uint8 or int16")
    n_frames, n_ch = arr.shape
    block_align = n_ch * bits // 8
    byte_rate = sample_rate * block_align
    data = arr.astype("<u1" if bits == 8 else "<i2").tobytes()  # C-order interleaves
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV blob to ``(samples, sample_rate)``.

    ``samples`` is an int16 array of shape (n_frames, n_channels); 8-bit
    input is re-centered to signed int16 range semantics (x - 128, no
    rescale — value-preserving for round-trip checks).
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt_fields = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        payload_at = pos + 8
        if payload_at + size > len(blob):
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_fields = struct.unpack_from("<HHIIHH", blob, payload_at)
        elif cid == b"data":
            data = blob[payload_at : payload_at + size]
        pos = payload_at + size + (size % 2)  # word alignment
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, n_ch, sample_rate, _byte_rate, _block_align, bits = fmt_fields
    if tag != 1:
        raise ValueError(f"only PCM (tag 1) supported, got {tag}")
    if n_ch < 1:
        raise ValueError("channel count must be >= 1")
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
    elif bits == 16:
        arr = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2").astype(
            np.int16
        )
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_frames = len(arr) // n_ch
    return arr[: n_frames * n_ch].reshape(n_frames, n_ch), sample_rate
