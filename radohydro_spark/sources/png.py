"""Dependency-free PNG codec (encode + decode, stdlib zlib + numpy).

Third real image format for the multimodal path (after BMP and baseline
JPEG): PNG is DEFLATE over per-scanline filtered bytes, both available
without an image library — ``zlib`` is Python stdlib and the five filter
types (None/Sub/Up/Average/Paeth) are ~30 lines of numpy.  Everything
from the public PNG spec (RFC 2083 / W3C PNG).

Supported subset (enough for honest lossless round-trips, refuses the
rest):

* 8-bit grayscale (color type 0) and 8-bit RGB (color type 2);
* all five scanline filters on decode (the encoder writes filter 0 and
  relies on DEFLATE; decode handles files from other encoders);
* single IDAT or multiple concatenated IDAT chunks;
* no interlacing (Adam7 refused), no palette, no 16-bit, no alpha —
  each refusal raises ``ValueError`` naming the feature.

PNG is lossless, so round-trips are bit-exact by construction — same
closed-form oracle pattern as the BMP query.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode ``(h, w)`` gray or ``(h, w, 3)`` RGB uint8 as a PNG
    (filter 0 scanlines, one IDAT)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        color_type, nch = 0, 1
        body = arr.reshape(h, w)
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        color_type, nch = 2, 3
        body = arr.reshape(h, w * 3)
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got shape {arr.shape}")
    if h == 0 or w == 0:
        raise ValueError("empty image")
    raw = np.zeros((h, 1 + w * nch), dtype=np.uint8)
    raw[:, 1:] = body  # filter byte 0 per scanline
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return b"".join(
        (
            _MAGIC,
            _chunk(b"IHDR", ihdr),
            _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6)),
            _chunk(b"IEND", b""),
        )
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters; returns (h, stride) bytes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, 1 + stride)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    v = cur[x] + a
                elif ftype == 3:
                    v = cur[x] + (a + b) // 2
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = cur[x] + pred
                line[x] = v & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on row {y}")
        out[y] = line.astype(np.uint8)
    return out


def decode_png(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode PNG bytes → ``(array, channels)``: ``(h, w)`` for
    grayscale (channels 1), ``(h, w, 3)`` for RGB (channels 3)."""
    if blob[:8] != _MAGIC:
        raise ValueError("not a PNG payload (missing signature)")
    pos = 8
    w = h = -1
    color_type = -1
    idat = bytearray()
    while pos + 8 <= len(blob):
        length, tag = struct.unpack_from(">I4s", blob, pos)
        payload = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color_type not in (0, 2):
                raise ValueError(
                    f"unsupported PNG color type {color_type} "
                    "(only 8-bit gray / RGB)"
                )
            if comp or filt:
                raise ValueError("non-standard PNG compression/filter method")
            if interlace:
                raise ValueError("Adam7 interlacing unsupported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w <= 0 or h <= 0:
        raise ValueError("truncated PNG: no IHDR")
    if not idat:
        raise ValueError("truncated PNG: no IDAT")
    nch = 1 if color_type == 0 else 3
    stride = w * nch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError(
            f"PNG data size mismatch: {raw.size} != {h * (1 + stride)}"
        )
    out = _unfilter(raw, h, stride, nch)
    if nch == 1:
        return out.reshape(h, w).copy(), 1
    return out.reshape(h, w, 3).copy(), 3
