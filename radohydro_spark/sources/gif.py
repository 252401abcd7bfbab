"""Dependency-free GIF codec (LZW decode + uncompressed-LZW encode).

Fourth real image format for the multimodal path: GIF is palette-indexed
pixels under LZW compression — both implementable from the public
GIF87a/89a specification with nothing but numpy.

* ``decode_gif`` is a REAL variable-width LZW decoder (dictionary
  rebuild, clear/EOI codes, 12-bit cap, sub-block reassembly), handles
  87a and 89a, skips 89a extension blocks, reads global or local color
  tables, and collapses a grayscale palette to a single-channel array —
  it decodes GIFs from arbitrary encoders within the subset (no
  interlacing, first image of animated files).
* ``encode_gif`` writes the standard "uncompressed GIF" variant: every
  pixel is emitted as a literal code with a CLEAR every 250 pixels so
  the code width never grows — a perfectly valid LZW stream any decoder
  accepts (the same trick pre-patent-expiry writers used), which keeps
  the encoder ~20 lines and the round-trip bit-exact.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode ``(h, w)`` uint8 grayscale as GIF87a with an identity gray
    palette (8-bit LZW literals, clear-every-250 uncompressed form)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError(f"expected (h, w) grayscale, got shape {arr.shape}")
    h, w = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    palette = bytes(v for g in range(256) for v in (g, g, g))
    screen = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 gray
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)

    # LZW stream: min code size 8 -> CLEAR=256, EOI=257, width 9
    codes: list[int] = [256]
    for i, px in enumerate(arr.ravel()):
        if i and i % 250 == 0:
            codes.append(256)  # re-CLEAR before the dictionary fills
        codes.append(int(px))
    codes.append(257)

    acc = n = 0
    out = bytearray()
    for c in codes:
        acc |= c << n  # GIF packs LSB-first
        n += 9
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)

    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator

    return b"GIF87a" + screen + palette + img_desc + bytes(blocks) + b"\x3b"


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = n = 0
    pos = 0
    while pos < len(data) or n >= width:
        while n < width and pos < len(data):
            acc |= data[pos] << n
            n += 8
            pos += 1
        if n < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(dict_) and (code < clear or dict_[code]):
            entry = dict_[code]
        elif code == len(dict_) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        if prev is not None and len(dict_) < 4096:
            dict_.append(prev + entry[:1])
            if len(dict_) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(
            f"truncated LZW stream: {len(out)}/{n_pixels} pixels decoded"
        )
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def decode_gif(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode GIF bytes → ``(array, channels)``: gray palette yields
    ``((h, w), 1)``, otherwise ``((h, w, 3)`` RGB, 3)``.  First image of
    the stream; refuses interlaced images."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a signature)")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(blob, np.uint8, count=n * 3, offset=pos)
        global_pal = global_pal.reshape(n, 3)
        pos += n * 3
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # 89a extension: skip sub-blocks
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block {b0:#x} at {pos}")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos + 1)
        pos += 10
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(blob, np.uint8, count=n * 3, offset=pos)
            pal = pal.reshape(n, 3)
            pos += n * 3
        if ipacked & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if pal is None:
            raise ValueError("no color table for image")
        min_code = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos]:
            ln = blob[pos]
            data += blob[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), min_code, w * h).reshape(h, w)
        idx = np.minimum(idx, len(pal) - 1)
        if bool((pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()):
            return pal[idx, 0].copy(), 1
        return pal[idx].copy(), 3
    raise ValueError("truncated GIF: no image descriptor")
