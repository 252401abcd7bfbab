"""Dependency-free BMP codec (encode + decode, pure struct/numpy).

Gives the multimodal path one REAL image format end-to-end: payloads
produced by ``encode_bmp`` decode back through ``decode_bmp`` inside
``operators.multimodal.decode_media`` with no image library — the same
sibling-codec pattern as the GeoTIFF source (sources/geotiff.py).

Supported subset (enough for honest round-trips, refuses the rest):

* 8-bit palettized (``BITMAPINFOHEADER``, BI_RGB): decoded through the
  palette; a grayscale palette (R==G==B for every entry) collapses to a
  single-channel array, otherwise the palette-mapped RGB is returned.
* 24-bit BGR (BI_RGB).
* bottom-up (positive height, the on-disk default) and top-down
  (negative height) row orders; 4-byte row padding.

The reference has no image path at all (it is a precipitation ETL); this
module serves the training-data-pipeline brief's multimodal requirement.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, imgsize,
#                                            xppm, yppm, colors used, colors important

_BI_RGB = 0
_PPM = 2835  # 72 DPI in pixels-per-meter, the conventional default


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an image array to BMP bytes.

    ``pixels`` is ``(h, w)`` uint8 (written 8-bit with an identity gray
    palette) or ``(h, w, 3)`` uint8 RGB (written 24-bit BGR).  Rows are
    stored bottom-up with 4-byte padding, per the format default.
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        row_bytes = w
        palette = bytes(
            b for v in range(256) for b in (v, v, v, 0)
        )  # B, G, R, reserved — identity gray
        bpp = 8
        colors = 256
        # bottom-up row order
        body = arr[::-1]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        row_bytes = w * 3
        palette = b""
        bpp = 24
        colors = 0
        body = arr[::-1, :, ::-1]  # flip rows, RGB -> BGR
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got shape {arr.shape}")

    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    offset = _FILE_HDR.size + _INFO_HDR.size + len(palette)

    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, :row_bytes] = body.reshape(h, row_bytes)

    return b"".join(
        (
            _FILE_HDR.pack(b"BM", offset + img_size, 0, 0, offset),
            _INFO_HDR.pack(
                _INFO_HDR.size, w, h, 1, bpp, _BI_RGB, img_size, _PPM, _PPM, colors, 0
            ),
            palette,
            padded.tobytes(),
        )
    )


def decode_bmp(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode BMP bytes → ``(array, channels)``.

    ``channels == 1`` (gray-palette 8-bit) yields ``(h, w)``; otherwise
    ``(h, w, 3)`` RGB.  Raises ``ValueError`` on non-BMP input or BMP
    variants outside the supported subset (compression, 1/4/16/32-bit).
    """
    if len(blob) < _FILE_HDR.size + _INFO_HDR.size:
        raise ValueError("truncated BMP: header incomplete")
    magic, _fsize, _r1, _r2, offset = _FILE_HDR.unpack_from(blob, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    (
        hdr_size,
        w,
        h_signed,
        planes,
        bpp,
        comp,
        _imgsize,
        _xppm,
        _yppm,
        colors,
        _imp,
    ) = _INFO_HDR.unpack_from(blob, _FILE_HDR.size)
    if hdr_size < _INFO_HDR.size:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if comp != _BI_RGB:
        raise ValueError(f"unsupported BMP compression {comp}")
    if planes != 1 or w <= 0 or h_signed == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed} planes={planes}")

    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed

    if bpp == 8:
        n_colors = colors or 256
        pal_off = _FILE_HDR.size + hdr_size
        pal = np.frombuffer(blob, dtype=np.uint8, count=n_colors * 4, offset=pal_off)
        pal = pal.reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRx -> RGB
        row_bytes = w
    elif bpp == 24:
        pal = None
        row_bytes = w * 3
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")

    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(blob) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(blob)}")
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]

    if bpp == 24:
        return rows.reshape(h, w, 3)[:, :, ::-1].copy(), 3  # BGR -> RGB
    idx = rows.reshape(h, w)
    if bool((pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()):
        return pal[idx, 0].copy(), 1  # grayscale palette -> luma plane
    return pal[idx].copy(), 3
