"""Dependency-free AVI (RIFF) container parser + MJPEG writer.

Completes the multimodal codec family at the VIDEO level: AVI is a RIFF
container (same chunk grammar as WAV, sources/wav.py) and Motion-JPEG is
"every frame is a baseline JPEG" — which sources/jpeg.py already decodes.
So container walk + per-frame JPEG decode gives a real, end-to-end video
path with zero external libraries: frame counting, frame-rate metadata,
frame sampling, and pixel-level features on sampled frames.

Supported subset (refuses the rest):

* single 'vids' stream, fourcc MJPG, one '00dc' chunk per frame;
* standard layout: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
  LIST('movi' 00dc...) [idx1]) — idx1 optional on read, written on
  encode;
* no audio streams, no OpenDML extensions, no interleave index tricks.

All structure from the public AVI/RIFF spec (Microsoft Video for Windows
documentation).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Wrap pre-encoded JPEG frames into an AVI/MJPG container."""
    if not frames:
        raise ValueError("no frames")
    n = len(frames)
    max_size = max(len(f) for f in frames)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,    # max bytes per sec (approx)
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        n,                 # total frames
        0,                 # initial frames
        1,                 # number of streams
        max_size,          # suggested buffer size
        width,
        height,
        0, 0, 0, 0,        # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids",
        b"MJPG",
        0, 0, 0, 0,        # flags, prio, lang, initial frames
        1, fps,            # scale, rate -> fps
        0, n,              # start, length (frames)
        max_size,          # suggested buffer
        0xFFFFFFFF,        # quality (default)
        0,                 # sample size (0 = varies)
        0, 0, 0, 0,        # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_payload)
    # idx1: one entry per frame; offsets relative to 'movi' kind fourcc
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def parse_avi(blob: bytes) -> dict:
    """Parse an AVI/MJPG container → metadata + frame locations.

    Returns ``{n_frames, width, height, fps, frames: [(offset, size)]}``
    where offsets point at each frame's JPEG bytes inside ``blob``.
    """
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI signature)")
    width = height = fps = 0
    n_declared = 0
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, fps, n_declared
        while pos + 8 <= end:
            tag = blob[pos : pos + 4]
            size = struct.unpack_from("<I", blob, pos + 4)[0]
            body_start = pos + 8
            if tag == b"LIST":
                kind = blob[body_start : body_start + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(body_start + 4, body_start + size)
            elif tag == b"avih":
                vals = struct.unpack_from("<14I", blob, body_start)
                n_declared = vals[4]
                width, height = vals[8], vals[9]
            elif tag == b"strh":
                fcc_type, fcc = struct.unpack_from("<4s4s", blob, body_start)
                if fcc_type == b"vids" and fcc != b"MJPG":
                    raise ValueError(
                        f"unsupported video codec {fcc!r} (only MJPG)"
                    )
                if fcc_type == b"auds":
                    raise ValueError("audio streams unsupported")
                if fcc_type == b"vids":
                    scale, rate = struct.unpack_from(
                        "<II", blob, body_start + 20
                    )
                    fps = rate // scale if scale else 0
            elif tag == b"00dc":
                frames.append((body_start, size))
            pos = body_start + size + (size % 2)

    walk(12, len(blob))
    if not frames:
        raise ValueError("no MJPG frames ('00dc' chunks) found")
    if n_declared and n_declared != len(frames):
        raise ValueError(
            f"frame count mismatch: header says {n_declared}, found {len(frames)}"
        )
    return {
        "n_frames": len(frames),
        "width": width,
        "height": height,
        "fps": fps,
        "frames": frames,
    }


def extract_frame(blob: bytes, meta: dict, i: int) -> bytes:
    off, size = meta["frames"][i]
    return blob[off : off + size]


def decode_avi_mjpeg_stats(blob: bytes, sample_every: int = 2) -> dict:
    """Parse + sample + decode: every ``sample_every``-th frame is decoded
    through the baseline JPEG decoder; returns container metadata plus the
    mean intensity over all sampled frames' pixels."""
    from radohydro_spark.sources.jpeg import decode_jpeg_gray

    meta = parse_avi(blob)
    sampled = range(0, meta["n_frames"], sample_every)
    total, count = 0.0, 0
    for i in sampled:
        px = decode_jpeg_gray(extract_frame(blob, meta, i))
        total += float(px.sum())
        count += px.size
    return {
        "n_frames": meta["n_frames"],
        "width": meta["width"],
        "height": meta["height"],
        "fps": meta["fps"],
        "n_sampled": len(list(sampled)),
        "mean_intensity": total / count if count else float("nan"),
    }
