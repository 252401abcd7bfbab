"""Dependency-free baseline JPEG codec (encode + decode, pure numpy).

Retires the last fake-decode twin in the multimodal path: JFIF payloads
produced by ``encode_jpeg_gray`` decode back through ``decode_jpeg_gray``
inside ``operators.multimodal.decode_media`` with no image library — the
same sibling-codec pattern as BMP (sources/bmp.py) and WAV
(sources/wav.py).  Everything here is from the public JPEG spec
(ITU-T T.81): marker segments, Annex-K Huffman tables, zigzag scan,
8x8 DCT-II.

Supported subset (enough for honest round-trips, refuses the rest):

* baseline sequential DCT (SOF0), 8-bit precision, single grayscale
  component, no subsampling (the encoder writes exactly this);
* any DQT/DHT tables carried by the file (the decoder builds its Huffman
  and quantization state from the stream, not from compiled-in tables);
* restart markers (DRI/RSTn) with DC-predictor reset;
* progressive (SOF2), arithmetic coding, and multi-component scans raise
  ``ValueError`` with the marker that triggered the refusal.

Exactness: JPEG is lossy in general, but a block-constant image with an
all-ones quantization table round-trips BIT-EXACTLY — each 8x8 block
carries only its DC coefficient ``8·(v-128)``, an exact integer, and the
float IDCT reconstructs ``v`` to within ~1e-13 before the final
``rint``.  The driver query exploits this for a closed-form SQL oracle
while still exercising the full real bitstream path (Huffman, stuffing,
zigzag, dequantize, IDCT).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan order: (row, col) pairs along anti-diagonals (T.81 Fig. 5)
_ZZ: list[tuple[int, int]] = []
for _d in range(15):
    _rows = (
        range(min(_d, 7), max(0, _d - 7) - 1, -1)
        if _d % 2 == 0
        else range(max(0, _d - 7), min(_d, 7) + 1)
    )
    for _r in _rows:
        _ZZ.append((_r, _d - _r))
_ZZ_IDX = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)  # flat order

# Annex K.3 typical luminance Huffman tables (public spec constants)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthogonally-scaled DCT basis: F = A @ f @ A.T is exactly the T.81 DCT
_A = np.zeros((8, 8))
for _u in range(8):
    _s = np.sqrt(1.0 / 8.0) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _s * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the canonical T.81 code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _huff_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _huff_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def encode_jpeg_gray(
    pixels: np.ndarray, quant: np.ndarray | None = None
) -> bytes:
    """Encode an ``(h, w)`` uint8 grayscale array as a baseline JFIF JPEG.

    ``h`` and ``w`` must be multiples of 8 (no partial-MCU edge handling
    in the encoder; the decoder crops, but round-trip fixtures stay
    exact-size).  ``quant`` is an 8x8 quantization table (natural order);
    default all-ones — lossless for block-constant content.
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError(f"expected (h, w) grayscale, got shape {arr.shape}")
    h, w = arr.shape
    if h % 8 or w % 8 or h == 0 or w == 0:
        raise ValueError(f"dims must be non-zero multiples of 8, got {w}x{h}")
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=np.float64)

    shifted = arr.astype(np.float64) - 128.0
    bw = _BitWriter()
    pred = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = np.rint(( _A @ block @ _A.T) / q).astype(np.int64)
            zz = coef.ravel()[_ZZ_IDX]
            # DC
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            cat = _category(diff)
            c, ln = _DC_ENC[cat]
            bw.write(c, ln)
            if cat:
                bw.write(_amplitude(diff, cat), cat)
            # AC with run-lengths
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                if k > last_nz:
                    break
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = _AC_ENC[0xF0]  # ZRL
                    bw.write(c, ln)
                    run -= 16
                cat = _category(v)
                c, ln = _AC_ENC[(run << 4) | cat]
                bw.write(c, ln)
                bw.write(_amplitude(v, cat), cat)
                run = 0
            if last_nz < 63:
                c, ln = _AC_ENC[0x00]  # EOB
                bw.write(c, ln)
    entropy = bw.flush()

    qzz = np.rint(q).astype(np.int64).ravel()[_ZZ_IDX]
    if np.any(qzz < 1) or np.any(qzz > 255):
        raise ValueError("quant table entries must be in [1, 255]")

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"".join(
        (
            b"\xff\xd8",  # SOI
            seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in qzz)),
            seg(
                0xFFC0,  # SOF0: 8-bit, 1 component, 1x1 sampling
                struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]),
            ),
            seg(
                0xFFC4,
                bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
                + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
            ),
            seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0])),
            entropy,
            b"\xff\xd9",  # EOI
        )
    )
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG: entropy data exhausted")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise ValueError("hit restart marker mid-symbol")
            else:
                raise ValueError("truncated JPEG: marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def at_restart(self) -> bool:
        d = self.data
        return (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        )

    def sync_restart(self) -> None:
        self.acc = 0
        self.n = 0
        self.pos += 2


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    enc = _huff_codes(bits, vals)
    return {(ln, code): v for v, (code, ln) in enc.items()}


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    for _ in range(16):
        code = (code << 1) | br.bit()
        ln += 1
        v = table.get((ln, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_block(br: _BitReader, dc_tbl, ac_tbl, pred: int):
    """One entropy-coded block: returns (zigzag coefficient vector,
    updated DC predictor)."""
    zz = np.zeros(64, dtype=np.float64)
    cat = _read_symbol(br, dc_tbl)
    diff = _extend(br.bits(cat), cat) if cat else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _read_symbol(br, ac_tbl)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        if k > 63:
            raise ValueError("AC run overflows block")
        s = rs & 15
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz, pred


def decode_jpeg(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a baseline JPEG → ``(array, channels)``: grayscale yields
    ``((h, w), 1)``, YCbCr color yields ``((h, w, 3) RGB, 3)``.

    Handles (r6 color extension): 1- or 3-component SOF0/1 with
    per-component sampling factors — 4:4:4 (1x1 everywhere) and 4:2:0
    (luma 2x2, chroma 1x1) MCU interleave — stream-defined DQT/DHT,
    16-bit DQT precision, APPn/COM skips, DRI/RSTn with per-component DC
    predictor reset (restart interval counts MCUs).  Chroma planes
    upsample by sample repetition; color transform is BT.601 full-range
    YCbCr→RGB.  Refuses progressive (SOF2), arithmetic, hierarchical,
    and other sampling layouts with a ``ValueError`` naming the cause.
    """
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[dict] = []  # {cid, hs, vs, tq, td, ta}
    restart_interval = 0
    data_pos = -1

    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        length = struct.unpack_from(">H", blob, pos + 2)[0]
        body = blob[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(body, ">u2", count=64, offset=i)
                    i += 128
                else:
                    vals = np.frombuffer(body, np.uint8, count=64, offset=i)
                    i += 64
                tbl = np.zeros(64)
                tbl[_ZZ_IDX] = vals.astype(np.float64)
                qtables[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                htables[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            if nf not in (1, 3):
                raise ValueError(f"unsupported component count {nf}")
            comps = []
            for ci in range(nf):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"cid": cid, "hs": sampling >> 4, "vs": sampling & 15, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF marker 0xFF{marker:02X} (progressive/"
                "arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != len(comps) or not comps:
                raise ValueError(
                    f"scan/SOF component mismatch (Ns={ns}, Nf={len(comps)})"
                )
            by_id = {c["cid"]: c for c in comps}
            for si in range(ns):
                cs, tda = body[1 + 2 * si], body[2 + 2 * si]
                if cs not in by_id:
                    raise ValueError(f"scan references unknown component {cs}")
                by_id[cs]["td"], by_id[cs]["ta"] = tda >> 4, tda & 15
            data_pos = pos + 2 + length
            break
        # APPn / COM / anything else: skip
        pos += 2 + length

    if data_pos < 0 or not h or not w:
        raise ValueError("truncated JPEG: no SOS/SOF before end")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if len(comps) == 1:
        if (comps[0]["hs"], comps[0]["vs"]) != (1, 1):
            raise ValueError("grayscale must be 1x1 sampled")
    else:
        layouts = tuple((c["hs"], c["vs"]) for c in comps)
        if layouts not in (((1, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1))):
            raise ValueError(f"unsupported sampling layout {layouts}")
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(f"missing quantization table {c['tq']}")
        c["q"] = qtables[c["tq"]]
        c["dc_tbl"] = htables.get((0, c.get("td", 0)))
        c["ac_tbl"] = htables.get((1, c.get("ta", 0)))
        if c["dc_tbl"] is None or c["ac_tbl"] is None:
            raise ValueError("missing Huffman table(s) for scan")

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    for c in comps:
        c["plane"] = np.zeros(
            (mcus_y * c["vs"] * 8, mcus_x * c["hs"] * 8), dtype=np.float64
        )
        c["pred"] = 0

    br = _BitReader(blob, data_pos)
    for mi in range(mcus_y * mcus_x):
        if restart_interval and mi and mi % restart_interval == 0:
            if not br.at_restart():
                raise ValueError("expected restart marker")
            br.sync_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mi, mcus_x)
        for c in comps:
            for byi in range(c["vs"]):
                for bxi in range(c["hs"]):
                    zz, c["pred"] = _decode_block(
                        br, c["dc_tbl"], c["ac_tbl"], c["pred"]
                    )
                    coef = np.zeros(64)
                    coef[_ZZ_IDX] = zz
                    block = _A.T @ (coef.reshape(8, 8) * c["q"]) @ _A
                    py = (my * c["vs"] + byi) * 8
                    px = (mx * c["hs"] + bxi) * 8
                    c["plane"][py : py + 8, px : px + 8] = block

    planes = []
    for c in comps:
        p = c["plane"] + 128.0
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8), 1
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(ch), 0, 255) for ch in (r, g, b)], axis=2
    ).astype(np.uint8)
    return rgb, 3


def decode_jpeg_gray(blob: bytes) -> np.ndarray:
    """Decode a baseline single-component JPEG → ``(h, w)`` uint8 (thin
    wrapper over the general ``decode_jpeg``; refuses color payloads)."""
    img, channels = decode_jpeg(blob)
    if channels != 1:
        raise ValueError("decode_jpeg_gray: payload is color, use decode_jpeg")
    return img


def encode_jpeg_color(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    subsampling: str = "4:2:0",
) -> bytes:
    """Encode an ``(h, w, 3)`` RGB uint8 array as a baseline YCbCr JPEG
    (r6 color extension).

    ``4:2:0``: luma 2x2 / chroma 1x1 sampling, 16x16 MCUs (dims must be
    multiples of 16); ``4:4:4``: all 1x1, 8x8 MCUs (multiples of 8).
    BT.601 full-range RGB→YCbCr; chroma subsampling is 2x2 block
    averaging.  One quant table serves both luma and chroma (all-ones
    default — block-constant GRAY content round-trips bit-exactly
    through the full color path, since Y==v and Cb==Cr==128 exactly);
    the Annex-K luma Huffman tables are registered for both table ids —
    legal JPEG, self-consistent with the stream-driven decoder.
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got shape {arr.shape}")
    h, w = arr.shape[:2]
    if subsampling == "4:2:0":
        samp = [(2, 2), (1, 1), (1, 1)]
        mcu = 16
    elif subsampling == "4:4:4":
        samp = [(1, 1), (1, 1), (1, 1)]
        mcu = 8
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if h % mcu or w % mcu or h == 0 or w == 0:
        raise ValueError(
            f"dims must be non-zero multiples of {mcu} for {subsampling}, "
            f"got {w}x{h}"
        )
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=np.float64)

    rgb = arr.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsampling == "4:2:0":
        cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    planes = [y - 128.0, cb - 128.0, cr - 128.0]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = w // (8 * hmax), h // (8 * vmax)

    bw = _BitWriter()
    preds = [0, 0, 0]

    def emit_block(plane, py, px, ci):
        nonlocal preds
        block = plane[py : py + 8, px : px + 8]
        coef = np.rint((_A @ block @ _A.T) / q).astype(np.int64)
        zz = coef.ravel()[_ZZ_IDX]
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        cat = _category(diff)
        c, ln = _DC_ENC[cat]
        bw.write(c, ln)
        if cat:
            bw.write(_amplitude(diff, cat), cat)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            if k > last_nz:
                break
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = _AC_ENC[0xF0]
                bw.write(c, ln)
                run -= 16
            cat = _category(v)
            c, ln = _AC_ENC[(run << 4) | cat]
            bw.write(c, ln)
            bw.write(_amplitude(v, cat), cat)
            run = 0
        if last_nz < 63:
            c, ln = _AC_ENC[0x00]
            bw.write(c, ln)

    for mi in range(mcus_y * mcus_x):
        my, mx = divmod(mi, mcus_x)
        for ci, (hs, vs) in enumerate(samp):
            for byi in range(vs):
                for bxi in range(hs):
                    emit_block(
                        planes[ci],
                        (my * vs + byi) * 8,
                        (mx * hs + bxi) * 8,
                        ci,
                    )
    entropy = bw.flush()

    qzz = np.rint(q).astype(np.int64).ravel()[_ZZ_IDX]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    sof_comps = b"".join(
        bytes([cid, (hs << 4) | vs, tq])
        for cid, (hs, vs), tq in zip((1, 2, 3), samp, (0, 1, 1))
    )
    sos_comps = b"".join(
        bytes([cid, (td << 4) | ta])
        for cid, td, ta in zip((1, 2, 3), (0, 1, 1), (0, 1, 1))
    )
    huff = bytes(_DC_BITS) + bytes(_DC_VALS)
    huff_ac = bytes(_AC_BITS) + bytes(_AC_VALS)
    return b"".join(
        (
            b"\xff\xd8",
            seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            seg(
                0xFFDB,
                bytes([0x00]) + bytes(int(v) for v in qzz)
                + bytes([0x01]) + bytes(int(v) for v in qzz),
            ),
            seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + sof_comps),
            seg(
                0xFFC4,
                bytes([0x00]) + huff + bytes([0x10]) + huff_ac
                + bytes([0x01]) + huff + bytes([0x11]) + huff_ac,
            ),
            seg(0xFFDA, bytes([3]) + sos_comps + bytes([0, 63, 0])),
            entropy,
            b"\xff\xd9",
        )
    )
