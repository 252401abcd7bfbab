"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as ``binary`` columns with a struct of metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.  As of round 6 the decode paths are REAL and
dependency-free: BMP (sources/bmp.py), baseline JPEG incl. YCbCr 4:2:0
color (sources/jpeg.py), PNG via stdlib zlib (sources/png.py), GIF with a
real variable-width LZW decoder (sources/gif.py), WAV/PCM
audio (sources/wav.py), and AVI/MJPEG video (sources/avi.py +
``decode_video``).  Formats outside that set raise
``NotImplementedError`` unless ``fake=True``, which produces the
deterministic byte-derived twin — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is identical either way.

``byte_histogram`` and ``chunk_frames`` are honest binary operators (no
codec needed) usable at full scale as-is.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def byte_histogram(df: DataFrame, payload_col: str = "payload", buckets: int = 16) -> DataFrame:
    """Per-row histogram of payload bytes into ``buckets`` equal bins —
    pure Spark expressions on the binary column (no Python), usable as a
    cheap content fingerprint / corruption screen at any scale."""
    # binary -> array of byte values via substring+ascii on the latin-1
    # decoded string would be lossy; use mapInPandas for exact bytes
    out_fields = ", ".join(f"b{i} long" for i in range(buckets))

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            counts = []
            for payload in pdf[payload_col]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr // (256 // buckets), minlength=buckets)
                counts.append(hist[:buckets])
            hmat = np.vstack(counts) if counts else np.zeros((0, buckets), dtype=int)
            data = {c: pdf[c] for c in pdf.columns if c != payload_col}
            for i in range(buckets):
                data[f"b{i}"] = hmat[:, i]
            yield pd.DataFrame(data)

    keep = [c for c in df.columns if c != payload_col]
    keep_schema = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in keep)
    schema = f"{keep_schema}, {out_fields}" if keep else out_fields
    return df.mapInPandas(gen, schema=schema)


def decode_media(
    df: DataFrame, payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """Decode payloads into (width, height, channels, mean_intensity).

    The real path (``fake=False``) decodes **BMP** payloads end-to-end via
    the dependency-free codec in ``sources/bmp.py`` (8-bit palettized and
    24-bit, bottom-up or top-down) and **baseline JPEG** payloads via
    ``sources/jpeg.py`` (grayscale AND YCbCr color SOF0 — 4:4:4 / 4:2:0
    MCU interleave; stream-defined DQT/DHT, Huffman, zigzag, IDCT) and **PNG** payloads via ``sources/png.py`` — no image library
    needed.  Payloads in any other format raise ``NotImplementedError``.
    ``fake=True`` keeps the deterministic
    byte-derived twin (dims from payload length, intensity = mean byte
    value) for exercising the plumbing with arbitrary payloads.
    """
    from radohydro_spark.sources.bmp import decode_bmp
    from radohydro_spark.sources.gif import decode_gif
    from radohydro_spark.sources.jpeg import decode_jpeg
    from radohydro_spark.sources.png import decode_png

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": pdf["media_id"], "width": [], "height": [], "channels": [], "mean_intensity": []}
            for payload in pdf[payload_col]:
                blob = bytes(payload)
                if fake:
                    arr = np.frombuffer(blob, dtype=np.uint8)
                    n = len(arr)
                    side = max(int(np.sqrt(max(n // 3, 1))), 1)
                    rows["width"].append(side)
                    rows["height"].append(side)
                    rows["channels"].append(3)
                    rows["mean_intensity"].append(float(arr.mean()) if n else 0.0)
                elif blob[:2] == b"BM":
                    img, channels = decode_bmp(blob)
                    rows["width"].append(int(img.shape[1]))
                    rows["height"].append(int(img.shape[0]))
                    rows["channels"].append(channels)
                    rows["mean_intensity"].append(float(img.mean()))
                elif blob[:2] == b"\xff\xd8":
                    img, channels = decode_jpeg(blob)
                    rows["width"].append(int(img.shape[1]))
                    rows["height"].append(int(img.shape[0]))
                    rows["channels"].append(channels)
                    rows["mean_intensity"].append(float(img.mean()))
                elif blob[:8] == b"\x89PNG\r\n\x1a\n":
                    img, channels = decode_png(blob)
                    rows["width"].append(int(img.shape[1]))
                    rows["height"].append(int(img.shape[0]))
                    rows["channels"].append(channels)
                    rows["mean_intensity"].append(float(img.mean()))
                elif blob[:6] in (b"GIF87a", b"GIF89a"):
                    img, channels = decode_gif(blob)
                    rows["width"].append(int(img.shape[1]))
                    rows["height"].append(int(img.shape[0]))
                    rows["channels"].append(channels)
                    rows["mean_intensity"].append(float(img.mean()))
                else:
                    raise NotImplementedError(
                        "only BMP, baseline JPEG, PNG, and GIF payloads decode "
                        "natively (sources/bmp.py, jpeg.py, png.py, gif.py); other "
                        "codecs unavailable in this environment — pass "
                        "fake=True for the deterministic stub"
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", payload_col).mapInPandas(
        gen,
        schema="media_id long, width int, height int, channels int, mean_intensity double",
    )


def decode_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode WAV/PCM payloads into per-clip audio features — REAL decode,
    no audio library: the RIFF parser in ``sources/wav.py`` handles 8/16-bit
    PCM with arbitrary chunk layout.

    Emits ``(id, sample_rate, n_channels, n_samples, duration_s, rms, peak,
    zero_crossings)``.  Amplitude features (rms = sqrt(mean(x²)),
    peak = max|x|, strict sign-change zero crossings) are computed on
    channel 0 in float64 — int16 squares sum exactly in doubles, so the
    values are bit-reproducible across engines.  Arrow-batched
    ``mapInPandas``, one numpy pass per row, no shuffle.
    """
    from radohydro_spark.sources.wav import decode_wav

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                id_col: pdf[id_col],
                "sample_rate": [],
                "n_channels": [],
                "n_samples": [],
                "duration_s": [],
                "rms": [],
                "peak": [],
                "zero_crossings": [],
            }
            for payload in pdf[payload_col]:
                samples, rate = decode_wav(bytes(payload))
                n, ch = samples.shape
                x = samples[:, 0].astype(np.float64)
                out["sample_rate"].append(rate)
                out["n_channels"].append(ch)
                out["n_samples"].append(n)
                out["duration_s"].append(n / rate if rate else 0.0)
                out["rms"].append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
                out["peak"].append(int(np.abs(x).max()) if n else 0)
                out["zero_crossings"].append(
                    int(np.count_nonzero(x[1:] * x[:-1] < 0)) if n > 1 else 0
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        gen,
        schema=f"{id_col} long, sample_rate int, n_channels int, n_samples long, "
        "duration_s double, rms double, peak int, zero_crossings long",
    )


def decode_video(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    sample_every: int = 2,
) -> DataFrame:
    """REAL video decode (r6, no video library): AVI/MJPEG payloads go
    through the RIFF container walk (sources/avi.py), every
    ``sample_every``-th frame is extracted and decoded by the from-scratch
    baseline JPEG decoder (sources/jpeg.py), and pixel statistics are
    aggregated across the sampled frames — container metadata (frame
    count, dims, fps) comes from the headers and is cross-checked against
    the actual '00dc' chunk count by the parser.

    Arrow-batched ``mapInPandas``, one payload per loop iteration, no
    shuffle — the same plumbing contract as ``decode_media``/
    ``decode_audio``.  Non-AVI or non-MJPG payloads raise (strict by
    default, like the image path)."""
    from radohydro_spark.sources.avi import decode_avi_mjpeg_stats

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                id_col: pdf[id_col],
                "n_frames": [],
                "width": [],
                "height": [],
                "fps": [],
                "n_sampled": [],
                "mean_intensity": [],
            }
            for payload in pdf[payload_col]:
                s = decode_avi_mjpeg_stats(bytes(payload), sample_every)
                out["n_frames"].append(s["n_frames"])
                out["width"].append(s["width"])
                out["height"].append(s["height"])
                out["fps"].append(s["fps"])
                out["n_sampled"].append(s["n_sampled"])
                out["mean_intensity"].append(s["mean_intensity"])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        gen,
        schema=f"{id_col} long, n_frames int, width int, height int, fps int, "
        "n_sampled int, mean_intensity double",
    )


def chunk_frames(
    df: DataFrame, payload_col: str = "payload", frame_bytes: int = 1024, every_nth: int = 1
) -> DataFrame:
    """Frame sampling as byte-chunking: one output row per (every_nth)
    chunk of ``frame_bytes`` — the one-to-many batch shape of real video
    frame extraction, with deterministic content."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                blob = bytes(payload)
                n_frames = (len(blob) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_nth):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(blob[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("media_id", payload_col).mapInPandas(
        gen, schema="media_id long, frame_idx int, frame binary"
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Resize payloads to ``width x height``.

    REAL path (r6, ``fake=False``): decode through the codec dispatch
    (BMP / baseline JPEG / PNG, all from-scratch), nearest-neighbor
    resample the pixel grid — ``out[y, x] = in[y·h_in // h_out,
    x·w_in // w_out]``, the deterministic integer mapping every engine
    reproduces — and re-encode LOSSLESSLY as PNG (stdlib zlib), so
    resized payloads chain back into ``decode_media`` with bit-exact
    content.  RGB inputs stay 3-channel; grayscale stays 1.

    ``fake=True`` keeps the legacy byte-stream twin (nearest-neighbor
    over the RAW BYTES, zero-padded) for exercising the plumbing with
    arbitrary payloads.

    Returns (media_id, width, height, payload).
    """
    from radohydro_spark.sources.bmp import decode_bmp
    from radohydro_spark.sources.gif import decode_gif
    from radohydro_spark.sources.jpeg import decode_jpeg
    from radohydro_spark.sources.png import decode_png, encode_png

    n_out = width * height

    def _resample(img: np.ndarray) -> np.ndarray:
        h_in, w_in = img.shape[:2]
        ys = (np.arange(height) * h_in) // height
        xs = (np.arange(width) * w_in) // width
        return img[np.ix_(ys, xs)]

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                blob = bytes(payload)
                if fake:
                    arr = np.frombuffer(blob, dtype=np.uint8)
                    n = len(arr)
                    if n == 0:
                        out = np.zeros(n_out, dtype=np.uint8)
                    else:
                        idx = (np.arange(n_out) * n) // n_out
                        out = arr[idx]
                    payloads.append(out.tobytes())
                else:
                    if blob[:2] == b"BM":
                        img, _ = decode_bmp(blob)
                    elif blob[:2] == b"\xff\xd8":
                        img, _jc = decode_jpeg(blob)
                    elif blob[:8] == b"\x89PNG\r\n\x1a\n":
                        img, _ = decode_png(blob)
                    elif blob[:6] in (b"GIF87a", b"GIF89a"):
                        img, _ = decode_gif(blob)
                    else:
                        raise NotImplementedError(
                            "resize decodes BMP/JPEG/PNG/GIF natively; other "
                            "codecs unavailable — pass fake=True for the "
                            "byte-stream stub"
                        )
                    payloads.append(encode_png(_resample(img)))
                ids.append(mid)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "payload": payloads,
                }
            )

    return df.select("media_id", payload_col).mapInPandas(
        gen, schema="media_id long, width int, height int, payload binary"
    )


# backwards-compat alias for the raising-stub name
def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    return resize_media(df, width, height, fake=False)


def average_hash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    grid: int = 64,
) -> DataFrame:
    """aHash-style perceptual fingerprint over the payload bytes.

    The classic image average-hash (resize to 8x8, bit = pixel > mean)
    re-expressed codec-free: the byte stream is divided into ``grid``
    contiguous chunks (chunk of byte i = i*grid//n, exact integer
    arithmetic), bit c = 1 iff mean(chunk c) > mean(all bytes).  With a real
    decoder the same kernel runs on decoded luma planes; the chunking and
    bit logic are unchanged.

    Returns (id_col, ahash) where ``ahash`` is a ``grid``-char '0'/'1'
    string — string form avoids 64-bit sign pitfalls across engines and
    makes Hamming distance a per-char comparison.  Arrow-batched
    ``mapInPandas``; one numpy ``bincount`` pair per row, no shuffle.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
                n = len(arr)
                if n == 0:
                    ids.append(mid)
                    hashes.append("0" * grid)
                    continue
                idx = (np.arange(n) * grid) // n
                sums = np.bincount(idx, weights=arr, minlength=grid)
                cnts = np.bincount(idx, minlength=grid)
                overall = arr.sum() / n
                means = np.divide(sums, cnts, out=np.zeros(grid), where=cnts > 0)
                bits = np.where((cnts > 0) & (means > overall), "1", "0")
                ids.append(mid)
                hashes.append("".join(bits))
            yield pd.DataFrame({id_col: ids, "ahash": hashes})

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema=f"{id_col} long, ahash string"
    )
