"""Multimodal columns: opaque binary payloads + typed metadata.

Design per the round brief: image/audio/video travel as ``binary``
columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample are Arrow-batched pandas UDFs over
``mapInPandas``.

Round-3 upgrade: the decode step is REAL for the formats implementable
from public specs with the stdlib — PNG (zlib + chunk framing + all
five scanline filters), baseline JPEG (markers, canonical Huffman,
DPCM, dequant + IDCT — functions/codecs.py), WAV (RIFF PCM16), and a
concatenated-PNG frame container; decode_image sniffs the magic and
dispatches. ``fake=True`` remains available as the payload-agnostic
plumbing path (deterministic payload-seeded pseudo-decode) for formats
that genuinely need an external codec (H.264 & co. video containers,
progressive/subsampled JPEG), and is what the html-payload driver
queries use; the real paths are exercised by the png_*/jpeg_*/wav_*
driver queries, whose decoded statistics are verified end-to-end
against closed-form DuckDB oracles (the synthetic pixel/sample rules
are pure arithmetic).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import codecs as C

META_SCHEMA = StructType(
    [
        StructField("n_bytes", LongType(), False),
        StructField("magic", StringType(), True),
        StructField("modality", StringType(), False),
    ]
)

_MAGICS = {
    b"\xff\xd8\xff": ("jpeg", "image"),
    b"\x89PN": ("png", "image"),
    b"RIF": ("riff", "audio"),
    b"<ht": ("html", "text"),
}


def attach_html_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive the input-hint ``html: binary`` column (BASELINE.json:15)."""
    return df.withColumn(
        "html",
        F.encode(
            F.concat(F.lit("<html><body>"), F.col(text_col), F.lit("</body></html>")),
            "utf-8",
        ),
    )


def extract_meta(df: DataFrame, binary_col: str = "html") -> DataFrame:
    """Typed metadata struct from an opaque binary column (vectorized)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[binary_col]
            n = blobs.map(lambda b: 0 if b is None else len(b)).astype("int64")
            magic, modality = [], []
            for b in blobs:
                head = bytes(b[:3]) if b is not None else b""
                m = _MAGICS.get(head, ("unknown", "binary"))
                magic.append(m[0])
                modality.append(m[1])
            yield pdf.assign(
                meta=[
                    {"n_bytes": int(nb), "magic": mg, "modality": mo}
                    for nb, mg, mo in zip(n, magic, modality)
                ]
            )

    out_schema = StructType(df.schema.fields + [StructField("meta", META_SCHEMA, False)])
    return df.mapInPandas(run, schema=out_schema)


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_intensity", DoubleType(), False),
        StructField("thumbnail", BinaryType(), False),
    ]
)


def decode_image(
    df: DataFrame, binary_col: str = "html", id_col: str = "doc_id", fake: bool = False
) -> DataFrame:
    """Image decode + feature extraction over Arrow batches.

    Real path: payloads are PNG or baseline JPEG bytes, decoded by the
    from-scratch spec codecs (functions/codecs.py, format-sniffed);
    mean_intensity is the exact integer pixel
    sum divided once (matches the SQL oracle bit-for-bit) and the
    thumbnail is a real 8x8 nearest-neighbor re-encode. ``fake=True``
    keeps the payload-agnostic plumbing path for undecodable formats.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(blob or b"")
                if fake:
                    seed = int.from_bytes(b[:8].ljust(8, b"\0"), "little")
                    w = 16 + seed % 64
                    h = 16 + (seed >> 8) % 64
                    arr = np.frombuffer(b, dtype=np.uint8)
                    mean = float(arr.mean()) if len(arr) else 0.0
                    rows.append((int(did), int(w), int(h), mean, b[:16]))
                else:
                    img = C.decode_any_image(b)
                    h, w = img.shape[:2]
                    mean = float(int(img.sum(dtype=np.int64))) / img.size
                    thumb = C.png_encode(C.resize_nearest(img, 8, 8))
                    rows.append((int(did), int(w), int(h), mean, thumb))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mean_intensity", "thumbnail"],
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("mean_intensity", DoubleType(), False),
    ]
)


def resize_image(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "doc_id",
    factor: int = 2,
    fake: bool = False,
) -> DataFrame:
    """Image resize feature-extraction over Arrow batches.

    Real path: PNG decode -> nearest-neighbor downscale by ``factor``
    (out = in // factor, source index = (i * in) // out — the exact
    mapping the SQL oracle reproduces) -> exact mean. ``fake=True``:
    the payload-agnostic plumbing path (every factor-th byte)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(blob or b"")
                if fake:
                    seed = int.from_bytes(b[:8].ljust(8, b"\0"), "little")
                    w = (16 + seed % 64) // factor
                    h = (16 + (seed >> 8) % 64) // factor
                    sub = np.frombuffer(b, dtype=np.uint8)[::factor]
                    mean = float(sub.mean()) if len(sub) else 0.0
                    rows.append((int(did), int(w), int(h), mean))
                else:
                    img = C.decode_any_image(b)
                    h, w = img.shape[:2]
                    ow, oh = max(w // factor, 1), max(h // factor, 1)
                    small = C.resize_nearest(img, ow, oh)
                    mean = float(int(small.sum(dtype=np.int64))) / small.size
                    rows.append((int(did), int(ow), int(oh), mean))
            yield pd.DataFrame(rows, columns=["doc_id", "out_w", "out_h", "mean_intensity"])

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_off", LongType(), False),
        StructField("frame_byte", IntegerType(), False),
    ]
)

FRAMES_REAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_intensity", DoubleType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "doc_id",
    n_frames: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Frame sampling over Arrow batches (one output row per sampled
    frame — the 1-row-in / n-rows-out fan-out shape).

    Real path: the payload is a concatenated-PNG sequence; frame
    boundaries are found by signature scan, ``n_frames`` evenly-spaced
    frames are REALLY decoded and summarized. ``fake=True``: evenly
    spaced byte offsets (payload-agnostic plumbing for true video
    containers, which need an external codec)."""

    def run_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(blob or b"")
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    off = i * step
                    rows.append(
                        (int(did), i, off, int(b[off]) if off < len(b) else -1)
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_off", "frame_byte"]
            )

    def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                frames = C.png_seq_decode(bytes(blob or b""))
                k = len(frames)
                take = (
                    range(k)
                    if k <= n_frames
                    else [(i * k) // n_frames for i in range(n_frames)]
                )
                for i, fi in enumerate(take):
                    img = frames[fi]
                    h, w = img.shape[:2]
                    mean = float(int(img.sum(dtype=np.int64))) / img.size
                    rows.append((int(did), i, int(w), int(h), mean))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "width", "height", "mean_intensity"],
            )

    if fake:
        return df.mapInPandas(run_fake, schema=FRAMES_SCHEMA)
    return df.mapInPandas(run_real, schema=FRAMES_REAL_SCHEMA)
