"""Multimodal columns: opaque binary payloads + typed metadata.

Design per the round brief: image/audio/video travel as ``binary``
columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample are Arrow-batched pandas UDFs over
``mapInPandas``. The image/audio libraries are not in this container,
so the decode step is STUBBED — ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic fake (seeded from the payload bytes) with the real
schema, partitioning, UDF signature, and batch shape, so the Spark-side
plumbing is fully exercised and tested.
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
    """Image decode + resize feature extraction over Arrow batches.

    STUB: no image codec exists in this container. With ``fake=True`` a
    deterministic payload-seeded fake flows through the real schema and
    batch shape; otherwise NotImplementedError (clearly marked).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires an image codec (PIL/libvips) which "
                    "is not installed in this environment; pass fake=True to "
                    "exercise the pipeline plumbing with deterministic fakes"
                )
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(blob or b"")
                seed = int.from_bytes(b[:8].ljust(8, b"\0"), "little")
                w = 16 + seed % 64
                h = 16 + (seed >> 8) % 64
                arr = np.frombuffer(b, dtype=np.uint8)
                mean = float(arr.mean()) if len(arr) else 0.0
                rows.append((int(did), int(w), int(h), mean, b[:16]))
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

    STUB like decode_image: with ``fake=True`` the "resized pixels" are
    every ``factor``-th payload byte — deterministic, schema/batching
    real, and expressible in the DuckDB oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires an image codec not present in "
                    "this environment; pass fake=True for the plumbing path"
                )
            rows = []
            for did, blob in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(blob or b"")
                seed = int.from_bytes(b[:8].ljust(8, b"\0"), "little")
                w = (16 + seed % 64) // factor
                h = (16 + (seed >> 8) % 64) // factor
                sub = np.frombuffer(b, dtype=np.uint8)[::factor]
                mean = float(sub.mean()) if len(sub) else 0.0
                rows.append((int(did), int(w), int(h), mean))
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


def sample_frames(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "doc_id",
    n_frames: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling over Arrow batches (one output row per
    sampled frame). STUB: with ``fake=True`` the "frames" are evenly
    spaced byte offsets and the frame feature is the byte value there —
    the fan-out shape (1 row in, n rows out) is the real plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires a video codec not present in "
                    "this environment; pass fake=True for the plumbing path"
                )
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

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)
