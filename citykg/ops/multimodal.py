"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (the reference's teximage path, DBTexImage.java:81-91,
generalized to a training-data pipeline).

The Spark-side plumbing — schema, Arrow batch shape, partition-preserving
mapInPandas, metadata propagation — is real and tested. The actual codec
work is STUBBED: this container has no image/audio libraries, so
`decode_image` produces a deterministic fake (dimensions/features derived
from the bytes) behind `_HAVE_PIL`, and raises NotImplementedError for
real decoding when the fake is disallowed. On a real cluster, swap the
`_fake_decode` body for PIL/ffmpeg calls — the batch contract is already
per-Arrow-batch numpy, which is where the real codecs plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField, StructType,
)

try:  # pragma: no cover - not present in this container
    import PIL  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("mime_type", StringType()),
        StructField("data", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("mime_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synth_media(docs_or_documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary column from text bytes — stands in for real
    image payloads so the plumbing is exercised end-to-end."""
    return docs_or_documents.select(
        F.concat(F.lit("img_"), F.col("doc_id").cast("string"), F.lit(".png")).alias("media_ref"),
        F.lit("image/png").alias("mime_type"),
        F.encode(F.col(text_col), "utf-8").alias("data"),
    )


def _fake_decode(ref: str, data: bytes, n_features: int) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decode: dims + features are
    pure functions of the payload bytes."""
    h = hashlib.blake2b(data or b"", digest_size=16).digest()
    width = 32 + h[0] % 224
    height = 32 + h[1] % 224
    feats = [round(b / 255.0, 6) for b in hashlib.blake2b(
        data or b"", digest_size=n_features).digest()]
    return width, height, feats


def decode_image(media: DataFrame, n_features: int = 16, allow_fake: bool = True) -> DataFrame:
    """media (MEDIA_SCHEMA) -> DECODED_SCHEMA via Arrow-batched mapInPandas.

    Real decode requires an image library (absent here); `allow_fake=True`
    uses the deterministic stand-in so the distributed plumbing (batching,
    schema, null payloads) is fully testable.
    """
    if not _HAVE_PIL and not allow_fake:
        raise NotImplementedError(
            "real image decode needs PIL/opencv (not in this container); "
            "pass allow_fake=True for the deterministic stand-in"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, mime, data in zip(pdf["media_ref"], pdf["mime_type"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                w, h, feats = _fake_decode(ref, b, n_features)
                rows.append((ref, mime, w, h, len(b), feats))
            yield pd.DataFrame(
                rows, columns=["media_ref", "mime_type", "width", "height", "n_bytes", "features"]
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


def resize_stub(decoded: DataFrame, max_dim: int = 128) -> DataFrame:
    """Resize metadata transform (aspect-preserving) — pure column math;
    the pixel work would live in the same mapInPandas as decode."""
    scale = F.least(
        F.lit(1.0), F.lit(max_dim) / F.greatest(F.col("width"), F.col("height"))
    )
    return decoded.withColumn("out_width", F.ceil(F.col("width") * scale).cast("int")).withColumn(
        "out_height", F.ceil(F.col("height") * scale).cast("int")
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0, duration_s: float = 10.0) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp —
    the explode that precedes a real ffmpeg extract."""
    n = int(fps * duration_s)
    return media.select(
        "media_ref",
        F.explode(F.expr(f"transform(sequence(0, {n - 1}), i -> i / {fps}D)")).alias("frame_ts"),
    )
