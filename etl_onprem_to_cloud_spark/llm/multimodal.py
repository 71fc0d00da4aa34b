"""Multimodal column plumbing (Ring C).

Pattern: media travels as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

The container has no image/audio codecs, so the actual decode is a
STUB: ``decode_image(..., fake=True)`` produces a deterministic fake
feature vector from the payload's md5 (stable across runs, good enough
to exercise schema/partitioning/batching end-to-end), and
``fake=False`` raises NotImplementedError where a real
``PIL.Image.open`` / ``torchvision`` call would go.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row count) governs scan
tasks; ``maxRecordsPerFile`` on write keeps shuffle blocks bounded; and
``mapInPandas`` receives Arrow record batches whose size is tuned with
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", mime: str = "application/octet-stream"
) -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of the
    text, standing in for image/audio bytes) + typed metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col("doc_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("bigint").alias("byte_len"),
    )


def _fake_decode(payload: bytes, feat_dim: int) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decode: md5-derived
    pseudo-dimensions and features."""
    digest = hashlib.md5(payload or b"").digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    feats = [
        round((digest[(i * 3) % 16] / 255.0) * 2.0 - 1.0, 6) for i in range(feat_dim)
    ]
    return width, height, feats


def decode_image_features(
    media: DataFrame,
    feat_dim: int = 8,
    fake: bool = True,
    decoder: "Callable[[bytes, int], tuple[int, int, list[float]]] | None" = None,
) -> DataFrame:
    """Arrow-batched decode + feature extraction over a binary column.

    ``decoder`` is the pluggable codec boundary: any picklable callable
    ``(payload_bytes, feat_dim) -> (width, height, features)`` -- e.g. a
    closure over ``PIL.Image.open`` + a vision encoder -- drops in
    without editing this module, and is shipped to executors inside the
    same Arrow-batched ``mapInPandas`` contract (MEDIA_SCHEMA ->
    IMAGE_FEATURE_SCHEMA).  When ``decoder`` is None, ``fake=True``
    selects the deterministic md5 stub (the CI path; the container has
    no codecs) and ``fake=False`` raises where the real decode would go.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = decoder
        if decode is None:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision (not in "
                    "container); pass decoder= or use fake=True for the "
                    "deterministic stub"
                )
            decode = _fake_decode
        for pdf in batches:
            decoded = [decode(p, feat_dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "byte_len": pdf["byte_len"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' over a binary payload: emit one row per sampled
    offset (stand-in for video frame extraction).  Built-in exprs only:
    the payload is sliced JVM-side, no Python."""
    n = F.least(
        F.floor(F.col("byte_len") / every_n_bytes).cast("int") + 1,
        F.lit(max_frames),
    )
    idx = F.sequence(F.lit(0), n - 1)
    return media.select(
        "doc_id",
        F.explode(idx).alias("frame_no"),
    ).withColumn("byte_offset", (F.col("frame_no") * every_n_bytes).cast("bigint"))


def audio_chunks(
    media: DataFrame,
    sample_rate: int = 16000,
    bytes_per_sample: int = 2,
    chunk_ms: int = 1000,
) -> DataFrame:
    """Audio-style chunking over a binary payload: one row per fixed-
    duration chunk, with sample offsets derived from byte length under
    a declared (rate, width) contract -- the audio leg of the
    multimodal story (image=decode/resize, video=frame-sample,
    audio=chunk).  All JVM-side sequence+explode; the actual PCM decode
    belongs behind the same pluggable codec boundary as images.

    Output: (doc_id, chunk_no, start_ms, n_samples) where the last
    chunk may be short; empty payloads yield no chunks."""
    samples_per_chunk = sample_rate * chunk_ms // 1000
    n_samples = F.floor(F.col("byte_len") / bytes_per_sample).cast("bigint")
    n_chunks = F.ceil(n_samples / F.lit(samples_per_chunk)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return (
        media.filter(F.col("byte_len") >= bytes_per_sample)
        .select("doc_id", n_samples.alias("__n"), F.explode(idx).alias("chunk_no"))
        .select(
            "doc_id",
            "chunk_no",
            (F.col("chunk_no").cast("bigint") * chunk_ms).alias("start_ms"),
            F.least(
                F.lit(samples_per_chunk).cast("bigint"),
                F.col("__n") - F.col("chunk_no").cast("bigint") * samples_per_chunk,
            ).alias("n_samples"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Arrow-batched 'resize' over binary payloads.

    The real implementation would decode, ``PIL.Image.resize``, and
    re-encode; the container has no codecs, so the stub derives the
    resized payload deterministically (truncate/pad the byte stream to
    target_w*target_h) while keeping the exact production contract:
    mapInPandas MEDIA_SCHEMA -> RESIZED_SCHEMA, binary in, binary out,
    batch-at-a-time.
    """
    n_bytes = target_w * target_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p or b"")[:n_bytes].ljust(n_bytes, b"\0")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                    "payload": payloads,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)
