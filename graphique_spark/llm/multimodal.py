"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata, processed by Arrow-batched pandas functions via ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this environment):
``decode_image_stub`` derives deterministic fake dimensions/features from
the bytes so the Spark-side plumbing — schema contract, batch iteration,
partition-parallel execution — is real and testable. Swapping the stub for
PIL/torchvision is a one-function change; the plan shape is identical.

Scale notes: ``mapInPandas`` streams Arrow record batches through one
Python worker per core; binary payloads never pass through the driver.
For very large blobs, store (path, offset, length) pointers and fetch in
the batch function instead of materializing blobs in the table.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema contract for decoded image metadata + features
DECODED_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, channels int, features array<double>"
)


def attach_fake_blob(df: DataFrame, text: str = "text", out: str = "blob") -> DataFrame:
    """Demo helper: derive a deterministic binary column from text (the
    testdata ships no real media); real pipelines read binary parquet/
    ``binaryFile`` sources directly."""
    return df.withColumn(out, F.encode(F.col(text), "utf-8"))


def decode_image_stub(blob: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: width/height/channels and an 8-dim
    feature vector derived from byte statistics. Replace with a real
    decoder (PIL, ffmpeg) outside this container."""
    if blob is None or len(blob) == 0:
        raise NotImplementedError("empty blob: real decoder required for actual media")
    n = len(blob)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    channels = 3
    features = [float(blob[i % n]) / 255.0 for i in range(8)]
    return width, height, channels, features


def decode_images(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Decode binary blobs to metadata + features via ``mapInPandas``
    (Arrow-batched; one Python roundtrip per batch, not per row)."""

    def batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                width, height, channels, features = decode_image_stub(blob)
                rows.append((doc_id, len(blob), width, height, channels, features))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "byte_len", "width", "height", "channels", "features"],
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample_stub(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id", every: int = 10
) -> DataFrame:
    """Video-frame-sampling plumbing: one output row per sampled frame
    index; frame decode itself is stubbed to a byte-derived checksum."""

    def batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                n_frames = max(len(blob) // 100, 1)
                for idx in range(0, n_frames, every):
                    checksum = sum(blob[idx : idx + 100]) % 65536
                    rows.append((doc_id, idx, checksum))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "checksum"])

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema="doc_id long, frame_idx int, checksum int"
    )


def resize_images_stub(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    target: tuple[int, int] = (32, 32),
) -> DataFrame:
    """Resize plumbing: emits the target-size metadata and a re-derived
    byte-stat feature per image. The actual pixel resample is stubbed
    (no imaging libs here); a real implementation swaps the body for
    PIL's ``Image.resize`` keeping the same Arrow-batched contract."""

    tw, th = target

    def batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                if not blob:
                    raise NotImplementedError("empty blob: real resampler required")
                # deterministic stand-in for the resampled pixel summary
                mean_byte = sum(blob) / len(blob) / 255.0
                rows.append((doc_id, tw, th, mean_byte))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mean_px"])

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema="doc_id long, width int, height int, mean_px double"
    )


def audio_features_stub(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id", n_bands: int = 4
) -> DataFrame:
    """Audio feature-extraction plumbing: per-blob band energies (stubbed
    as strided byte means); a real pipeline swaps in an FFT over decoded
    PCM with the same (id, array<double>) contract."""

    def batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in iterator:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(blob)
                if not blob:
                    raise NotImplementedError("empty blob: real decoder required")
                bands = [
                    (sum(blob[b::n_bands]) / max(len(blob[b::n_bands]), 1)) / 255.0
                    for b in range(n_bands)
                ]
                rows.append((doc_id, bands))
            yield pd.DataFrame(rows, columns=["doc_id", "bands"])

    return df.select(id_col, blob_col).mapInPandas(
        batches, schema="doc_id long, bands array<double>"
    )
