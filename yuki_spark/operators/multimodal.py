"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (clearly marked below); everything Spark-side —
binary columns, metadata structs, Arrow batch shape, ``mapInPandas``
partition flow — is real and tested. On a cluster the fake body is
replaced by e.g. PIL/torchvision decode inside the same iterator.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable_hash60
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("byte_mean", LongType()),
    ]
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary 'image' column + metadata struct.

    Payload bytes derive deterministically from the text (utf-8);
    width/height come from the engine-portable 60-bit md5 hash
    (``functions.portable_hash60``) so the DuckDB oracle can
    recompute them, via bit ops (exact — no double rounding).
    """
    payload = F.encode("text", "utf-8").cast(BinaryType())
    h = portable_hash60("text")
    meta = F.struct(
        (h.bitwiseAND(F.lit(1023)) + 64).cast("long").alias("width"),
        (F.shiftrightunsigned(h, 10).bitwiseAND(F.lit(1023)) + 64).cast("long").alias("height"),
        F.lit("image/fake").alias("mime"),
    )
    return docs.select("doc_id", payload.alias("media"), meta.alias("meta"))


def _decode_stub(payload: bytes) -> dict:
    """FAKE decode — deterministic stand-in for an image decoder.

    Real deployments swap this for an actual codec; the Spark plumbing
    around it (Arrow batches, schema, partitioning) is unchanged.
    """
    return {
        "n_bytes": len(payload),
        "checksum": hashlib.md5(payload).hexdigest(),
        "byte_mean": sum(payload) // max(len(payload), 1),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow record batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int64"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int64"),
                    "byte_mean": [f["byte_mean"] for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: batch-shape/schema are real; the pixel resample
    is a deterministic fake (truncate/tile payload bytes to the target
    area) — swap ``_fake_resample`` for PIL/torchvision on a cluster
    with codecs installed."""

    def _fake_resample(payload: bytes, area: int) -> bytes:
        if not payload:
            return b"\x00" * area
        reps = area // len(payload) + 1
        return (payload * reps)[:area]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        area = target_w * target_h
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media": [_fake_resample(bytes(b), area) for b in pdf["media"]],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Video-style frame sampling: one input row fans out to
    ``n_frames`` rows (the 1→N batch shape a real decoder produces).
    Frames are evenly-spaced byte slices of the payload — a stand-in
    for keyframe extraction; the row-explosion plumbing is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(b)
                for i in range(n_frames):
                    off = (len(payload) * i) // max(n_frames, 1)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(payload[off : off + frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAME_SCHEMA)


WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("win", BinaryType()),
    ]
)


def frame_windows(
    media: DataFrame, frame_bytes: int = 64, hop_bytes: int = 32
) -> DataFrame:
    """Audio-style sliding-window framing: the payload is sliced into
    overlapping windows of ``frame_bytes`` advancing by ``hop_bytes``
    (the STFT/feature-frame batch shape an audio pipeline produces).
    Every byte offset < len(payload) starts a window; the final
    windows are ragged (shorter than ``frame_bytes``) exactly as a
    real framer emits them. The 1→N fan-out runs inside one
    ``mapInPandas`` iterator — Arrow batches in, Arrow batches out,
    no Python-per-row serialization."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, wins = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(b)
                start, i = 0, 0
                while start < len(payload):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    wins.append(payload[start : start + frame_bytes])
                    start += hop_bytes
                    i += 1
            yield pd.DataFrame({"doc_id": ids, "win_idx": idxs, "win": wins})

    return media.mapInPandas(run, WINDOW_SCHEMA)
