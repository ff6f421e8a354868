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
    width/height come from a hash so they're stable across runs.
    """
    payload = F.encode("text", "utf-8").cast(BinaryType())
    h = F.abs(F.xxhash64("text"))
    meta = F.struct(
        (h % 1024 + 64).cast("long").alias("width"),
        (F.floor(h / 1024) % 1024 + 64).cast("long").alias("height"),
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
