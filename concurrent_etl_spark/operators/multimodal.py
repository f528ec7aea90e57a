"""Multimodal (binary) column handling.

Design (north star): image/audio/video payloads are opaque BINARY
columns travelling next to typed metadata (modality, mime, width, …).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the payload bytes never pass through Python
row-at-a-time, and each batch is one Arrow buffer.

The container has no image/audio libraries, so the actual codecs are
STUBBED (``NotImplementedError``) behind a deterministic byte-level
feature extractor that keeps the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — real and testable.

At 100 TB: payloads dominate bytes, so the partitioning rule is
"split by target partition byte size, never by row count"
(``spark.sql.files.maxPartitionBytes``), and metadata-only queries
must prune the payload column at the scan (columnar parquet does
this for free — asserted in tests).
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

#: output schema of the byte-level feature extractor
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("first_byte", LongType()),
    ]
)


def synthesize_payloads(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in multimodal table: payload = utf-8 bytes of the text.

    Real pipelines read (payload BINARY, modality STRING, mime
    STRING) from parquet; this derives an equivalent column so the
    plumbing is exercised end-to-end on the shipped testdata.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
    )


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an imaging library (not shipped)."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, which this container does not "
        "ship; byte-level features below keep the pipeline testable"
    )


def decode_audio(payload: bytes) -> object:
    """Real audio decode — requires an audio library (not shipped)."""
    raise NotImplementedError("audio decode requires soundfile/librosa")


def _feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched byte-level feature extraction (the stub 'decoder').

    Deterministic features only — n_bytes, md5, first byte — so the
    DuckDB oracle can verify the full mapInPandas round trip.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": payloads.map(len).astype("int64"),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "first_byte": payloads.map(
                    lambda b: int(b[0]) if len(b) else -1
                ).astype("int64"),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, modality)."""
    return media.mapInPandas(_feature_batches, FEATURE_SCHEMA)
