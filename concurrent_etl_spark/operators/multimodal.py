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


#: output schema of the frame sampler (one row per sampled frame)
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frame_units", LongType()),
        StructField("frame_md5", StringType()),
    ]
)

FRAME_UNITS = 256  #: stand-in fixed frame stride (decoded units)


def frame_sample(
    media: DataFrame, every_k: int = 4, frame_units: int = FRAME_UNITS
) -> DataFrame:
    """Sample every k-th fixed-stride 'frame' from video payloads.

    The row-expanding multimodal shape (1 video -> N frames) as a
    mapInPandas stage: each Arrow batch of payloads is DECODED (the
    stub codec is utf-8), sliced into fixed-length unit strides, and
    every k-th stride becomes a row. A real codec would seek
    keyframes; the stride/sampling/hash plumbing is identical and the
    DuckDB oracle verifies it exactly (frames on decoded units, not
    raw bytes, because the oracle must reproduce the slicing on any
    corpus, unicode included).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "n_frame_units": [],
                "frame_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = bytes(payload).decode("utf-8")  # the stub 'decode'
                for f in range(0, (len(s) + frame_units - 1) // frame_units, every_k):
                    fr = s[f * frame_units : (f + 1) * frame_units]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["n_frame_units"].append(len(fr))
                    out["frame_md5"].append(
                        hashlib.md5(fr.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.where(F.col("modality") == "video").mapInPandas(gen, FRAME_SCHEMA)


#: output schema of the resize stage (binary out + audit metadata)
RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_units", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
    ]
)


def resize_payload(media: DataFrame, target_units: int = 256) -> DataFrame:
    """'Resize' image payloads to a fixed decoded-unit budget.

    Decode -> clip -> re-encode, as a real resize would (decode,
    rescale, re-encode behind the same signature — see decode_image).
    The stub codec is utf-8 and a 'unit' is a decoded character, so
    the DuckDB oracle can reproduce the clip exactly on any corpus
    (byte-level clipping would split multibyte sequences, which no
    real re-encoder emits and no SQL oracle can hash).

    Binary in, binary out, metadata updated — downstream stages keep
    consuming (doc_id, payload) unchanged.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            clipped = pdf["payload"].map(
                lambda b: bytes(b).decode("utf-8")[:target_units]
            )
            out = clipped.map(lambda s: s.encode("utf-8"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "n_units": clipped.map(len).astype("int64"),
                    "n_bytes": out.map(len).astype("int64"),
                    "payload_md5": out.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.where(F.col("modality") == "image").mapInPandas(gen, RESIZE_SCHEMA)
