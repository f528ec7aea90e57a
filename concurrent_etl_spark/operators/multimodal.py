"""Multimodal (binary) column handling.

Design (north star): image/audio/video payloads are opaque BINARY
columns travelling next to typed metadata (modality, mime, width, …).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the payload bytes never pass through Python
row-at-a-time, and each batch is one Arrow buffer.

The container has no image/audio libraries (PIL/librosa); FIVE REAL
codecs are vendored with zero dependencies and oracle-checked
end-to-end: RIFF/WAV audio (stdlib ``wave``), 24-bit BMP and PNG
images (manual DIB parse; stdlib ``zlib`` with CRC-checked chunks,
DEFLATE, all five predictive scanline filters), YUV4MPEG2 (Y4M)
video (header grammar + frame demux), and baseline JPEG (T.81
Huffman entropy decode, dequant, IDCT — see ``jpeg_decode_gray``).
The ONE remaining env-gate is mp3 (``decode_audio`` raises
``NotImplementedError`` for it): a Huffman+IMDCT psychoacoustic
decoder is a codec project, not a Spark surface, and WAV already
exercises audio's entire Spark architecture (SCALE.md §11b); the
gate keeps schema, partitioning, UDF signature, and batch shape
real and testable for the format anyway.

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


def _pil_available() -> bool:
    try:  # pragma: no cover - depends on environment
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _soundfile_available() -> bool:
    try:  # pragma: no cover - depends on environment
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(payload: bytes) -> object:
    """Compressed-format image decode, environment-adaptive: uses PIL
    when the environment ships it (returns an ``(h, w, mode,
    pixel_bytes)`` tuple); otherwise JPEG payloads route to the
    VENDORED baseline decoder (the JPEG section below — Huffman +
    dequant + IDCT on pure numpy), and only the formats that
    genuinely need an imaging lib (webp/tiff/...) raise the
    documented guard. Same detect-if-available pattern as
    sources/excel.py openpyxl."""
    if _pil_available():  # pragma: no cover - depends on environment
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(bytes(payload)))
        return (img.height, img.width, img.mode, img.tobytes())
    buf = bytes(payload)
    if buf[:2] == b"\xff\xd8":  # JPEG SOI
        # malformed/truncated streams raise ValueError (a data
        # error wherever it runs); grayscale decodes via the
        # single-component fast path, 3-component baseline (4:4:4
        # and 4:2:0 YCbCr) via the color decoder (which hands SOF2
        # streams to the progressive multi-scan decoder), and only
        # the genuinely exotic variants (arithmetic coding, 12-bit,
        # other samplings) re-raise the environment guard — PIL
        # decodes those fine
        try:
            px = jpeg_decode_gray(buf)
            return (px.shape[0], px.shape[1], "L", px.tobytes())
        except UnsupportedJpegError:
            pass
        try:
            rgb = jpeg_decode_rgb(buf)
        except UnsupportedJpegError as exc:
            raise NotImplementedError(
                f"JPEG variant beyond the vendored baseline decoder "
                f"({exc}); decoding it requires PIL/opencv, which "
                "this container does not ship"
            ) from exc
        return (rgb.shape[0], rgb.shape[1], "RGB", rgb.tobytes())
    raise NotImplementedError(
        "non-JPEG compressed image decode requires PIL/opencv, which "
        "this container does not ship; the vendored BMP/PNG/JPEG "
        "codecs and byte-level features keep the pipeline testable"
    )


def decode_audio(payload: bytes) -> object:
    """Compressed-format audio decode (mp3/flac/...), environment-
    adaptive: uses soundfile when available (returns
    ``(sample_rate, n_channels, samples_bytes)``), else raises the
    documented guard — the vendored WAV decoder covers the
    architecture in this container."""
    if _soundfile_available():  # pragma: no cover - depends on environment
        import io

        import soundfile

        data, rate = soundfile.read(io.BytesIO(bytes(payload)))
        n_ch = 1 if data.ndim == 1 else data.shape[1]
        return (int(rate), int(n_ch), data.tobytes())
    raise NotImplementedError(
        "compressed audio decode requires soundfile/librosa; the "
        "vendored WAV codec covers the decode architecture here"
    )


def _feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched byte-level feature extraction (the stub 'decoder').

    Deterministic features only — n_bytes, md5, first byte — so the
    DuckDB oracle can verify the full mapInPandas round trip.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        # None-safe: a NULL payload (NULL source text / failed fetch —
        # guaranteed in a real corpus) yields NULL features, exactly
        # the oracle's md5(NULL)/octet_length(NULL) propagation;
        # nullable Int64 keeps the Arrow longs NULL-capable
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": payloads.map(
                    lambda b: None if b is None else len(b)
                ).astype("Int64"),
                "payload_md5": payloads.map(
                    lambda b: None
                    if b is None
                    else hashlib.md5(bytes(b)).hexdigest()
                ),
                "first_byte": payloads.map(
                    lambda b: None
                    if b is None
                    else (int(b[0]) if len(b) else -1)
                ).astype("Int64"),
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
                if payload is None:
                    continue  # NULL payload -> no frames (oracle: the
                    # frame join on length(NULL) matches nothing)
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
            # None-safe (NULL payload -> NULL out, the oracle's
            # substring(NULL)/md5(NULL) propagation)
            clipped = pdf["payload"].map(
                lambda b: None
                if b is None
                else bytes(b).decode("utf-8")[:target_units]
            )
            out = clipped.map(
                lambda s: None if s is None else s.encode("utf-8")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "n_units": clipped.map(
                        lambda s: None if s is None else len(s)
                    ).astype("Int64"),
                    "n_bytes": out.map(
                        lambda b: None if b is None else len(b)
                    ).astype("Int64"),
                    "payload_md5": out.map(
                        lambda b: None
                        if b is None
                        else hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return media.where(F.col("modality") == "image").mapInPandas(gen, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codecs — formats decodable with the standard library alone
# ---------------------------------------------------------------------------
# WAV is readable with stdlib `wave`; BMP, PNG, Y4M, and baseline
# JPEG are documented public formats parsed by hand below (only mp3
# remains env-gated). Every path runs a GENUINE binary encode ->
# Arrow batch -> decode round trip with no dependency: the
# synthesizers build bytes with manual struct packing and the
# decoders parse independently, so a bug in either side breaks the
# algebraic oracle.

WAV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_frames", LongType()),
        StructField("sum_sq", LongType()),
        StructField("pos_weighted_sum", LongType()),
        StructField("peak", LongType()),
    ]
)

WAV_RATE = 8000


def wav_bytes(doc_id: int) -> bytes:
    """Deterministic mono 16-bit PCM WAV: n = 200 + doc_id % 801
    frames of s(i) = ((i*37 + doc_id*11) % 2001) - 1000 — integer
    samples an SQL oracle reproduces in closed form."""
    import struct

    n = 200 + doc_id % 801
    frames = b"".join(
        struct.pack("<h", ((i * 37 + doc_id * 11) % 2001) - 1000)
        for i in range(n)
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(frames))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(frames))
        + frames
    )


def _spread_ids(docs: DataFrame, every: int, phase: int) -> DataFrame:
    """Stage a synth id stream for a Python codec stage: push the
    modulo slice into Spark (so only 1/``every`` of the ids ever
    cross the JVM->Python boundary) and hash-repartition by doc_id
    to the session's default parallelism. The doc_id-only projection
    prunes the documents scan down to one tiny input split, which
    would otherwise serialize ALL downstream encode/decode work on a
    single task (guide §2.5/§2.6: the one-unsplittable-input
    pathology — repartition right after the read). The added
    exchange moves 8-byte ids only, orders of magnitude cheaper than
    the per-row codec work it parallelizes; the partition count
    derives from the runtime (scale-adaptive), not a constant.
    """
    n = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id")
        .where(F.col("doc_id") % every == phase)
        .repartition(n, "doc_id")
    )


def synthesize_wav(docs: DataFrame, every: int = 5) -> DataFrame:
    """(doc_id, payload) of real RIFF/WAV bytes for every k-th doc."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"] if d % every == 0]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [wav_bytes(d) for d in ids]}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return _spread_ids(docs, every, 0).mapInPandas(gen, schema)


def wav_decode_features(media: DataFrame) -> DataFrame:
    """REAL audio decode via stdlib ``wave``: header fields + exact
    integer sample statistics. pos_weighted_sum is order-sensitive,
    so a decoder that misreads frame order/width fails the oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            rows = {k.name: [] for k in WAV_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w = wave.open(io.BytesIO(bytes(payload)), "rb")
                nf, nch = w.getnframes(), w.getnchannels()
                samples = struct.unpack(
                    f"<{nf * nch}h", w.readframes(nf)
                )
                rows["doc_id"].append(int(doc_id))
                rows["sample_rate"].append(w.getframerate())
                rows["n_channels"].append(nch)
                rows["n_frames"].append(nf)
                rows["sum_sq"].append(sum(s * s for s in samples))
                rows["pos_weighted_sum"].append(
                    sum((i + 1) * s for i, s in enumerate(samples))
                )
                rows["peak"].append(max(abs(s) for s in samples))
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, WAV_SCHEMA)


BMP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("pos_checksum", LongType()),
    ]
)


def _bmp_pixel(x: int, y: int, doc_id: int) -> tuple[int, int, int]:
    """Deterministic RGB at TOP-DOWN (x, y)."""
    return (
        (x * 7 + y * 13 + doc_id) % 256,
        (x * 3 + y * 5) % 256,
        (x + y + doc_id * 17) % 256,
    )


def bmp_bytes(doc_id: int) -> bytes:
    """Deterministic 24-bit uncompressed BMP: (8 + id%9) x (4 + id%5),
    BGR pixel order, 4-byte-padded rows, bottom-up storage — the
    standard Windows DIB layout."""
    import struct

    w, h = 8 + doc_id % 9, 4 + doc_id % 5
    stride = (3 * w + 3) // 4 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = _bmp_pixel(x, y, doc_id)
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        body += row
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


def synthesize_bmp(docs: DataFrame, every: int = 4, phase: int = 1) -> DataFrame:
    """(doc_id, payload) of real BMP bytes for doc_id % every == phase."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"] if d % every == phase]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [bmp_bytes(d) for d in ids]}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return _spread_ids(docs, every, phase).mapInPandas(gen, schema)


def bmp_decode_features(media: DataFrame) -> DataFrame:
    """REAL image decode: honest header-field parse (pixel offset,
    dimensions, bpp) + padded bottom-up BGR row walk. pos_checksum
    weights each pixel by its TOP-DOWN position, so wrong row order,
    padding, or channel order fails the oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = {k.name: [] for k in BMP_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:2] != b"BM":
                    raise ValueError("not a BMP payload")
                (offset,) = struct.unpack_from("<I", buf, 10)
                w, h = struct.unpack_from("<ii", buf, 18)
                (bpp,) = struct.unpack_from("<H", buf, 28)
                if bpp != 24:
                    raise ValueError(f"unsupported bpp {bpp}")
                bottom_up = h > 0
                h = abs(h)
                stride = (3 * w + 3) // 4 * 4
                sr = sg = sb = chk = 0
                for y in range(h):  # top-down output coordinates
                    src_row = (h - 1 - y) if bottom_up else y
                    base = offset + src_row * stride
                    for x in range(w):
                        b_, g_, r_ = buf[base + 3 * x : base + 3 * x + 3]
                        sr += r_
                        sg += g_
                        sb += b_
                        chk += (y * w + x + 1) * (r_ + g_ + b_)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(sr)
                rows["sum_g"].append(sg)
                rows["sum_b"].append(sb)
                rows["pos_checksum"].append(chk)
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, BMP_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("sum_sq", LongType()),
        StructField("peak", LongType()),
    ]
)


def wav_window_features(media: DataFrame, window: int = 100) -> DataFrame:
    """Audio analog of frame sampling: decode real WAV payloads and
    emit one row per fixed-length sample window (1 -> N expansion)
    with exact integer energy stats — the framing step before any
    spectral featurizer. Short final windows are kept (their length
    is reported), matching what a real STFT pipeline pads."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            rows = {k.name: [] for k in AUDIO_WINDOW_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w = wave.open(io.BytesIO(bytes(payload)), "rb")
                nf, nch = w.getnframes(), w.getnchannels()
                # channel-0 analysis: unpack ALL interleaved samples
                # (nf * nch — a stereo payload would otherwise crash
                # the struct.unpack), then stride to one channel
                samples = struct.unpack(
                    f"<{nf * nch}h", w.readframes(nf)
                )[::nch]
                for wi in range((nf + window - 1) // window):
                    chunk = samples[wi * window : (wi + 1) * window]
                    rows["doc_id"].append(int(doc_id))
                    rows["window_idx"].append(wi)
                    rows["n_samples"].append(len(chunk))
                    rows["sum_sq"].append(sum(s * s for s in chunk))
                    rows["peak"].append(max(abs(s) for s in chunk))
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, AUDIO_WINDOW_SCHEMA)


def bmp_resize_nearest(
    media: DataFrame, target_w: int = 4, target_h: int = 3
) -> DataFrame:
    """REAL image resize: decode the BMP, nearest-neighbor sample
    (src = floor(dst * src_dim / dst_dim) — integer arithmetic, so an
    SQL oracle reproduces pixel selection exactly), and RE-ENCODE a
    valid BMP. Binary in, binary out: downstream decoders keep
    working on the resized payloads, which is the contract a
    PIL-backed resize would satisfy at 100 TB."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out_ids, out_payloads = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                (offset,) = struct.unpack_from("<I", buf, 10)
                w, h = struct.unpack_from("<ii", buf, 18)
                bottom_up = h > 0
                h = abs(h)
                stride = (3 * w + 3) // 4 * 4

                def px(x: int, y: int) -> tuple[int, int, int]:
                    src_row = (h - 1 - y) if bottom_up else y
                    base = offset + src_row * stride + 3 * x
                    b_, g_, r_ = buf[base : base + 3]
                    return r_, g_, b_

                tstride = (3 * target_w + 3) // 4 * 4
                body = bytearray()
                for y in range(target_h - 1, -1, -1):  # bottom-up out
                    row = bytearray()
                    for x in range(target_w):
                        r_, g_, b_ = px(
                            x * w // target_w, y * h // target_h
                        )
                        row += bytes((b_, g_, r_))
                    row += b"\x00" * (tstride - len(row))
                    body += row
                header = (
                    b"BM"
                    + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                    + struct.pack(
                        "<IiiHHIIiiII",
                        40, target_w, target_h, 1, 24, 0, len(body),
                        2835, 2835, 0, 0,
                    )
                )
                out_ids.append(int(doc_id))
                out_payloads.append(header + bytes(body))
            # one output Arrow batch per input batch — buffering the
            # whole partition's re-encoded payloads defeats the
            # byte-budgeted batching the module header promises
            yield pd.DataFrame({"doc_id": out_ids, "payload": out_payloads})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return media.mapInPandas(gen, schema)


# --- PNG: a real COMPRESSED image codec on stdlib zlib ---------------
#
# BMP above proves raster layout handling; PNG adds the two things a
# production image pipeline actually fights: entropy coding (zlib
# DEFLATE) and per-scanline predictive filtering (the five PNG filter
# types). Encoder and decoder below implement ECMA-ish ISO/IEC 15948
# structure honestly: signature, CRC-checked chunks, IHDR, multi-chunk
# IDAT, filter reconstruction (None/Sub/Up/Average/Paeth). Reference
# parity note: the reference repo has no image path at all; this is
# north-star surface (multimodal columns), kept dependency-free.

PNG_SCHEMA = BMP_SCHEMA  # same typed-feature contract as the BMP path


def _png_pixel(x: int, y: int, doc_id: int) -> tuple[int, int, int]:
    """Deterministic RGB at top-down (x, y) — closed form the DuckDB
    oracle reproduces exactly."""
    return (
        (x * 11 + y * 3 + doc_id * 5) % 256,
        (x * 2 + y * 7 + doc_id) % 256,
        (x * 5 + y + doc_id * 3) % 256,
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode(raw_rows: list[bytes]) -> bytes:
    """Encode top-down RGB scanlines (each 3*w bytes) as a real PNG.
    Every filter type is exercised (row y uses filter y % 5), and the
    IDAT stream is split into two chunks when it exceeds 64 bytes, so
    a decoder that ignores filters or reads only the first IDAT
    cannot round-trip."""
    import struct
    import zlib

    h = len(raw_rows)
    stride = len(raw_rows[0])
    w = stride // 3
    body = bytearray()
    prior = b"\x00" * stride
    for y, raw in enumerate(raw_rows):
        ft = y % 5
        body.append(ft)
        for i in range(stride):
            left = raw[i - 3] if i >= 3 else 0
            up = prior[i]
            ul = prior[i - 3] if i >= 3 else 0
            if ft == 0:
                v = raw[i]
            elif ft == 1:
                v = raw[i] - left
            elif ft == 2:
                v = raw[i] - up
            elif ft == 3:
                v = raw[i] - (left + up) // 2
            else:
                v = raw[i] - _paeth(left, up, ul)
            body.append(v & 0xFF)
        prior = raw

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    comp = zlib.compress(bytes(body), 6)
    idats = (
        [comp]
        if len(comp) <= 64
        else [comp[: len(comp) // 2], comp[len(comp) // 2 :]]
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + b"".join(chunk(b"IDAT", d) for d in idats)
        + chunk(b"IEND", b"")
    )


def png_bytes(doc_id: int) -> bytes:
    """Deterministic 8-bit RGB PNG: (6 + id%11) x (5 + id%6), raster
    from ``_png_pixel`` — the instance the DuckDB oracle recomputes in
    closed form."""
    w, h = 6 + doc_id % 11, 5 + doc_id % 6
    return png_encode(
        [
            b"".join(bytes(_png_pixel(x, y, doc_id)) for x in range(w))
            for y in range(h)
        ]
    )


def png_decode_stats(buf: bytes) -> tuple[int, int, int, int, int, int]:
    """Pure decode: parse + CRC-check the chunk stream, inflate IDAT,
    reconstruct scanlines through the five PNG filters; returns
    (w, h, sum_r, sum_g, sum_b, pos_checksum)."""
    import struct
    import zlib

    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w, h = 8, None, None
    idat = bytearray()
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + ln)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", data, 0)
            if (depth, ctype) != (8, 2):
                raise ValueError("unsupported PNG format")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    body = zlib.decompress(bytes(idat))
    stride = 3 * w
    prior = bytearray(stride)
    sr = sg = sb = chk = 0
    for y in range(h):
        base = y * (stride + 1)
        ft = body[base]
        raw = bytearray(stride)
        line = body[base + 1 : base + 1 + stride]
        for i in range(stride):
            left = raw[i - 3] if i >= 3 else 0
            up = prior[i]
            ul = prior[i - 3] if i >= 3 else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = line[i] + left
            elif ft == 2:
                v = line[i] + up
            elif ft == 3:
                v = line[i] + (left + up) // 2
            elif ft == 4:
                v = line[i] + _paeth(left, up, ul)
            else:
                raise ValueError(f"bad filter {ft}")
            raw[i] = v & 0xFF
        for x in range(w):
            r_, g_, b_ = raw[3 * x : 3 * x + 3]
            sr += r_
            sg += g_
            sb += b_
            chk += (y * w + x + 1) * (r_ + g_ + b_)
        prior = raw
    return w, h, sr, sg, sb, chk


def synthesize_png(docs: DataFrame, every: int = 4, phase: int = 2) -> DataFrame:
    """(doc_id, payload) of real PNG bytes for doc_id % every == phase."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"] if d % every == phase]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [png_bytes(d) for d in ids]}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return _spread_ids(docs, every, phase).mapInPandas(gen, schema)


def png_decode_features(media: DataFrame) -> DataFrame:
    """REAL compressed-image decode: verify the PNG signature, walk
    the chunk stream (CRC-checking each chunk), inflate the
    concatenated IDAT payload, reconstruct every scanline through the
    five PNG filters, and emit exact integer pixel stats.  The
    position-weighted checksum fails on wrong filter math, scanline
    order, or channel order — the same contract a PIL-backed decoder
    would have to meet."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in PNG_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, sr, sg, sb, chk = png_decode_stats(bytes(payload))
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(sr)
                rows["sum_g"].append(sg)
                rows["sum_b"].append(sb)
                rows["pos_checksum"].append(chk)
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, PNG_SCHEMA)


# --- Y4M: a real VIDEO container (YUV4MPEG2) on pure stdlib ----------
#
# WAV/BMP/PNG cover audio and image; Y4M covers video with the same
# zero-dependency honesty: it is the standard uncompressed interchange
# format (mjpegtools lineage, consumed by ffmpeg/x264) — an ASCII
# stream header ("YUV4MPEG2 W.. H.. F.. C444"), then per frame an
# ASCII "FRAME" marker followed by raw Y, U, V planes. Parsing it
# exercises what a real video pipeline's demux step does: header
# grammar, frame iteration, plane geometry.

Y4M_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_y", LongType()),
        StructField("sum_u", LongType()),
        StructField("sum_v", LongType()),
        StructField("pos_checksum", LongType()),
    ]
)


def _y4m_sample(x: int, y: int, f: int, doc_id: int, plane: int) -> int:
    """Deterministic plane sample at (x, y) of frame f — closed form
    the DuckDB oracle reproduces."""
    return (x * 7 + y * 11 + f * 13 + doc_id * 3 + plane * 29) % 256


def y4m_bytes(doc_id: int) -> bytes:
    """Deterministic C444 Y4M clip: (4 + id%5) x (2 + id%3) pixels,
    (2 + id%4) frames, 25 fps."""
    w, h, nf = 4 + doc_id % 5, 2 + doc_id % 3, 2 + doc_id % 4
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode())
    for f in range(nf):
        out += b"FRAME\n"
        for plane in range(3):  # Y, U, V — full resolution in C444
            for yy in range(h):
                for xx in range(w):
                    out.append(_y4m_sample(xx, yy, f, doc_id, plane))
    return bytes(out)


def synthesize_y4m(docs: DataFrame, every: int = 4, phase: int = 3) -> DataFrame:
    """(doc_id, payload) of real Y4M bytes for doc_id % every == phase."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"] if d % every == phase]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [y4m_bytes(d) for d in ids]}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return _spread_ids(docs, every, phase).mapInPandas(gen, schema)


def y4m_decode_stats(buf: bytes) -> list[tuple[int, int, int, int, int, int, int]]:
    """Pure demux: parse the stream header (width/height/colorspace
    tags in any order), iterate FRAME markers, walk the three full-
    resolution planes; per frame returns (frame_idx, w, h, sum_y,
    sum_u, sum_v, pos_checksum) with the checksum weighting each
    sample by its (plane, row, col) position."""
    nl = buf.index(b"\n")
    header = buf[:nl].decode()
    parts = header.split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a Y4M stream")
    w = h = None
    c444 = False
    for tag in parts[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("C"):
            c444 = tag[1:] == "444"
    if w is None or h is None:
        raise ValueError("missing dimensions")
    if not c444:
        raise ValueError("only C444 supported")
    plane = w * h
    pos = nl + 1
    frames = []
    fidx = 0
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if buf[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("bad frame marker")
        pos = fnl + 1
        sums = [0, 0, 0]
        chk = 0
        for p in range(3):
            data = buf[pos + p * plane : pos + (p + 1) * plane]
            if len(data) != plane:
                raise ValueError("truncated frame")
            sums[p] = sum(data)
            chk += sum(
                (p * plane + i + 1) * v for i, v in enumerate(data)
            )
        frames.append((fidx, w, h, sums[0], sums[1], sums[2], chk))
        fidx += 1
        pos += 3 * plane
    return frames


def y4m_frame_features(media: DataFrame) -> DataFrame:
    """REAL video demux: 1 -> N frame expansion with exact integer
    plane statistics per frame, through the stdlib Y4M parser."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in Y4M_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fi, w, h, sy, su, sv, chk in y4m_decode_stats(
                    bytes(payload)
                ):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(fi)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["sum_y"].append(sy)
                    rows["sum_u"].append(su)
                    rows["sum_v"].append(sv)
                    rows["pos_checksum"].append(chk)
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, Y4M_SCHEMA)


ZCR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("window_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_zero_crossings", LongType()),
    ]
)


def wav_zcr_features(media: DataFrame, window: int = 100) -> DataFrame:
    """Zero-crossing rate per fixed window through the REAL WAV
    decode: the classic integer-exact voiced/unvoiced + noisiness
    descriptor (high ZCR ~ fricatives/noise, low ~ voiced speech) and
    the cheapest audio-quality gate a corpus pipeline can run — no
    FFT, no floats, exact under any partitioning. A crossing is a
    strict sign change between adjacent samples (zero counts as
    non-negative); windows do not count crossings across their
    boundary, so window rows are independently recomputable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            rows = {k.name: [] for k in ZCR_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w = wave.open(io.BytesIO(bytes(payload)), "rb")
                nf, nch = w.getnframes(), w.getnchannels()
                samples = struct.unpack(
                    f"<{nf * nch}h", w.readframes(nf)
                )[::nch]
                for wi in range((nf + window - 1) // window):
                    chunk = samples[wi * window : (wi + 1) * window]
                    zc = sum(
                        1
                        for a, b in zip(chunk, chunk[1:])
                        if (a >= 0) != (b >= 0)
                    )
                    rows["doc_id"].append(int(doc_id))
                    rows["window_idx"].append(wi)
                    rows["n_samples"].append(len(chunk))
                    rows["n_zero_crossings"].append(zc)
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, ZCR_SCHEMA)


PITCH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("pitch_lag", LongType()),
        StructField("r_at_peak", LongType()),
    ]
)


def wav_pitch_autocorr(
    media: DataFrame, min_lag: int = 20, max_lag: int = 79
) -> DataFrame:
    """Pitch-period estimate by autocorrelation argmax through the
    REAL WAV decode: R(L) = sum_i s[i]*s[i+L] over the whole clip for
    L in [min_lag, max_lag]; the winning lag is the fundamental
    period estimate (8000/lag Hz). Time-domain DSP with exact int64
    arithmetic — no FFT, no floats, ties broken toward the smaller
    lag, so the answer is bit-stable under any partitioning and an
    SQL oracle can recompute every correlation in closed form."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        import numpy as np

        for pdf in batches:
            rows = {k.name: [] for k in PITCH_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w = wave.open(io.BytesIO(bytes(payload)), "rb")
                nf, nch = w.getnframes(), w.getnchannels()
                s = np.array(
                    struct.unpack(f"<{nf * nch}h", w.readframes(nf))[::nch],
                    dtype=np.int64,
                )
                best_lag, best_r = None, None
                for lag in range(min_lag, max_lag + 1):
                    if lag >= nf:
                        break
                    r = int(np.dot(s[: nf - lag], s[lag:]))
                    if best_r is None or r > best_r:
                        best_lag, best_r = lag, r
                rows["doc_id"].append(int(doc_id))
                rows["n_frames"].append(nf)
                rows["pitch_lag"].append(best_lag)
                rows["r_at_peak"].append(best_r)
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, PITCH_SCHEMA)


BOX_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("pos_checksum", LongType()),
    ]
)


def bmp_box_downsample_stats(media: DataFrame) -> DataFrame:
    """2x2 box-average downsample through the REAL BMP decode: each
    output pixel is the integer mean (div 4) of its 2x2 source block
    — an actual low-pass filter, vs the nearest-neighbor resize's
    pure sampling. Odd trailing rows/columns are cropped (floor
    semantics), matching what the closed-form oracle computes. Emits
    exact integer stats of the downsampled raster."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = {k.name: [] for k in BOX_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                (offset,) = struct.unpack_from("<I", buf, 10)
                w, h = struct.unpack_from("<ii", buf, 18)
                bottom_up = h > 0
                h = abs(h)
                stride = (3 * w + 3) // 4 * 4

                def px(x: int, y: int) -> tuple[int, int, int]:
                    src_row = (h - 1 - y) if bottom_up else y
                    base = offset + src_row * stride + 3 * x
                    b_, g_, r_ = buf[base : base + 3]
                    return r_, g_, b_

                ow, oh = w // 2, h // 2
                sr = sg = sb = chk = 0
                for oy in range(oh):
                    for ox in range(ow):
                        block = [
                            px(2 * ox + dx, 2 * oy + dy)
                            for dy in (0, 1)
                            for dx in (0, 1)
                        ]
                        r_ = sum(p[0] for p in block) // 4
                        g_ = sum(p[1] for p in block) // 4
                        b_ = sum(p[2] for p in block) // 4
                        sr += r_
                        sg += g_
                        sb += b_
                        chk += (oy * ow + ox + 1) * (r_ + g_ + b_)
                rows["doc_id"].append(int(doc_id))
                rows["out_w"].append(ow)
                rows["out_h"].append(oh)
                rows["sum_r"].append(sr)
                rows["sum_g"].append(sg)
                rows["sum_b"].append(sb)
                rows["pos_checksum"].append(chk)
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, BOX_SCHEMA)


ARROW_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("prefix_hex", StringType()),
    ]
)


def _arrow_feature_batches(batches):
    """RecordBatch-level feature extraction: the mapInArrow form of
    the byte 'decoder' — payload buffers are touched as Arrow binary
    scalars, never copied into pandas objects (one indirection fewer
    than mapInPandas; the right boundary when the Python work is
    byte-wise rather than columnar-numeric)."""
    import pyarrow as pa

    for batch in batches:
        doc_id = batch.column("doc_id")
        modality = batch.column("modality")
        # .as_py() of a NULL Arrow scalar is None (a pyarrow scalar is
        # never the Python None object, so `v is None` can't catch it)
        # — propagate NULL features exactly like the oracle's
        # md5(NULL)/octet_length(NULL)
        payloads = [v.as_py() for v in batch.column("payload")]
        yield pa.RecordBatch.from_arrays(
            [
                doc_id,
                modality,
                pa.array(
                    [None if b is None else len(b) for b in payloads],
                    type=pa.int64(),
                ),
                pa.array(
                    [
                        None if b is None else hashlib.md5(b).hexdigest()
                        for b in payloads
                    ]
                ),
                pa.array(
                    [None if b is None else b[:8].hex() for b in payloads]
                ),
            ],
            names=["doc_id", "modality", "n_bytes", "payload_md5", "prefix_hex"],
        )


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """mapInArrow feature extraction over (doc_id, payload, modality)."""
    return media.mapInArrow(_arrow_feature_batches, ARROW_FEATURE_SCHEMA)


def y4m_bytes_scene(doc_id: int) -> bytes:
    """Deterministic C444 Y4M clip WITH a scene cut: same geometry as
    ``y4m_bytes`` but every sample from frame ``cut`` onward jumps by
    +128 (mod 256) — the luminance discontinuity a shot boundary
    produces. cut = 1 + doc_id % (nf - 1) lands strictly inside the
    clip for every nf >= 2."""
    w, h, nf = 4 + doc_id % 5, 2 + doc_id % 3, 2 + doc_id % 4
    cut = 1 + doc_id % (nf - 1)
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode())
    for f in range(nf):
        out += b"FRAME\n"
        jump = 128 if f >= cut else 0
        for plane in range(3):
            for yy in range(h):
                for xx in range(w):
                    out.append(
                        (_y4m_sample(xx, yy, f, doc_id, plane) + jump) % 256
                    )
    return bytes(out)


def synthesize_y4m_scene(
    docs: DataFrame, every: int = 4, phase: int = 1
) -> DataFrame:
    """(doc_id, payload) of scene-cut Y4M clips for doc_id % every == phase."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"] if d % every == phase]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [y4m_bytes_scene(d) for d in ids]}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return _spread_ids(docs, every, phase).mapInPandas(gen, schema)


def y4m_motion_stats(buf: bytes) -> list[tuple[int, int, int]]:
    """Real temporal video analysis through the demuxer: per frame
    transition (f-1 -> f), the CIRCULAR sum of absolute differences
    min(|a-b|, 256-|a-b|) over all samples of all three planes —
    integer-exact frame-difference energy. Returns
    (frame_idx, n_samples, sad_circ) for f >= 1."""
    nl = buf.index(b"\n")
    parts = buf[:nl].decode().split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a Y4M stream")
    w = h = None
    for tag in parts[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
    if w is None or h is None:
        raise ValueError("missing dimensions")
    frame_bytes = 3 * w * h
    pos = nl + 1
    prev: bytes | None = None
    out: list[tuple[int, int, int]] = []
    fi = 0
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if not buf[pos:fnl].startswith(b"FRAME"):
            raise ValueError("missing FRAME marker")
        pos = fnl + 1
        cur = buf[pos : pos + frame_bytes]
        pos += frame_bytes
        if prev is not None:
            sad = 0
            for a, b in zip(cur, prev):
                d = a - b if a >= b else b - a
                sad += d if d <= 256 - d else 256 - d
            out.append((fi, frame_bytes, sad))
        prev = cur
        fi += 1
    return out


MOTION_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_px", LongType()),
        StructField("sad_circ", LongType()),
    ]
)


def y4m_motion_features(media: DataFrame) -> DataFrame:
    """1 clip -> (nf - 1) frame-transition rows of circular SAD."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in MOTION_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fi, npx, sad in y4m_motion_stats(bytes(payload)):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(fi)
                    rows["n_px"].append(npx)
                    rows["sad_circ"].append(sad)
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, MOTION_SCHEMA)


SOBEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_mag_l1", LongType()),
        StructField("max_mag_l1", LongType()),
        StructField("n_edge_px", LongType()),
    ]
)


def bmp_sobel_features(media: DataFrame, threshold: int = 300) -> DataFrame:
    """Sobel edge statistics through the REAL BMP decoder: parse the
    DIB header + padded bottom-up BGR rows into an intensity raster
    (intensity = r+g+b, exact int), convolve the 3x3 Sobel kernels
    over INTERIOR pixels, and report the L1 gradient field — sum,
    max, and the count of pixels whose |gx|+|gy| clears ``threshold``.
    All arithmetic is integer, so the statistics are bit-stable at
    any parallelism; numpy does the convolution vectorized per image
    inside the Arrow batch (no per-pixel Python).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            rows = {k.name: [] for k in SOBEL_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:2] != b"BM":
                    raise ValueError("not a BMP payload")
                (offset,) = struct.unpack_from("<I", buf, 10)
                w, h = struct.unpack_from("<ii", buf, 18)
                bottom_up = h > 0
                h = abs(h)
                stride = (3 * w + 3) // 4 * 4
                raster = np.zeros((h, w), dtype=np.int64)
                for y in range(h):
                    src_row = (h - 1 - y) if bottom_up else y
                    base = offset + src_row * stride
                    row = np.frombuffer(
                        buf, dtype=np.uint8, count=3 * w, offset=base
                    ).astype(np.int64)
                    raster[y] = row[0::3] + row[1::3] + row[2::3]
                c = raster
                gx = (
                    (c[:-2, 2:] + 2 * c[1:-1, 2:] + c[2:, 2:])
                    - (c[:-2, :-2] + 2 * c[1:-1, :-2] + c[2:, :-2])
                )
                gy = (
                    (c[2:, :-2] + 2 * c[2:, 1:-1] + c[2:, 2:])
                    - (c[:-2, :-2] + 2 * c[:-2, 1:-1] + c[:-2, 2:])
                )
                mag = np.abs(gx) + np.abs(gy)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_mag_l1"].append(int(mag.sum()))
                rows["max_mag_l1"].append(int(mag.max()) if mag.size else 0)
                rows["n_edge_px"].append(int((mag >= threshold).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, SOBEL_SCHEMA)


# --- JPEG: a real lossy image codec, vendored on pure numpy ----------
#
# The last NotImplementedError in the tree was the compressed-image
# decode behind PIL detection (decode_image above). Baseline JPEG
# (ITU-T T.81 / ISO 10918-1, public spec) is decodable with nothing
# but integer Huffman coding and an 8x8 IDCT, so it gets the same
# vendored-codec treatment as xlsx/Avro/WAV/BMP/PNG/Y4M: Spark owns
# listing/scheduling/batching, Python owns only the byte decode, and
# the synthesized fixture is closed-form so an oracle can recompute
# the DECODED pixels analytically. Reference parity: the reference
# has no binary-media handling at all (pandas/Excel only); this is
# north-star multimodal-column plumbing (SURVEY §7 step 5).
#
# Scope: baseline sequential DCT (SOF0), 8-bit, single-component
# (grayscale), no subsampling, no restart markers — the decoder
# validates and rejects everything else loudly. Huffman tables are
# read from the file's own DHT segments (canonical code
# reconstruction), never assumed.

#: ITU-T T.81 Annex K.1 luminance quantization table (row-major).
_JPEG_QTABLE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K.3.1 luminance DC table: BITS (code-length histogram) and
#: HUFFVAL (symbols in code order). Written into DHT verbatim; the
#: decoder rebuilds codes from the segment, so the round trip is
#: self-contained even on engines with different default tables.
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))

#: Annex K.3.2 luminance AC table.
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_zigzag() -> list[int]:
    """Zigzag scan order as raster indices (generated, not hardcoded:
    a diagonal walk alternating direction, per T.81 figure 5)."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()  # even diagonals walk bottom-left -> top-right
        order.extend(y * 8 + x for y, x in diag)
    return order


_ZIGZAG = _jpeg_zigzag()


def _dct_matrix():
    """8x8 DCT-II basis C with C[u,x] = c(u)/2 * cos((2x+1)u*pi/16);
    forward DCT of a block f is C @ f @ C.T, inverse is C.T @ F @ C."""
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return m


class _BitWriter:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= 8 - self.nbits  # pad with 0s (1s also legal)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)

    def restart(self, idx: int) -> None:
        """Byte-align (pad) and emit an RSTn marker — markers live
        OUTSIDE the stuffed entropy stream, so the 0xFF is raw."""
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.nbits = 0, 0
        self.out += bytes((0xFF, 0xD0 + idx))


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman (T.81 C.2): symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude_bits(v: int) -> tuple[int, int]:
    """(category, appended-bits) coding of a DC diff / AC coefficient
    (T.81 F.1.2.1: negatives are stored one's-complemented)."""
    size = 0
    a = abs(v)
    while a:
        size += 1
        a >>= 1
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _jpeg_encode_block(bw, blk, q, dcc, acc, prev_dc: int) -> int:
    """DCT + quantize + Huffman-code ONE level-shifted 8x8 block into
    ``bw``; returns the new DC predictor. Shared by the grayscale and
    color encoders — identical bit output to the original inline
    form (float DCT, round-half-away to integer, round-half-up
    quantization in exact integer arithmetic, RLE AC with ZRL/EOB).
    """
    import numpy as np

    C = _dct_matrix()
    coef = C @ blk @ C.T
    # round to integer half-away (true coefficients of the
    # flat oracle fixture are exact integers, so float eps
    # cannot flip this), then quantize round-half-up exactly
    ci = np.floor(np.abs(coef) + 0.5).astype(np.int64) * np.sign(
        coef
    ).astype(np.int64)
    quant = (2 * ci + q) // (2 * q)  # floor((c + q/2) / q)
    zz = [int(quant.flat[i]) for i in _ZIGZAG]
    size, bits = _magnitude_bits(zz[0] - prev_dc)
    code, ln = dcc[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = acc[0xF0]  # ZRL: 16 zeros
            bw.write(zc, zl)
            run -= 16
        size, bits = _magnitude_bits(zz[i])
        code, ln = acc[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        ec, el = acc[0x00]  # EOB
        bw.write(ec, el)
    return zz[0]


def jpeg_encode_gray(pix) -> bytes:
    """Encode an 8-bit grayscale raster (numpy uint8, h x w with h, w
    multiples of 8) as a baseline JFIF JPEG with the Annex K tables.

    General encoder: float DCT, round-half-up quantization in exact
    integer arithmetic (coefficients are rounded to integers first,
    then (2c + q) // (2q) with floor semantics — deterministic across
    platforms), run-length AC coding with ZRL/EOB."""
    import struct

    import numpy as np

    h, w = pix.shape
    if h % 8 or w % 8:
        raise ValueError("fixture rasters are multiples of 8")
    q = np.array(_JPEG_QTABLE, dtype=np.int64).reshape(8, 8)
    dcc = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    acc = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = pix[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - 128.0
            prev_dc = _jpeg_encode_block(bw, blk, q, dcc, acc, prev_dc)
    data = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xFFDB,
        b"\x00" + bytes(_JPEG_QTABLE[i] for i in _ZIGZAG),  # DQT in zigzag
    )
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    )  # SOF0: 8-bit, 1 component, no subsampling
    out += seg(
        0xFFC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, removing
    0xFF00 stuffing and stopping at any other marker."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.buf):
                raise ValueError("truncated entropy-coded segment")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                # stuffed-byte lookahead needs one more byte; a
                # stream ending right after 0xFF is truncated, not
                # an IndexError (uniform truncation contract)
                if self.pos >= len(self.buf):
                    raise ValueError("truncated entropy-coded segment")
                nxt = self.buf[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("hit marker inside entropy data")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, idx: int) -> None:
        """Consume an expected RSTn marker at a restart boundary:
        discard the current byte's padding bits, then require
        0xFFD0+idx exactly (out-of-order restarts mean lost MCUs —
        a hard data error, not something to resynchronize silently)."""
        self.nbits = 0
        if self.pos + 1 >= len(self.buf):
            raise ValueError("truncated entropy-coded segment")
        if self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] != 0xD0 + idx:
            raise ValueError("missing or out-of-order restart marker")
        self.pos += 2


def _huff_decoder(bits: list[int], vals: list[int]):
    """(code, length) -> symbol map for canonical decode."""
    inv = {}
    for sym, (code, ln) in _huff_codes(bits, vals).items():
        inv[(ln, code)] = sym
    return inv


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.1.3.1 EXTEND: undo one's-complement negatives."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


class UnsupportedJpegError(ValueError):
    """A well-formed JPEG using a feature the vendored decoders do
    not implement. The grayscale fast path raises it for anything
    beyond 1-component baseline; the general path
    (:func:`jpeg_decode_rgb`, which handles baseline 1/3-component
    with 4:4:4 / 4:2:0 sampling, restart intervals, and delegates
    progressive SOF2) raises it only for the genuinely exotic
    residue: arithmetic coding, 12-bit precision, 16-bit quant
    tables, other sampling factors.
    Distinct from plain ``ValueError`` (malformed/truncated data) so
    ``decode_image`` can re-raise its environment guard: these
    streams ARE decodable where PIL is installed."""


def jpeg_decode_gray(buf: bytes):
    """Decode a baseline single-component JPEG to an h x w uint8
    numpy raster. Full marker walk: DQT (zigzag-stored, possibly
    multiple tables per segment), SOF0 (validated: 8-bit, one
    component, 1x1 sampling), DHT (canonical Huffman reconstruction
    from BITS/HUFFVAL — the file's own tables, never assumed), SOS,
    entropy-coded MCUs with byte unstuffing, DC prediction, AC
    run-length with ZRL/EOB, dezigzag, dequantize, float IDCT,
    level-shift + clamp. Rejects progressive (SOF2), multi-component,
    subsampled, and restart-interval streams loudly."""
    import struct

    import numpy as np

    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker sync lost")
        if pos + 1 >= len(buf):
            raise ValueError("truncated marker")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if pos + 2 > len(buf):
            raise ValueError("truncated segment length")
        (ln,) = struct.unpack_from(">H", buf, pos)
        if ln < 2 or pos + ln > len(buf):
            raise ValueError("truncated marker segment")
        body = buf[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise UnsupportedJpegError(
                        "16-bit quant tables unsupported"
                    )
                if b + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                zz = list(body[b + 1 : b + 65])
                tab = [0] * 64
                for i, idx in enumerate(_ZIGZAG):
                    tab[idx] = zz[i]
                qtables[tq] = tab
                b += 65
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 9:
                raise ValueError("truncated SOF0 segment")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 1:
                raise UnsupportedJpegError(
                    "only 8-bit single-component supported"
                )
            # component spec: id at body[6], sampling at [7], tq at [8]
            if body[7] != 0x11:
                raise UnsupportedJpegError("subsampling unsupported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(
                "only baseline sequential (SOF0) supported"
            )
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                if b + 17 + n > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[b + 17 : b + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, vals)
                b += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            if struct.unpack_from(">H", body, 0)[0] != 0:
                raise UnsupportedJpegError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            if len(body) < 3:
                raise ValueError("truncated SOS segment")
            td, ta = body[2] >> 4, body[2] & 0x0F
            pos += ln
            break
        pos += ln
    else:
        raise ValueError("no SOS marker")
    if h is None:
        raise ValueError("no SOF0 before SOS")
    if (0, td) not in htables or (1, ta) not in htables:
        raise ValueError("SOS references a missing Huffman table")
    if comp_q not in qtables:
        raise ValueError("SOF0 references a missing quant table")
    dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]
    q = np.array(qtables[comp_q], dtype=np.float64).reshape(8, 8)
    C = _dct_matrix()

    def read_symbol(br: _BitReader, tab: dict) -> int:
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.read_bit()
            ln += 1
            if (ln, code) in tab:
                return tab[(ln, code)]
            if ln > 16:
                raise ValueError("invalid Huffman stream")

    br = _BitReader(buf, pos)
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((bh * 8, bw_ * 8), dtype=np.uint8)
    pred = 0
    for by in range(bh):
        for bx in range(bw_):
            zz = [0] * 64
            size = read_symbol(br, dc_tab)
            pred += _extend(br.read_bits(size), size)
            zz[0] = pred
            k = 1
            while k < 64:
                rs = read_symbol(br, ac_tab)
                r, s = rs >> 4, rs & 0x0F
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(br.read_bits(s), s)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            for i, idx in enumerate(_ZIGZAG):
                coef[idx] = zz[i]
            blk = C.T @ (coef.reshape(8, 8) * q) @ C
            px = np.clip(np.floor(blk + 128.0 + 0.5), 0, 255)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px.astype(
                np.uint8
            )
    return out[:h, :w]


def _jpeg_block_value(bx: int, by: int, doc_id: int) -> int:
    """Flat value of block (bx, by) — closed form the oracle mirrors."""
    return (bx * 37 + by * 59 + doc_id * 13) % 256


def jpeg_bytes(doc_id: int) -> bytes:
    """Deterministic grayscale JPEG of 8x8-flat blocks: width
    8*(2 + id%5), height 8*(1 + id%4). A flat block's only nonzero
    DCT coefficient is DC = 8*(v-128) (exact — the T.81 forward DCT
    of a constant block), so the decoded block is analytically
    clamp(128 + 2*floor((v-128+1)/2), 0, 255) with q00=16: the
    DuckDB oracle recomputes the full DECODED raster in closed form,
    pinning quantizer rounding, Huffman coding, and the IDCT
    level-shift end to end."""
    import numpy as np

    w, h = 8 * (2 + doc_id % 5), 8 * (1 + doc_id % 4)
    pix = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            pix[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _jpeg_block_value(bx, by, doc_id)
            )
    return jpeg_encode_gray(pix)


JPEG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_blocks", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_min", LongType()),
        StructField("pixel_max", LongType()),
    ]
)


def synthesize_jpeg(docs: DataFrame, every: int = 4, phase: int = 0) -> DataFrame:
    """(doc_id, payload) of real JPEG bytes for doc_id % every == phase."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"] if d % every == phase]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [jpeg_bytes(d) for d in ids]}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return _spread_ids(docs, every, phase).mapInPandas(gen, schema)


def jpeg_decode_features(media: DataFrame) -> DataFrame:
    """REAL lossy-codec decode: full baseline JPEG (Huffman + dequant
    + IDCT) per payload, exact integer stats over the DECODED raster."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in JPEG_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = jpeg_decode_gray(bytes(payload))
                h, w = px.shape
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_blocks"].append((h // 8) * (w // 8))
                rows["pixel_sum"].append(int(px.sum()))
                rows["pixel_min"].append(int(px.min()))
                rows["pixel_max"].append(int(px.max()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, JPEG_SCHEMA)


# ---------------------------------------------------------------------------
# color (3-component YCbCr) baseline JPEG — 4:4:4 and 4:2:0
# ---------------------------------------------------------------------------
# Extends the vendored T.81 machinery above from single-component to
# the overwhelmingly common real payload: baseline YCbCr with either
# no chroma subsampling (4:4:4, every component 1x1) or 2x2 luma /
# 1x1 chroma sampling (4:2:0). The entropy/DCT core is shared
# (_jpeg_encode_block, _BitReader, _huff_decoder); what color adds
# is the interleaved MCU walk (T.81 A.2.3: within an MCU each
# component contributes H*V blocks in raster order), per-component
# DC predictors and table ids, chroma quantization (Annex K.2), and
# the JFIF fixed-point YCbCr->RGB conversion — integer arithmetic
# with pinned constants so a SQL oracle can recompute decoded pixels
# exactly. Progressive/arithmetic/12-bit remain UnsupportedJpegError.

#: ITU-T T.81 Annex K.2 chrominance quantization table (row-major).
_JPEG_QTABLE_C = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3.3.1 chrominance DC table.
_JPEG_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JPEG_DC_VALS_C = list(range(12))

#: Annex K.3.3.2 chrominance AC table.
_JPEG_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_JPEG_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: libjpeg's 16-bit fixed-point YCbCr->RGB constants (JFIF / BT.601:
#: FIX(1.40200), FIX(0.34414), FIX(0.71414), FIX(1.77200)). Public.
_YCC_R_CR = 91881
_YCC_G_CB = 22554
_YCC_G_CR = 46802
_YCC_B_CB = 116130
#: offset making every fixed-point numerator nonnegative before the
#: /65536 floor — so DuckDB's truncating // agrees with Python's
#: floor //. 512*65536 > 116130*128 + 32768, and 512 divides out.
_YCC_OFF = 512 * 65536


def _ycc_to_rgb_int(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """JFIF fixed-point YCbCr->RGB, one pixel, exact integers; the
    SQL oracle repeats this formula verbatim (floor via the
    nonnegative-offset trick, then clamp)."""
    cx, cy = cb - 128, cr - 128

    def fx(num: int) -> int:
        return (num + 32768 + _YCC_OFF) // 65536 - 512

    r = min(255, max(0, y + fx(_YCC_R_CR * cy)))
    g = min(255, max(0, y + fx(-_YCC_G_CB * cx - _YCC_G_CR * cy)))
    b = min(255, max(0, y + fx(_YCC_B_CB * cx)))
    return r, g, b


def jpeg_encode_ycbcr(
    yp, cbp, crp, subsample: str = "420", restart_interval: int = 0
) -> bytes:
    """Encode YCbCr planes as a baseline JFIF JPEG.

    ``subsample='444'``: all three planes are h x w, every component
    sampled 1x1, MCU = one block per component.
    ``subsample='420'``: luma is h x w (multiples of 16), chroma
    planes are (h/2) x (w/2); luma sampled 2x2, MCU = 4 luma blocks
    (raster order) + 1 Cb + 1 Cr (T.81 A.2.3 interleave order).

    ``restart_interval=N`` emits a DRI segment and an RSTn marker
    (cycling D0..D7) every N MCUs, resetting all DC predictors at
    each boundary — the error-resilience layout camera firmware
    writes. 0 (default) disables it.

    Component ids 1/2/3, luma quant/huff tables 0, chroma tables 1,
    independent DC predictors per component."""
    import struct

    import numpy as np

    h, w = yp.shape
    ql = np.array(_JPEG_QTABLE, dtype=np.int64).reshape(8, 8)
    qc = np.array(_JPEG_QTABLE_C, dtype=np.int64).reshape(8, 8)
    dcl = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    acl = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    dcc = _huff_codes(_JPEG_DC_BITS_C, _JPEG_DC_VALS_C)
    acc = _huff_codes(_JPEG_AC_BITS_C, _JPEG_AC_VALS_C)

    def blk(plane, by, bx):
        return plane[
            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
        ].astype(np.float64) - 128.0

    bw = _BitWriter()
    pred = [0, 0, 0]  # per-component DC predictors
    state = {"done": 0, "rst": 0}

    def mcu_boundary(total: int) -> None:
        state["done"] += 1
        if (
            restart_interval
            and state["done"] % restart_interval == 0
            and state["done"] < total
        ):
            bw.restart(state["rst"] % 8)
            state["rst"] += 1
            pred[0] = pred[1] = pred[2] = 0

    if subsample == "444":
        if h % 8 or w % 8 or cbp.shape != (h, w) or crp.shape != (h, w):
            raise ValueError("4:4:4 fixture planes must be h x w, /8")
        samp = (0x11, 0x11, 0x11)
        total = (h // 8) * (w // 8)
        for by in range(h // 8):
            for bx in range(w // 8):
                pred[0] = _jpeg_encode_block(
                    bw, blk(yp, by, bx), ql, dcl, acl, pred[0]
                )
                pred[1] = _jpeg_encode_block(
                    bw, blk(cbp, by, bx), qc, dcc, acc, pred[1]
                )
                pred[2] = _jpeg_encode_block(
                    bw, blk(crp, by, bx), qc, dcc, acc, pred[2]
                )
                mcu_boundary(total)
    elif subsample == "420":
        if h % 16 or w % 16:
            raise ValueError("4:2:0 fixture rasters are multiples of 16")
        if cbp.shape != (h // 2, w // 2) or crp.shape != (h // 2, w // 2):
            raise ValueError("4:2:0 chroma planes must be (h/2) x (w/2)")
        samp = (0x22, 0x11, 0x11)
        total = (h // 16) * (w // 16)
        for my in range(h // 16):
            for mx in range(w // 16):
                for v in range(2):  # 4 luma blocks, raster order
                    for u in range(2):
                        pred[0] = _jpeg_encode_block(
                            bw,
                            blk(yp, 2 * my + v, 2 * mx + u),
                            ql, dcl, acl, pred[0],
                        )
                pred[1] = _jpeg_encode_block(
                    bw, blk(cbp, my, mx), qc, dcc, acc, pred[1]
                )
                pred[2] = _jpeg_encode_block(
                    bw, blk(crp, my, mx), qc, dcc, acc, pred[2]
                )
                mcu_boundary(total)
    else:
        raise ValueError(f"unknown subsample mode {subsample!r}")
    data = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xFFDB,
        b"\x00" + bytes(_JPEG_QTABLE[i] for i in _ZIGZAG)
        + b"\x01" + bytes(_JPEG_QTABLE_C[i] for i in _ZIGZAG),
    )
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, sf, tq in ((1, samp[0], 0), (2, samp[1], 1), (3, samp[2], 1)):
        sof += bytes((cid, sf, tq))
    out += seg(0xFFC0, sof)
    out += seg(
        0xFFC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        + b"\x01" + bytes(_JPEG_DC_BITS_C) + bytes(_JPEG_DC_VALS_C)
        + b"\x11" + bytes(_JPEG_AC_BITS_C) + bytes(_JPEG_AC_VALS_C),
    )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    # SOS: 3 components, Y -> tables 0/0, Cb/Cr -> tables 1/1
    out += seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_decode_rgb(buf: bytes):
    """Decode a baseline JPEG (1- or 3-component) to an h x w x 3
    uint8 RGB numpy raster.

    Marker walk as in :func:`jpeg_decode_gray`, generalized:
    multiple quant/Huffman tables, a 3-component SOF0 with sampling
    factors of either all 1x1 (4:4:4) or luma 2x2 + chroma 1x1
    (4:2:0), interleaved MCU entropy decode (per MCU each component
    contributes H*V blocks in raster order, T.81 A.2.3), independent
    per-component DC predictors, nearest-neighbor chroma upsample,
    and the JFIF fixed-point integer YCbCr->RGB conversion
    (:func:`_ycc_to_rgb_int`). Restart intervals are honored (DRI +
    RSTn markers: byte-align, verify the cycling marker index, reset
    all DC predictors — T.81 E.2.4). A grayscale stream decodes via
    :func:`jpeg_decode_gray` and replicates the channel; a
    progressive (SOF2) stream is delegated to
    :func:`jpeg_decode_progressive`. Everything else (arithmetic,
    other samplings, 12-bit) raises :class:`UnsupportedJpegError`
    loudly."""
    import struct

    import numpy as np

    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (id, hs, vs, tq)
    scan_tabs: dict[int, tuple[int, int]] = {}  # comp id -> (td, ta)
    dri = 0  # restart interval in MCUs (DRI; 0 = no restarts)
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker sync lost")
        if pos + 1 >= len(buf):
            raise ValueError("truncated marker")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if pos + 2 > len(buf):
            raise ValueError("truncated segment length")
        (ln,) = struct.unpack_from(">H", buf, pos)
        if ln < 2 or pos + ln > len(buf):
            raise ValueError("truncated marker segment")
        body = buf[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise UnsupportedJpegError(
                        "16-bit quant tables unsupported"
                    )
                if b + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                zz = list(body[b + 1 : b + 65])
                tab = [0] * 64
                for i, idx in enumerate(_ZIGZAG):
                    tab[idx] = zz[i]
                qtables[tq] = tab
                b += 65
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF0 segment")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                raise UnsupportedJpegError(
                    "only 8-bit 1- or 3-component supported"
                )
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF0 component specs")
            for c in range(nc):
                cid = body[6 + 3 * c]
                hs, vs = body[7 + 3 * c] >> 4, body[7 + 3 * c] & 0x0F
                comps.append((cid, hs, vs, body[8 + 3 * c]))
            samps = [(hs, vs) for _, hs, vs, _ in comps]
            if nc == 1:
                if samps != [(1, 1)]:
                    raise UnsupportedJpegError("subsampling unsupported")
            elif samps not in (
                [(1, 1), (1, 1), (1, 1)],  # 4:4:4
                [(2, 2), (1, 1), (1, 1)],  # 4:2:0
            ):
                raise UnsupportedJpegError(
                    "only 4:4:4 and 4:2:0 sampling supported"
                )
        elif marker == 0xC2:  # SOF2: hand the whole stream to the
            # progressive decoder (same reconstruction pipeline)
            return jpeg_decode_progressive(buf)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(
                "only baseline sequential and progressive supported"
            )
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                if b + 17 + n > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[b + 17 : b + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, vals)
                b += 17 + n
        elif marker == 0xDD:  # DRI: restart every N MCUs (0 = off)
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if len(body) < 1:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            if ns != len(comps) or len(body) < 1 + 2 * ns + 3:
                raise ValueError("SOS component count mismatch")
            for c in range(ns):
                cs = body[1 + 2 * c]
                scan_tabs[cs] = (
                    body[2 + 2 * c] >> 4,
                    body[2 + 2 * c] & 0x0F,
                )
            pos += ln
            break
        pos += ln
    else:
        raise ValueError("no SOS marker")
    if h is None or not comps:
        raise ValueError("no SOF0 before SOS")
    for cid, _, _, tq in comps:
        if cid not in scan_tabs:
            raise ValueError("SOS missing a SOF0 component")
        td, ta = scan_tabs[cid]
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("SOS references a missing Huffman table")
        if tq not in qtables:
            raise ValueError("SOF0 references a missing quant table")

    C = _dct_matrix()

    def read_symbol(br: _BitReader, tab: dict) -> int:
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.read_bit()
            ln += 1
            if (ln, code) in tab:
                return tab[(ln, code)]
            if ln > 16:
                raise ValueError("invalid Huffman stream")

    def decode_block(br, dc_tab, ac_tab, q, pred: int):
        zz = [0] * 64
        size = read_symbol(br, dc_tab)
        pred += _extend(br.read_bits(size), size)
        zz[0] = pred
        k = 1
        while k < 64:
            rs = read_symbol(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += r
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(br.read_bits(s), s)
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        for i, idx in enumerate(_ZIGZAG):
            coef[idx] = zz[i]
        blk = C.T @ (coef.reshape(8, 8) * q) @ C
        # +1e-9: the float IDCT of a DC-only block computes
        # dc*q00*(0.5/sqrt2)^2*... a few ULPs BELOW the exact
        # rational (e.g. chroma q00=17 -> true pixel offsets in
        # eighths, 110.5 computes as 110.49999999999999), so a bare
        # floor(x+0.5) rounds half-values down nondeterministically
        # vs exact integer arithmetic. True values are always
        # multiples of 1/8 here and T.81 tolerates IDCT
        # approximation, so a fixed 1e-9 bias pins round-half-up
        # exactly without ever crossing a non-half boundary.
        px = np.clip(np.floor(blk + 128.0 + 0.5 + 1e-9), 0, 255)
        return px.astype(np.uint8), pred

    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    nmx = (w + 8 * hmax - 1) // (8 * hmax)
    nmy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    qs = []
    tabs = []
    for cid, hs, vs, tq in comps:
        planes.append(
            np.zeros((nmy * vs * 8, nmx * hs * 8), dtype=np.uint8)
        )
        qs.append(np.array(qtables[tq], dtype=np.float64).reshape(8, 8))
        td, ta = scan_tabs[cid]
        tabs.append((htables[(0, td)], htables[(1, ta)]))
    br = _BitReader(buf, pos)
    preds = [0] * len(comps)
    n_done = 0
    n_rst = 0
    for my in range(nmy):
        for mx in range(nmx):
            if dri and n_done and n_done % dri == 0:
                # restart boundary: byte-align, require the cycling
                # RSTn marker, reset every DC predictor (T.81 E.2.4)
                br.sync_restart(n_rst % 8)
                n_rst += 1
                preds = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                for v in range(vs):
                    for u in range(hs):
                        px, preds[ci] = decode_block(
                            br, tabs[ci][0], tabs[ci][1], qs[ci],
                            preds[ci],
                        )
                        by, bx = my * vs + v, mx * hs + u
                        planes[ci][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ] = px
            n_done += 1

    if len(comps) == 1:
        g = planes[0][:h, :w]
        return np.stack([g, g, g], axis=2)
    yp = planes[0][:h, :w]
    if comps[0][1] == 2:  # 4:2:0 -> nearest 2x2 chroma upsample
        cb = planes[1].repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
        cr = planes[2].repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
    else:
        cb, cr = planes[1][:h, :w], planes[2][:h, :w]
    # vectorized _ycc_to_rgb_int (same integer formula, numpy int64)
    yi = yp.astype(np.int64)
    cx = cb.astype(np.int64) - 128
    cy = cr.astype(np.int64) - 128

    def fx(num):
        return (num + 32768 + _YCC_OFF) // 65536 - 512

    r = np.clip(yi + fx(_YCC_R_CR * cy), 0, 255)
    g = np.clip(yi + fx(-_YCC_G_CB * cx - _YCC_G_CR * cy), 0, 255)
    b = np.clip(yi + fx(_YCC_B_CB * cx), 0, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


# --- progressive DCT (SOF2) ------------------------------------------------
#
# The last JPEG mode real crawls contain in volume (libjpeg's default
# web encoding for years): the same quantized coefficients as
# baseline, delivered across MULTIPLE scans — spectral selection
# (each scan carries one zigzag band) and successive approximation
# (each scan carries one more magnitude bit). Entropy semantics per
# ITU-T T.81 G.1/G.2: DC first scans code point-transformed diffs,
# DC refinement scans are raw bits, AC first scans add EOBn run
# codes (an End-Of-Band run spanning up to 32767 blocks), and AC
# refinement scans interleave newly-nonzero (run, ±1) codes with
# buffered correction bits for already-nonzero history. Because the
# entropy layer is lossless, decode(progressive(x)) must be
# BIT-IDENTICAL to decode(baseline(x)) — which is exactly how the
# tests pin this decoder against the already-oracle-verified
# baseline path (tests/test_multimodal_codecs.py).


#: progressive AC Huffman table: the Annex-K sequential AC tables do
#: NOT contain the EOBn symbols (0x10..0xE0 — run-of-EOB length
#: categories) progressive AC scans require, so the progressive
#: encoder writes its own canonical table carrying ALL 256 symbols
#: (128 at 8 bits + 128 at 9 bits; Kraft sum 0.75 < 1, so the
#: canonical construction is valid). Compression is deliberately
#: not the point — completeness and decoder coverage are; the
#: decoder always rebuilds whatever table the DHT carries.
_JPEG_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
_JPEG_PROG_AC_VALS = list(range(256))


def _jpeg_quantize_planes(planes, qs):
    """Quantized zigzag coefficient grids for whole planes.

    Returns per component an int array (by, bx, 64) in ZIGZAG order,
    using the exact rounding pipeline of :func:`_jpeg_encode_block`
    (float DCT, round-half-away to integer, round-half-up quantize in
    exact integer arithmetic) so progressive and baseline encodings
    of the same raster carry identical coefficients."""
    import numpy as np

    C = _dct_matrix()
    out = []
    for plane, q in zip(planes, qs):
        h, w = plane.shape
        grid = np.zeros((h // 8, w // 8, 64), dtype=np.int64)
        for by in range(h // 8):
            for bx in range(w // 8):
                blk = plane[
                    by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                ].astype(np.float64) - 128.0
                coef = C @ blk @ C.T
                ci = np.floor(np.abs(coef) + 0.5).astype(np.int64) * np.sign(
                    coef
                ).astype(np.int64)
                quant = (2 * ci + q) // (2 * q)
                grid[by, bx] = [int(quant.flat[i]) for i in _ZIGZAG]
        out.append(grid)
    return out


def _ac_point_transform(v: int, al: int) -> int:
    """AC successive-approximation point transform: divide by 2^Al
    truncating toward ZERO (T.81 G.1.2.2 — NOT an arithmetic shift;
    DC uses the arithmetic shift, AC uses this)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _enc_ac_first(
    bw, blocks, act, ss: int, se: int, al: int, ri: int = 0
) -> None:
    """AC first scan (Ah=0) for one component's blocks, T.81 G.1.2.2:
    in-band RLE with ZRL, End-Of-Band RUNS accumulated across blocks
    and coded as EOBn = ((n)<<4)|0 plus n appended bits. ``ri``
    inserts an RSTn boundary every ri blocks (non-interleaved scans
    count one block per MCU); an EOB run cannot cross a restart, so
    it is flushed first."""
    eobrun = 0
    rst = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = act[n << 4]
            bw.write(code, ln)
            bw.write(eobrun - (1 << n), n)
            eobrun = 0

    for bi, zz in enumerate(blocks):
        if ri and bi and bi % ri == 0:
            flush()
            bw.restart(rst % 8)
            rst += 1
        band = [_ac_point_transform(int(zz[k]), al) for k in range(64)]
        last = max((k for k in range(ss, se + 1) if band[k]), default=None)
        if last is None:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        for k in range(ss, last + 1):
            v = band[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]
                bw.write(code, ln)
                run -= 16
            size, bits = _magnitude_bits(v)
            code, ln = act[(run << 4) | size]
            bw.write(code, ln)
            bw.write(bits, size)
            run = 0
        if last < se:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(
    bw, blocks, act, ss: int, se: int, al: int, ri: int = 0
) -> None:
    """AC refinement scan (Ah=Al+1), T.81 G.1.2.3: newly-nonzero
    coefficients are (zero-history-run, ±1) codes; history
    coefficients contribute one correction bit each, buffered and
    emitted after the covering symbol (including across EOB runs).
    ``ri`` inserts an RSTn boundary every ri blocks; the EOB run AND
    its buffered correction bits flush before the marker."""
    eobrun = 0
    rst = 0
    pending: list[int] = []  # correction bits buffered across an EOB run

    def flush() -> None:
        nonlocal eobrun, pending
        if eobrun:
            n = eobrun.bit_length() - 1
            code, ln = act[n << 4]
            bw.write(code, ln)
            bw.write(eobrun - (1 << n), n)
            eobrun = 0
        for b in pending:
            bw.write(b, 1)
        pending = []

    for bi, zz in enumerate(blocks):
        if ri and bi and bi % ri == 0:
            flush()
            bw.restart(rst % 8)
            rst += 1
        newly = [
            k
            for k in range(ss, se + 1)
            if abs(int(zz[k])) >> al == 1
        ]
        last_new = max(newly, default=None)
        if last_new is None:
            for k in range(ss, se + 1):
                if abs(int(zz[k])) >> (al + 1):
                    pending.append((abs(int(zz[k])) >> al) & 1)
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        run = 0
        corr: list[int] = []
        for k in range(ss, last_new + 1):
            v = int(zz[k])
            a = abs(v) >> al
            if a == 0:
                run += 1
            elif a == 1:
                while run > 15:
                    code, ln = act[0xF0]
                    bw.write(code, ln)
                    for b in corr:
                        bw.write(b, 1)
                    corr = []
                    run -= 16
                code, ln = act[(run << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if v > 0 else 0, 1)
                for b in corr:
                    bw.write(b, 1)
                corr = []
                run = 0
            else:
                corr.append(a & 1)
        # corr is empty here: the k == last_new iteration flushed it
        if last_new < se:
            for k in range(last_new + 1, se + 1):
                if abs(int(zz[k])) >> (al + 1):
                    pending.append((abs(int(zz[k])) >> al) & 1)
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _jpeg_encode_progressive(
    planes, qtabs, samp, hufftabs, restart_interval: int = 0
) -> bytes:
    """Shared progressive (SOF2) encoder over 1 or 3 planes.

    Scan script (the libjpeg-style shape, exercising every
    progressive decode path): interleaved DC first at Al=1, DC
    refinement to Al=0, per-component AC bands 1-5 then 6-63 at
    Al=1, per-component AC refinement 1-63 to Al=0.
    ``restart_interval=N`` emits DRI and inserts RSTn boundaries in
    EVERY scan — every N MCUs in the interleaved DC scans, every N
    blocks in the non-interleaved AC scans (one block per MCU
    there), with the restart counter reset per scan (T.81 E.2.4)."""
    import struct

    import numpy as np

    ncomp = len(planes)
    qs = [np.array(q, dtype=np.int64).reshape(8, 8) for q in qtabs]
    grids = _jpeg_quantize_planes(planes, qs)
    nmx = grids[0].shape[1] // samp[0][0]
    nmy = grids[0].shape[0] // samp[0][1]
    for g, (hs, vs) in zip(grids, samp):
        if g.shape[0] != nmy * vs or g.shape[1] != nmx * hs:
            raise ValueError("fixture planes must fill whole MCUs")

    scans: list[bytes] = []

    def sos(comps_in_scan, ss, se, ah, al, body_bits) -> None:
        # DC tables: luma 0 / chroma 1 (Annex K); AC: the shared
        # progressive table 0 (see _JPEG_PROG_AC_BITS)
        hdr = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            td = 1 if (ci and ncomp == 3) else 0
            hdr += bytes([ci + 1, (td << 4) | 0])
        hdr += bytes([ss, se, (ah << 4) | al])
        scans.append(
            struct.pack(">HH", 0xFFDA, len(hdr) + 2) + hdr + body_bits
        )

    dc_codes = [hufftabs[(0, 1 if (ci and ncomp == 3) else 0)] for ci in range(ncomp)]
    ac_prog = _huff_codes(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)
    ac_codes = [ac_prog] * ncomp

    ri = restart_interval

    # scan 1: DC first, interleaved, Al=1 (diffs of dc >> 1, T.81 G.1.2.1:
    # the DC point transform is an ARITHMETIC shift, unlike AC)
    bw = _BitWriter()
    pred = [0] * ncomp
    n_mcu = rst = 0
    for my in range(nmy):
        for mx in range(nmx):
            if ri and n_mcu and n_mcu % ri == 0:
                bw.restart(rst % 8)
                rst += 1
                pred = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for v in range(vs):
                    for u in range(hs):
                        dc = int(grids[ci][my * vs + v, mx * hs + u, 0]) >> 1
                        size, bits = _magnitude_bits(dc - pred[ci])
                        code, ln = dc_codes[ci][size]
                        bw.write(code, ln)
                        if size:
                            bw.write(bits, size)
                        pred[ci] = dc
            n_mcu += 1
    sos(list(range(ncomp)), 0, 0, 0, 1, bw.flush())

    # scans 2..: AC bands per component at Al=1
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            bw = _BitWriter()
            blocks = grids[ci].reshape(-1, 64)
            _enc_ac_first(bw, blocks, ac_codes[ci], ss, se, 1, ri)
            sos([ci], ss, se, 0, 1, bw.flush())

    # DC refinement to Al=0: one raw bit per block, interleaved
    bw = _BitWriter()
    n_mcu = rst = 0
    for my in range(nmy):
        for mx in range(nmx):
            if ri and n_mcu and n_mcu % ri == 0:
                bw.restart(rst % 8)
                rst += 1
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for v in range(vs):
                    for u in range(hs):
                        bw.write(int(grids[ci][my * vs + v, mx * hs + u, 0]) & 1, 1)
            n_mcu += 1
    sos(list(range(ncomp)), 0, 0, 1, 0, bw.flush())

    # AC refinement per component to Al=0
    for ci in range(ncomp):
        bw = _BitWriter()
        blocks = grids[ci].reshape(-1, 64)
        _enc_ac_refine(bw, blocks, ac_codes[ci], 1, 63, 0, ri)
        sos([ci], 1, 63, 1, 0, bw.flush())

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    h, w = planes[0].shape  # luma plane is full-resolution
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = b"\x00" + bytes(_JPEG_QTABLE[i] for i in _ZIGZAG)
    if ncomp == 3:
        dqt += b"\x01" + bytes(_JPEG_QTABLE_C[i] for i in _ZIGZAG)
    out += seg(0xFFDB, dqt)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        t = 1 if (ci and ncomp == 3) else 0
        sof += bytes((ci + 1, (hs << 4) | vs, t))
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT
    dht = (
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_PROG_AC_BITS) + bytes(_JPEG_PROG_AC_VALS)
    )
    if ncomp == 3:
        dht += b"\x01" + bytes(_JPEG_DC_BITS_C) + bytes(_JPEG_DC_VALS_C)
    out += seg(0xFFC4, dht)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    for s in scans:
        out += s
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_progressive_gray(pix, restart_interval: int = 0) -> bytes:
    """Progressive (SOF2) encoding of an 8-bit grayscale raster with
    the full scan script — same quantized coefficients as
    :func:`jpeg_encode_gray`, different entropy delivery."""
    h, w = pix.shape
    if h % 8 or w % 8:
        raise ValueError("fixture rasters are multiples of 8")
    tabs = {(0, 0): _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)}
    return _jpeg_encode_progressive(
        [pix], [_JPEG_QTABLE], [(1, 1)], tabs, restart_interval
    )


def jpeg_encode_progressive_ycbcr(
    yp, cbp, crp, subsample: str = "420", restart_interval: int = 0
) -> bytes:
    """Progressive (SOF2) encoding of YCbCr planes (4:4:4 or 4:2:0),
    same plane contract as :func:`jpeg_encode_ycbcr`."""
    h, w = yp.shape
    if subsample == "444":
        if h % 8 or w % 8 or cbp.shape != (h, w) or crp.shape != (h, w):
            raise ValueError("4:4:4 fixture planes must be h x w, /8")
        samp = [(1, 1), (1, 1), (1, 1)]
    elif subsample == "420":
        if h % 16 or w % 16:
            raise ValueError("4:2:0 fixture rasters are multiples of 16")
        if cbp.shape != (h // 2, w // 2) or crp.shape != (h // 2, w // 2):
            raise ValueError("4:2:0 chroma planes must be (h/2) x (w/2)")
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unknown subsample mode {subsample!r}")
    tabs = {
        (0, 0): _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS),
        (0, 1): _huff_codes(_JPEG_DC_BITS_C, _JPEG_DC_VALS_C),
    }
    return _jpeg_encode_progressive(
        [yp, cbp, crp],
        [_JPEG_QTABLE, _JPEG_QTABLE_C, _JPEG_QTABLE_C],
        samp,
        tabs,
        restart_interval,
    )


def jpeg_decode_progressive(buf: bytes):
    """Decode a progressive (SOF2) JPEG to a uint8 RGB raster.

    Multi-scan marker walk (DQT/DHT may be redefined between scans),
    per-component zigzag coefficient accumulators, and the four T.81
    scan kinds: interleaved/non-interleaved DC first + refinement,
    AC first with EOBn runs, AC refinement with correction bits.
    Restart intervals are honored in every scan kind (DRI + RSTn:
    byte-align, verify the per-scan cycling marker index, reset DC
    predictors and terminate EOB runs at each boundary). After EOI
    the accumulated coefficients run the same dezigzag + dequant +
    IDCT + round-half-up + chroma upsample + fixed-point YCbCr->RGB
    pipeline as the baseline decoder. 1- or 3-component, 4:4:4 or
    4:2:0, 8-bit; everything else raises
    :class:`UnsupportedJpegError`."""
    import struct

    import numpy as np

    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (id, hs, vs, tq)
    grids = None  # per-component zigzag coefficient accumulators
    dri = 0  # restart interval in MCUs (DRI; 0 = no restarts)
    preds = None
    dims: list[tuple[int, int]] = []  # true (bx, by) block dims per comp
    nmx = nmy = 0

    def read_symbol(br: _BitReader, tab: dict) -> int:
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.read_bit()
            ln += 1
            if (ln, code) in tab:
                return tab[(ln, code)]
            if ln > 16:
                raise ValueError("invalid Huffman stream")

    def skip_to_marker(p: int) -> int:
        while p + 1 < len(buf):
            if buf[p] == 0xFF and buf[p + 1] != 0x00:
                return p
            p += 1
        raise ValueError("truncated entropy-coded segment")

    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker sync lost")
        if pos + 1 >= len(buf):
            raise ValueError("truncated marker")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(buf):
            raise ValueError("truncated segment length")
        (ln,) = struct.unpack_from(">H", buf, pos)
        if ln < 2 or pos + ln > len(buf):
            raise ValueError("truncated marker segment")
        body = buf[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise UnsupportedJpegError("16-bit quant tables unsupported")
                if b + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                zz = list(body[b + 1 : b + 65])
                tab = [0] * 64
                for i, idx in enumerate(_ZIGZAG):
                    tab[idx] = zz[i]
                qtables[tq] = tab
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                if b + 17 + n > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[b + 17 : b + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, vals)
                b += 17 + n
        elif marker == 0xC2:  # SOF2 progressive
            if len(body) < 6:
                raise ValueError("truncated SOF2 segment")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3):
                raise UnsupportedJpegError(
                    "only 8-bit 1- or 3-component supported"
                )
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated SOF2 component specs")
            for c in range(nc):
                cid = body[6 + 3 * c]
                hs, vs = body[7 + 3 * c] >> 4, body[7 + 3 * c] & 0x0F
                comps.append((cid, hs, vs, body[8 + 3 * c]))
            samps = [(hs, vs) for _, hs, vs, _ in comps]
            if nc == 1:
                if samps != [(1, 1)]:
                    raise UnsupportedJpegError("subsampling unsupported")
            elif samps not in (
                [(1, 1), (1, 1), (1, 1)],
                [(2, 2), (1, 1), (1, 1)],
            ):
                raise UnsupportedJpegError(
                    "only 4:4:4 and 4:2:0 sampling supported"
                )
            hmax = max(hs for _, hs, _, _ in comps)
            vmax = max(vs for _, _, vs, _ in comps)
            nmx = (w + 8 * hmax - 1) // (8 * hmax)
            nmy = (h + 8 * vmax - 1) // (8 * vmax)
            grids = []
            preds = [0] * nc
            for _, hs, vs, _ in comps:
                grids.append(
                    np.zeros((nmy * vs, nmx * hs, 64), dtype=np.int64)
                )
                cw = (w * hs + hmax - 1) // hmax
                ch = (h * vs + vmax - 1) // vmax
                dims.append(((cw + 7) // 8, (ch + 7) // 8))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg_decode_progressive expects SOF2 (use jpeg_decode_rgb "
                "for baseline)"
            )
        elif marker == 0xDD:  # DRI: restart every N MCUs (0 = off)
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS: decode one scan
            if grids is None:
                raise ValueError("SOS before SOF2")
            if len(body) < 1:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS segment")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if not (0 <= ss <= se <= 63):
                raise ValueError("invalid spectral band")
            scomps = []  # (component index, dc tab, ac tab)
            cids = [c[0] for c in comps]
            for c in range(ns):
                cs = body[1 + 2 * c]
                if cs not in cids:
                    raise ValueError("SOS selects unknown component")
                ci = cids.index(cs)
                td, ta = body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F
                dct = htables.get((0, td))
                act = htables.get((1, ta))
                if ss == 0 and ah == 0 and dct is None:
                    raise ValueError("DC scan references a missing table")
                if ss > 0 and act is None:
                    raise ValueError("AC scan references a missing table")
                scomps.append((ci, dct, act))
            if ns > 1 and ss != 0:
                raise ValueError("interleaved AC scan is illegal")
            if ss == 0 and se != 0:
                raise UnsupportedJpegError("mixed DC+AC band unsupported")
            br = _BitReader(buf, pos + ln)
            eobrun = 0
            p1 = 1 << al
            if ss == 0:
                # DC scan: interleaved MCU order (ns>1, T.81 A.2.3)
                # or the component's own block raster (ns==1)
                # a restart boundary falls every dri MCUs (an MCU is
                # one block in a non-interleaved scan); the restart
                # counter resets per scan (T.81 E.2.4)
                tab_of = {ci: dct for ci, dct, _ in scomps}
                n_rst = 0

                def dc_block(ci: int, by: int, bx: int) -> None:
                    if ah == 0:
                        size = read_symbol(br, tab_of[ci])
                        if size > 11:
                            raise ValueError("invalid DC size category")
                        preds[ci] += _extend(br.read_bits(size), size)
                        grids[ci][by, bx, 0] = preds[ci] << al
                    else:
                        if br.read_bit():
                            grids[ci][by, bx, 0] |= p1

                if ns > 1:
                    n_mcu = 0
                    for my in range(nmy):
                        for mx in range(nmx):
                            if dri and n_mcu and n_mcu % dri == 0:
                                br.sync_restart(n_rst % 8)
                                n_rst += 1
                                for i in range(len(preds)):
                                    preds[i] = 0
                            for ci, _, _ in scomps:
                                hs, vs = comps[ci][1], comps[ci][2]
                                for v in range(vs):
                                    for u in range(hs):
                                        dc_block(ci, my * vs + v, mx * hs + u)
                            n_mcu += 1
                else:
                    ci = scomps[0][0]
                    bxd, byd = dims[ci]
                    n_mcu = 0
                    for by in range(byd):
                        for bx in range(bxd):
                            if dri and n_mcu and n_mcu % dri == 0:
                                br.sync_restart(n_rst % 8)
                                n_rst += 1
                                preds[ci] = 0
                            dc_block(ci, by, bx)
                            n_mcu += 1
            else:
                # AC scan: always one component, block raster order
                ci, _, act = scomps[0]
                bxd, byd = dims[ci]
                n_blk = 0
                n_rst = 0
                for by in range(byd):
                    for bx in range(bxd):
                        if dri and n_blk and n_blk % dri == 0:
                            # encoder flushed the EOB run before the
                            # marker; a dangling run here means the
                            # stream violated E.2.4 — reset hard
                            br.sync_restart(n_rst % 8)
                            n_rst += 1
                            eobrun = 0
                        n_blk += 1
                        zz = grids[ci][by, bx]
                        if ah == 0:
                            if eobrun > 0:
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                rs = read_symbol(br, act)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r != 15:
                                        eobrun = (1 << r) - 1
                                        if r:
                                            eobrun += br.read_bits(r)
                                        break
                                    k += 16
                                else:
                                    k += r
                                    if k > se:
                                        raise ValueError("AC run past band end")
                                    zz[k] = _extend(br.read_bits(s), s) << al
                                    k += 1
                        else:
                            # refinement: T.81 G.2 / libjpeg
                            # decode_mcu_AC_refine control flow
                            k = ss
                            if eobrun == 0:
                                while k <= se:
                                    rs = read_symbol(br, act)
                                    r, s = rs >> 4, rs & 0x0F
                                    newval = 0
                                    if s == 0:
                                        if r != 15:
                                            eobrun = 1 << r
                                            if r:
                                                eobrun += br.read_bits(r)
                                            break
                                    elif s == 1:
                                        newval = p1 if br.read_bit() else -p1
                                    else:
                                        raise ValueError(
                                            "invalid refinement symbol"
                                        )
                                    while k <= se:
                                        c = int(zz[k])
                                        if c != 0:
                                            if br.read_bit() and not (
                                                abs(c) & p1
                                            ):
                                                zz[k] = c + (
                                                    p1 if c > 0 else -p1
                                                )
                                        else:
                                            if r == 0:
                                                break
                                            r -= 1
                                        k += 1
                                    if newval and k <= se:
                                        zz[k] = newval
                                    k += 1
                            if eobrun > 0:
                                while k <= se:
                                    c = int(zz[k])
                                    if c != 0:
                                        if br.read_bit() and not (abs(c) & p1):
                                            zz[k] = c + (p1 if c > 0 else -p1)
                                    k += 1
                                eobrun -= 1
            pos = skip_to_marker(br.pos)
            continue
        pos += ln

    if grids is None or h is None:
        raise ValueError("no SOF2 frame decoded")

    # reconstruction: identical pipeline to the baseline decoders
    C = _dct_matrix()
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError("SOF2 references a missing quant table")
        q = np.array(qtables[tq], dtype=np.float64).reshape(8, 8)
        byd, bxd = grids[ci].shape[0], grids[ci].shape[1]
        plane = np.zeros((byd * 8, bxd * 8), dtype=np.uint8)
        for by in range(byd):
            for bx in range(bxd):
                coef = np.zeros(64, dtype=np.float64)
                for i, idx in enumerate(_ZIGZAG):
                    coef[idx] = grids[ci][by, bx, i]
                blk = C.T @ (coef.reshape(8, 8) * q) @ C
                px = np.clip(np.floor(blk + 128.0 + 0.5 + 1e-9), 0, 255)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px.astype(
                    np.uint8
                )
        planes.append(plane)

    if len(comps) == 1:
        g = planes[0][:h, :w]
        return np.stack([g, g, g], axis=2)
    yp = planes[0][:h, :w]
    if comps[0][1] == 2:
        cb = planes[1].repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
        cr = planes[2].repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
    else:
        cb, cr = planes[1][:h, :w], planes[2][:h, :w]
    yi = yp.astype(np.int64)
    cx = cb.astype(np.int64) - 128
    cy = cr.astype(np.int64) - 128

    def fx(num):
        return (num + 32768 + _YCC_OFF) // 65536 - 512

    r = np.clip(yi + fx(_YCC_R_CR * cy), 0, 255)
    g = np.clip(yi + fx(-_YCC_G_CB * cx - _YCC_G_CR * cy), 0, 255)
    b = np.clip(yi + fx(_YCC_B_CB * cx), 0, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def _jpeg_color_value(kind: str, mx: int, my: int, doc_id: int) -> int:
    """Closed-form plane values the color-decode oracle mirrors:
    luma is flat per 8x8 block (same form as the grayscale fixture),
    chroma is flat per 16x16 MACROBLOCK — so the 4:2:0 chroma block
    and the four co-located 4:4:4 chroma blocks carry the same
    value, making the decoded RGB raster identical in both modes."""
    if kind == "y":
        return (mx * 37 + my * 59 + doc_id * 13) % 256
    if kind == "cb":
        return (mx * 31 + my * 17 + doc_id * 7) % 256
    return (mx * 13 + my * 41 + doc_id * 11) % 256


def jpeg_color_bytes(doc_id: int) -> bytes:
    """Deterministic COLOR JPEG: w=16*(1+id%3), h=16*(1+id%2); luma
    flat per 8x8 block, chroma flat per macroblock; chroma
    subsampling alternates per doc (even id//4 -> 4:2:0, odd ->
    4:4:4) so ONE query exercises both interleaved-MCU layouts while
    the oracle stays mode-independent (see _jpeg_color_value).
    Half the docs ((id//8) odd) additionally carry a DRI=2 restart
    layout (RSTn markers + predictor resets every 2 MCUs — the
    camera-firmware stream shape); restarts change the entropy
    framing, never the pixels, so the oracle is restart-independent
    too."""
    import numpy as np

    w, h = 16 * (1 + doc_id % 3), 16 * (1 + doc_id % 2)
    mode = "420" if (doc_id // 4) % 2 == 0 else "444"
    yp = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            yp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _jpeg_color_value("y", bx, by, doc_id)
            )
    cbm = np.zeros((h // 16, w // 16), dtype=np.uint8)
    crm = np.zeros((h // 16, w // 16), dtype=np.uint8)
    for my in range(h // 16):
        for mx in range(w // 16):
            cbm[my, mx] = _jpeg_color_value("cb", mx, my, doc_id)
            crm[my, mx] = _jpeg_color_value("cr", mx, my, doc_id)
    rep = 8 if mode == "420" else 16
    cb = cbm.repeat(rep, axis=0).repeat(rep, axis=1)
    cr = crm.repeat(rep, axis=0).repeat(rep, axis=1)
    rst = 2 if (doc_id // 8) % 2 == 1 else 0
    return jpeg_encode_ycbcr(yp, cb, cr, mode, restart_interval=rst)


def jpeg_progressive_bytes(doc_id: int) -> bytes:
    """Deterministic PROGRESSIVE color JPEG over the exact same
    closed-form planes as :func:`jpeg_color_bytes` (luma flat per
    block, chroma flat per macroblock, alternating 4:2:0/4:4:4) —
    the quantized coefficients are identical, only the entropy
    delivery differs (SOF2 multi-scan: spectral selection +
    successive approximation; half the docs, (id//8) odd, add DRI=2
    restart framing to every scan), so the color-decode oracle's
    pixel math carries over verbatim."""
    import numpy as np

    w, h = 16 * (1 + doc_id % 3), 16 * (1 + doc_id % 2)
    mode = "420" if (doc_id // 4) % 2 == 0 else "444"
    yp = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            yp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _jpeg_color_value("y", bx, by, doc_id)
            )
    cbm = np.zeros((h // 16, w // 16), dtype=np.uint8)
    crm = np.zeros((h // 16, w // 16), dtype=np.uint8)
    for my in range(h // 16):
        for mx in range(w // 16):
            cbm[my, mx] = _jpeg_color_value("cb", mx, my, doc_id)
            crm[my, mx] = _jpeg_color_value("cr", mx, my, doc_id)
    rep = 8 if mode == "420" else 16
    cb = cbm.repeat(rep, axis=0).repeat(rep, axis=1)
    cr = crm.repeat(rep, axis=0).repeat(rep, axis=1)
    rst = 2 if (doc_id // 8) % 2 == 1 else 0
    return jpeg_encode_progressive_ycbcr(yp, cb, cr, mode, restart_interval=rst)


def synthesize_jpeg_progressive(
    docs: DataFrame, every: int = 4, phase: int = 2
) -> DataFrame:
    """(doc_id, payload) of real progressive JPEGs for doc_id % every == phase."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"] if d % every == phase]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [jpeg_progressive_bytes(d) for d in ids],
                }
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return _spread_ids(docs, every, phase).mapInPandas(gen, schema)


JPEG_COLOR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("pos_checksum", LongType()),
    ]
)


def synthesize_jpeg_color(
    docs: DataFrame, every: int = 4, phase: int = 3
) -> DataFrame:
    """(doc_id, payload) of real color JPEGs for doc_id % every == phase."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"] if d % every == phase]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [jpeg_color_bytes(d) for d in ids]}
            )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return _spread_ids(docs, every, phase).mapInPandas(gen, schema)


def jpeg_color_decode_features(media: DataFrame) -> DataFrame:
    """REAL color decode: full 3-component baseline JPEG (interleaved
    Huffman + dequant + IDCT + chroma upsample + fixed-point
    YCbCr->RGB) per payload; exact integer channel sums and the
    position-weighted checksum over the DECODED RGB raster — wrong
    MCU interleave order, chroma table routing, upsample alignment,
    or RGB conversion constants all break the checksum."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in JPEG_COLOR_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rgb = jpeg_decode_rgb(bytes(payload))
                h, w, _ = rgb.shape
                weight = (
                    np.arange(h, dtype=np.int64)[:, None] * w
                    + np.arange(w, dtype=np.int64)[None, :]
                    + 1
                )
                chan_sum = rgb.sum(axis=2, dtype=np.int64)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(int(rgb[:, :, 0].sum(dtype=np.int64)))
                rows["sum_g"].append(int(rgb[:, :, 1].sum(dtype=np.int64)))
                rows["sum_b"].append(int(rgb[:, :, 2].sum(dtype=np.int64)))
                rows["pos_checksum"].append(int((weight * chan_sum).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(gen, JPEG_COLOR_SCHEMA)
