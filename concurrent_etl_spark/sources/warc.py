"""Minimal WARC (Web ARChive, ISO 28500 — public spec) writer/reader.

WARC is the container format of Common Crawl — the raw-input side of
every web-scale LLM corpus. The reference has no web-archive surface
at all (its closest read is pandas.read_csv delegation,
case_1/NormalETL.py:26); this adapter gives the engine a native,
distributed WARC ingest with the same shape as the other vendored
codecs (xlsx ECMA-376, Avro object-container): plain-bytes decode
behind ``binaryFile`` -> ``mapInPandas``, one decode task per
archive file, Arrow-batched output, memory bounded by the largest
single file.

Only the subset of WARC/1.0 needed for corpus ingest is implemented:
``response``-type records with named headers and an exact
``Content-Length`` payload. That is deliberately the same subset a
production WET/WARC text extractor touches; everything else in the
spec (continuation records, digests, truncation) is metadata this
pipeline would carry through as opaque headers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CRLF = b"\r\n"


def encode_warc_record(
    uri: str, date: str, payload: bytes, warc_type: str = "response"
) -> bytes:
    """One WARC/1.0 record. The record id is derived from the URI so
    archives are byte-deterministic (no RNG, no wall clock)."""
    rid = hashlib.md5(uri.encode()).hexdigest()
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">",
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: " + date.encode(),
        b"Content-Type: text/plain",
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return _CRLF.join(headers) + _CRLF * 2 + payload + _CRLF * 2


def write_warc(records: list[tuple[str, str, bytes]], path: str) -> None:
    """Write (uri, date, payload) records as one .warc file."""
    with open(path, "wb") as f:
        for uri, date, payload in records:
            f.write(encode_warc_record(uri, date, payload))


def parse_warc_bytes(blob: bytes) -> list[dict]:
    """Parse a WARC file's bytes into records.

    Returns dicts with ``target_uri``, ``warc_date``, ``warc_type``,
    ``content_length`` and ``payload``. Raises on a malformed length
    or a missing header terminator — a truncated archive must fail
    loudly, not yield silently-short payloads.
    """
    out: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = blob.find(_CRLF * 2, pos)
        if head_end < 0:
            raise ValueError("WARC: unterminated header block")
        head = blob[pos:head_end].decode("utf-8", errors="strict")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"WARC: bad version line {lines[:1]!r}")
        hdrs = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        clen = int(hdrs["content-length"])
        body_start = head_end + 4
        payload = blob[body_start : body_start + clen]
        if len(payload) != clen:
            raise ValueError("WARC: truncated payload")
        out.append(
            {
                "target_uri": hdrs.get("warc-target-uri"),
                "warc_date": hdrs.get("warc-date"),
                "warc_type": hdrs.get("warc-type"),
                "content_length": clen,
                "payload": payload,
            }
        )
        pos = body_start + clen
    return out


def read_warc_dir(
    spark: SparkSession, path_glob: str, out_schema: StructType
) -> DataFrame:
    """Read a directory of WARC files, distributed.

    binaryFile source -> one decode task per archive -> Arrow
    batches. ``out_schema``'s field names select the decoded columns
    (any of target_uri/warc_date/warc_type/content_length/payload).
    At 100 TB the parallel unit is the archive file — exactly how
    Common Crawl ships (segments of ~1 GB .warc files), so the scan
    scales with file count and no single task ever holds more than
    one archive.
    """
    cols = [f.name for f in out_schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                recs = parse_warc_bytes(bytes(row["content"]))
                yield pd.DataFrame(
                    {c: [r.get(c) for r in recs] for c in cols}
                )

    binary = (
        spark.read.format("binaryFile").load(path_glob).select("content")
    )
    return binary.mapInPandas(decode, out_schema)
