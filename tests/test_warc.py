"""Byte-level tests for the vendored WARC codec (sources/warc.py):
roundtrip fidelity, adversarial payloads, and loud truncation."""

from __future__ import annotations

import pytest

from concurrent_etl_spark.sources.warc import (
    encode_warc_record,
    parse_warc_bytes,
    write_warc,
)


def test_roundtrip_multi_record(tmp_path):
    recs = [
        ("http://x/1", "2024-01-01T00:00:00Z", b"hello"),
        ("http://x/2", "2024-01-02T00:00:00Z", "héllo".encode()),
        ("http://x/3", "2024-01-03T00:00:00Z", b""),
    ]
    p = tmp_path / "a.warc"
    write_warc(recs, str(p))
    got = parse_warc_bytes(p.read_bytes())
    assert [(r["target_uri"], r["warc_date"], r["payload"]) for r in got] == recs
    assert [r["content_length"] for r in got] == [5, 6, 0]


def test_payload_containing_warc_markers_parses_by_length():
    """Content-Length framing, not delimiter scanning: a payload that
    embeds CRLFs, a header-terminator, and a fake record head must
    come back byte-exact and must not desync the record boundary."""
    evil = b"x\r\n\r\nWARC/1.0\r\nContent-Length: 99\r\n\r\ny"
    blob = encode_warc_record(
        "http://x/evil", "2024-01-01T00:00:00Z", evil
    ) + encode_warc_record("http://x/after", "2024-01-01T00:00:00Z", b"ok")
    got = parse_warc_bytes(blob)
    assert len(got) == 2
    assert got[0]["payload"] == evil
    assert got[1]["target_uri"] == "http://x/after"
    assert got[1]["payload"] == b"ok"


def test_truncated_payload_raises():
    blob = encode_warc_record("http://x/1", "2024-01-01T00:00:00Z", b"abcdef")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(blob[:-6])  # cut into the payload


def test_missing_header_terminator_raises():
    with pytest.raises(ValueError, match="unterminated"):
        parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n")


def test_record_id_is_deterministic():
    a = encode_warc_record("http://x/1", "2024-01-01T00:00:00Z", b"p")
    b = encode_warc_record("http://x/1", "2024-01-01T00:00:00Z", b"p")
    assert a == b
