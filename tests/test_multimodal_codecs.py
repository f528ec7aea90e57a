"""Unit tests for the real (stdlib-only) multimodal codecs: RIFF/WAV
synth + wave-module decode, BMP synth + header-parsing decode."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from concurrent_etl_spark.operators.multimodal import (
    _bmp_pixel,
    bmp_bytes,
    bmp_decode_features,
    synthesize_bmp,
    synthesize_wav,
    wav_bytes,
    wav_decode_features,
)


class TestWavCodec:
    def test_wav_bytes_is_valid_riff(self):
        buf = wav_bytes(7)
        w = wave.open(io.BytesIO(buf), "rb")
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 200 + 7 % 801

    def test_decode_matches_formula(self, spark):
        docs = spark.range(0, 20).selectExpr("id AS doc_id")
        out = wav_decode_features(synthesize_wav(docs, every=5))
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {0, 5, 10, 15}
        for d, r in rows.items():
            n = 200 + d % 801
            samples = [((i * 37 + d * 11) % 2001) - 1000 for i in range(n)]
            assert r["n_frames"] == n
            assert r["sum_sq"] == sum(s * s for s in samples)
            assert r["pos_weighted_sum"] == sum(
                (i + 1) * s for i, s in enumerate(samples)
            )
            assert r["peak"] == max(abs(s) for s in samples)


class TestBmpCodec:
    def test_bmp_header_fields(self):
        buf = bmp_bytes(13)
        assert buf[:2] == b"BM"
        (offset,) = struct.unpack_from("<I", buf, 10)
        w, h = struct.unpack_from("<ii", buf, 18)
        (bpp,) = struct.unpack_from("<H", buf, 28)
        assert (offset, bpp) == (54, 24)
        assert (w, h) == (8 + 13 % 9, 4 + 13 % 5)
        stride = (3 * w + 3) // 4 * 4
        assert len(buf) == 54 + stride * h

    def test_decode_matches_formula(self, spark):
        docs = spark.range(0, 16).selectExpr("id AS doc_id")
        out = bmp_decode_features(synthesize_bmp(docs, every=4, phase=1))
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {1, 5, 9, 13}
        for d, r in rows.items():
            w, h = 8 + d % 9, 4 + d % 5
            px = [
                _bmp_pixel(x, y, d) for y in range(h) for x in range(w)
            ]
            assert (r["width"], r["height"]) == (w, h)
            assert r["sum_r"] == sum(p[0] for p in px)
            assert r["sum_g"] == sum(p[1] for p in px)
            assert r["sum_b"] == sum(p[2] for p in px)

    def test_decoder_rejects_non_bmp(self, spark):
        docs = spark.createDataFrame(
            [(1, bytearray(b"JUNKBYTES"))], "doc_id bigint, payload binary"
        )
        with pytest.raises(Exception):
            bmp_decode_features(docs).collect()
