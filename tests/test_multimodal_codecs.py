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

class TestPngCodec:
    def test_png_structure_and_crcs(self):
        import zlib

        from concurrent_etl_spark.operators.multimodal import png_bytes

        buf = png_bytes(999)  # large enough for a 2-chunk IDAT
        assert buf[:8] == b"\x89PNG\r\n\x1a\n"
        pos, tags = 8, []
        while pos < len(buf):
            (ln,) = struct.unpack_from(">I", buf, pos)
            tag = buf[pos + 4 : pos + 8]
            data = buf[pos + 8 : pos + 8 + ln]
            (crc,) = struct.unpack_from(">I", buf, pos + 8 + ln)
            assert zlib.crc32(tag + data) & 0xFFFFFFFF == crc
            tags.append(tag)
            pos += 12 + ln
        assert tags[0] == b"IHDR" and tags[-1] == b"IEND"
        assert tags.count(b"IDAT") == 2  # multi-chunk IDAT exercised

    def test_decode_matches_formula(self, spark):
        from concurrent_etl_spark.operators.multimodal import (
            _png_pixel,
            png_decode_features,
            synthesize_png,
        )

        docs = spark.range(0, 16).selectExpr("id AS doc_id")
        out = png_decode_features(synthesize_png(docs, every=4, phase=2))
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {2, 6, 10, 14}
        for d, r in rows.items():
            w, h = 6 + d % 11, 5 + d % 6
            px = [_png_pixel(x, y, d) for y in range(h) for x in range(w)]
            assert (r["width"], r["height"]) == (w, h)
            assert r["sum_r"] == sum(p[0] for p in px)
            assert r["sum_g"] == sum(p[1] for p in px)
            assert r["sum_b"] == sum(p[2] for p in px)
            assert r["pos_checksum"] == sum(
                (i + 1) * sum(p) for i, p in enumerate(px)
            )

    def test_decoder_rejects_corrupt_crc(self, spark):
        from concurrent_etl_spark.operators.multimodal import (
            png_bytes,
            png_decode_features,
        )

        buf = bytearray(png_bytes(3))
        buf[40] ^= 0xFF  # flip a byte inside IHDR data -> CRC mismatch
        docs = spark.createDataFrame(
            [(3, bytes(buf))], "doc_id bigint, payload binary"
        )
        with pytest.raises(Exception):
            png_decode_features(docs).collect()

class TestPngProperty:
    def test_random_rasters_roundtrip(self):
        """Any raster must survive encode -> decode exactly: the five
        filter inverses, CRC framing, and IDAT reassembly are all
        invertible. Pure-python path (no Spark) so hypothesis can run
        many cases."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from concurrent_etl_spark.operators.multimodal import (
            png_decode_stats,
            png_encode,
        )

        @settings(max_examples=60, deadline=None)
        @given(
            st.integers(1, 24),
            st.integers(1, 16),
            st.randoms(use_true_random=False),
        )
        def check(w, h, rng):
            raster = [
                bytes(rng.randrange(256) for _ in range(3 * w))
                for _ in range(h)
            ]
            dw, dh, sr, sg, sb, chk = png_decode_stats(
                png_encode(raster)
            )
            px = [
                raster[y][3 * x : 3 * x + 3]
                for y in range(h)
                for x in range(w)
            ]
            assert (dw, dh) == (w, h)
            assert sr == sum(p[0] for p in px)
            assert sg == sum(p[1] for p in px)
            assert sb == sum(p[2] for p in px)
            assert chk == sum(
                (i + 1) * sum(p) for i, p in enumerate(px)
            )

        check()

class TestY4mCodec:
    def test_header_and_frame_structure(self):
        from concurrent_etl_spark.operators.multimodal import y4m_bytes

        buf = y4m_bytes(7)
        header = buf[: buf.index(b"\n")].decode()
        assert header.startswith("YUV4MPEG2 ")
        assert "W6" in header and "H3" in header and "C444" in header
        assert buf.count(b"FRAME\n") == 2 + 7 % 4

    def test_decode_matches_formula(self, spark):
        from concurrent_etl_spark.operators.multimodal import (
            _y4m_sample,
            synthesize_y4m,
            y4m_frame_features,
        )

        docs = spark.range(0, 16).selectExpr("id AS doc_id")
        out = y4m_frame_features(synthesize_y4m(docs, every=4, phase=3))
        rows = [(r["doc_id"], r["frame_idx"], r) for r in out.collect()]
        assert {d for d, _, _ in rows} == {3, 7, 11, 15}
        for d, f, r in rows:
            w, h = 4 + d % 5, 2 + d % 3
            assert (r["width"], r["height"]) == (w, h)
            assert r["sum_y"] == sum(
                _y4m_sample(x, y, f, d, 0) for y in range(h) for x in range(w)
            )
            assert r["sum_v"] == sum(
                _y4m_sample(x, y, f, d, 2) for y in range(h) for x in range(w)
            )

    def test_decoder_rejects_truncated_stream(self, spark):
        from concurrent_etl_spark.operators.multimodal import (
            y4m_bytes,
            y4m_frame_features,
        )

        buf = y4m_bytes(3)[:-5]  # chop the final plane
        docs = spark.createDataFrame(
            [(3, buf)], "doc_id bigint, payload binary"
        )
        with pytest.raises(Exception):
            y4m_frame_features(docs).collect()

class TestMultiChannelWav:
    def test_stereo_payloads_analyze_channel_zero(self, spark):
        """The analysis operators must survive multi-channel WAVs:
        unpack all interleaved samples, stride to channel 0 (a mono
        assumption in the unpack crashes the whole Arrow batch)."""
        import io
        import struct
        import wave

        from concurrent_etl_spark.operators.multimodal import (
            wav_window_features,
            wav_zcr_features,
        )

        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        left = [((i * 37) % 2001) - 1000 for i in range(250)]
        w.writeframes(
            b"".join(struct.pack("<hh", s, 0) for s in left)
        )
        w.close()
        df = spark.createDataFrame(
            [(1, buf.getvalue())], "doc_id bigint, payload binary"
        )
        ww = wav_window_features(df).collect()
        assert sum(r["n_samples"] for r in ww) == 250
        assert sum(r["sum_sq"] for r in ww) == sum(s * s for s in left)
        zc = wav_zcr_features(df).collect()
        assert sum(r["n_samples"] for r in zc) == 250


class TestSobelEdges:
    def test_matches_pure_python_convolution(self, spark):
        from concurrent_etl_spark.operators.multimodal import (
            bmp_bytes,
            bmp_sobel_features,
            _bmp_pixel,
        )

        doc_id = 13  # 13 % 4 == 1: a real fixture member
        df = spark.createDataFrame(
            [(doc_id, bmp_bytes(doc_id))], "doc_id bigint, payload binary"
        )
        [row] = bmp_sobel_features(df).collect()
        w, h = 8 + doc_id % 9, 4 + doc_id % 5
        v = {
            (x, y): sum(_bmp_pixel(x, y, doc_id))
            for x in range(w)
            for y in range(h)
        }
        s = mx = ne = 0
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                gx = (
                    v[x + 1, y - 1] + 2 * v[x + 1, y] + v[x + 1, y + 1]
                    - v[x - 1, y - 1] - 2 * v[x - 1, y] - v[x - 1, y + 1]
                )
                gy = (
                    v[x - 1, y + 1] + 2 * v[x, y + 1] + v[x + 1, y + 1]
                    - v[x - 1, y - 1] - 2 * v[x, y - 1] - v[x + 1, y - 1]
                )
                m = abs(gx) + abs(gy)
                s += m
                mx = max(mx, m)
                ne += m >= 300
        assert (row["width"], row["height"]) == (w, h)
        assert row["sum_mag_l1"] == s
        assert row["max_mag_l1"] == mx
        assert row["n_edge_px"] == ne

    def test_flat_image_has_zero_gradient(self, spark):
        import struct

        from concurrent_etl_spark.operators.multimodal import (
            bmp_sobel_features,
        )

        # hand-build a flat 6x5 all-gray BMP: every Sobel response 0
        w, h = 6, 5
        stride = (3 * w + 3) // 4 * 4
        body = bytearray()
        for _ in range(h):
            body += bytes([128, 128, 128] * w) + b"\x00" * (stride - 3 * w)
        header = (
            b"BM"
            + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
            )
        )
        df = spark.createDataFrame(
            [(7, bytes(header + body))], "doc_id bigint, payload binary"
        )
        [row] = bmp_sobel_features(df).collect()
        assert row["sum_mag_l1"] == 0
        assert row["max_mag_l1"] == 0
        assert row["n_edge_px"] == 0


class TestJpegCodec:
    """The vendored baseline-JPEG codec (ITU-T T.81, JPEG section of
    operators/multimodal.py): the last compressed-image stub replaced
    by a real Huffman + dequant + IDCT decoder."""

    def test_marker_structure(self):
        from concurrent_etl_spark.operators.multimodal import jpeg_bytes

        buf = jpeg_bytes(4)
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        # JFIF APP0, DQT, SOF0, DHT, SOS all present in order
        for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in buf, marker

    def test_flat_blocks_decode_to_analytic_form(self):
        from concurrent_etl_spark.operators.multimodal import (
            _jpeg_block_value,
            jpeg_bytes,
            jpeg_decode_gray,
        )

        for doc_id in range(0, 80, 4):
            px = jpeg_decode_gray(jpeg_bytes(doc_id))
            w, h = 8 * (2 + doc_id % 5), 8 * (1 + doc_id % 4)
            assert px.shape == (h, w)
            for by in range(h // 8):
                for bx in range(w // 8):
                    v = _jpeg_block_value(bx, by, doc_id)
                    a = v - 128
                    exp = max(0, min(255, 128 + 2 * ((a + 1) // 2)))
                    assert (px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == exp).all()

    def test_ac_path_matches_independent_reconstruction(self):
        """Gradient rasters produce nonzero AC coefficients through
        every size category incl. ZRL; the decoder must reproduce the
        dequant+IDCT reconstruction computed independently in numpy
        from the encoder's exact quantized coefficients."""
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            _JPEG_QTABLE,
            _dct_matrix,
            jpeg_decode_gray,
            jpeg_encode_gray,
        )

        C = _dct_matrix()
        q = np.array(_JPEG_QTABLE, dtype=np.int64).reshape(8, 8)
        for d in range(5):
            pix = np.fromfunction(
                lambda y, x: (x * 3 + y * 5 + d * 7) % 256, (16, 24)
            ).astype(np.uint8)
            dec = jpeg_decode_gray(jpeg_encode_gray(pix))
            exp = np.zeros_like(pix)
            for by in range(2):
                for bx in range(3):
                    blk = pix[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ].astype(np.float64) - 128.0
                    coef = C @ blk @ C.T
                    ci = (
                        np.floor(np.abs(coef) + 0.5) * np.sign(coef)
                    ).astype(np.int64)
                    quant = (2 * ci + q) // (2 * q)
                    rec = C.T @ (quant * q).astype(np.float64) @ C
                    exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                        np.floor(rec + 128.5), 0, 255
                    ).astype(np.uint8)
            assert (dec == exp).all()
            # and the lossy error vs the SOURCE is bounded (sanity
            # that this is a faithful codec, not a coincidence)
            assert np.abs(dec.astype(int) - pix.astype(int)).max() <= 16

    def test_decoder_rejects_garbage_and_unsupported(self):
        import pytest as _pytest

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_bytes,
            jpeg_decode_gray,
        )

        with _pytest.raises(ValueError, match="SOI"):
            jpeg_decode_gray(b"not a jpeg")
        # flip SOF0 (FFC0) to progressive (FFC2): must reject loudly
        buf = bytearray(jpeg_bytes(0))
        i = bytes(buf).index(b"\xff\xc0")
        buf[i + 1] = 0xC2
        with _pytest.raises(ValueError, match="baseline"):
            jpeg_decode_gray(bytes(buf))

    def test_decode_image_hook_routes_jpeg_without_pil(self):
        from concurrent_etl_spark.operators.multimodal import (
            decode_image,
            jpeg_bytes,
            jpeg_decode_gray,
        )

        buf = jpeg_bytes(8)
        h, w, mode, raw = decode_image(buf)
        px = jpeg_decode_gray(buf)
        assert (h, w) == px.shape
        assert mode in ("L",)  # grayscale (PIL path may differ)
        assert raw == px.tobytes()

    def test_query_matches_oracle_at_sf0001(self, spark):
        """The driver's exact comparison (rowcount / columns /
        order-insensitive value hash) for the READY-TO-REGISTER
        jpeg query vs its closed-form DuckDB oracle — the r7
        registration is a two-line decoration away."""
        import sys
        from pathlib import Path

        import duckdb

        sys.path.insert(
            0, str(Path(__file__).resolve().parent.parent / "tools")
        )
        from check_oracle import TABLES, value_hash

        from concurrent_etl_spark.queries_llm3 import (
            JPEG_DECODE_ORACLE,
            q_image_jpeg_decode,
        )

        sf_dir = "/root/testdata/sf0.001"
        try:
            sdf = q_image_jpeg_decode(spark, sf_dir).toPandas()
        finally:
            spark.catalog.clearCache()
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        odf = con.sql(JPEG_DECODE_ORACLE).fetchdf()
        con.close()
        assert len(sdf) > 0
        assert sorted(sdf.columns) == sorted(odf.columns)
        assert len(sdf) == len(odf)
        assert value_hash(sdf) == value_hash(odf)

    def test_decoder_rejects_truncated_entropy_stream(self):
        import pytest as _pytest

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_bytes,
            jpeg_decode_gray,
        )

        buf = jpeg_bytes(12)
        # cut inside the entropy-coded segment (before EOI)
        with _pytest.raises(ValueError, match="truncated|marker"):
            jpeg_decode_gray(buf[: len(buf) - 10])

    def test_bitreader_truncation_after_ff_is_valueerror(self):
        """ADVICE r6: a stream ending immediately after a 0xFF byte
        must raise the uniform truncation ValueError, not IndexError."""
        import pytest as _pytest

        from concurrent_etl_spark.operators.multimodal import _BitReader

        with _pytest.raises(ValueError, match="truncated"):
            _BitReader(b"\xff", 0).read_bit()

    def test_malformed_segments_raise_valueerror_not_internal(self):
        """ADVICE r6: truncated segment lengths and missing DQT/DHT
        table ids surface as ValueError, never struct.error/KeyError."""
        import pytest as _pytest

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_bytes,
            jpeg_decode_gray,
        )

        # segment length field itself cut off
        with _pytest.raises(ValueError, match="truncated"):
            jpeg_decode_gray(b"\xff\xd8\xff\xdb\x00")
        # SOS arrives with no DHT segments seen -> missing-table check
        buf = bytearray(jpeg_bytes(0))
        while True:
            i = bytes(buf).find(b"\xff\xc4")
            if i < 0:
                break
            ln = int.from_bytes(buf[i + 2 : i + 4], "big")
            del buf[i : i + 2 + ln]
        with _pytest.raises(ValueError, match="missing Huffman"):
            jpeg_decode_gray(bytes(buf))

    def test_progressive_jpeg_routing(self):
        """ADVICE r6, rewritten twice as coverage grew (r7: color
        decoded; r8: progressive decoded). The grayscale fast path
        still rejects SOF2; jpeg_decode_rgb now DELEGATES it to the
        multi-scan progressive decoder; and a franken-stream whose
        SOF0 was relabeled SOF2 but whose single scan spans the full
        0..63 band (illegal in progressive) raises loudly instead of
        decoding garbage."""
        import pytest as _pytest

        from concurrent_etl_spark.operators.multimodal import (
            UnsupportedJpegError,
            jpeg_bytes,
            jpeg_decode_gray,
            jpeg_decode_rgb,
        )

        buf = bytearray(jpeg_bytes(3))
        i = bytes(buf).index(b"\xff\xc0")
        buf[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with _pytest.raises(UnsupportedJpegError, match="baseline"):
            jpeg_decode_gray(bytes(buf))
        with _pytest.raises(UnsupportedJpegError, match="band"):
            jpeg_decode_rgb(bytes(buf))  # delegates, then rejects Ss=0/Se=63


class TestJpegColorCodec:
    """3-component baseline JPEG (4:4:4 + 4:2:0) round trips."""

    def _planes(self, doc_id, mode):
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            _jpeg_color_value,
        )

        w, h = 16 * (1 + doc_id % 3), 16 * (1 + doc_id % 2)
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
        return (
            yp,
            cbm.repeat(rep, 0).repeat(rep, 1),
            crm.repeat(rep, 0).repeat(rep, 1),
        )

    def test_both_subsamplings_decode_identically(self):
        """Chroma constant per macroblock => the 4:2:0 and 4:4:4
        encodings of the same image decode to the SAME RGB raster —
        the interleave-layout invariance the oracle relies on."""
        from concurrent_etl_spark.operators.multimodal import (
            jpeg_decode_rgb,
            jpeg_encode_ycbcr,
        )

        for doc_id in (0, 1, 5, 17, 111):
            rasters = []
            for mode in ("444", "420"):
                yp, cb, cr = self._planes(doc_id, mode)
                rasters.append(
                    jpeg_decode_rgb(jpeg_encode_ycbcr(yp, cb, cr, mode))
                )
            assert rasters[0].shape == yp.shape + (3,)
            assert (rasters[0] == rasters[1]).all()

    def test_fixture_matches_integer_closed_form(self):
        """Decoded RGB equals the exact-integer closed form the
        DuckDB oracle evaluates (quantizer floors + fixed-point
        YCbCr->RGB), for every block of a mixed-mode doc sample."""
        from concurrent_etl_spark.operators.multimodal import (
            _jpeg_color_value,
            jpeg_color_bytes,
            jpeg_decode_rgb,
        )

        OFF = 512 * 65536

        def fx(n):
            return (n + 32768 + OFF) // 65536 - 512

        def crec(c):
            q = (16 * c + 2321) // 34 - 128
            return min(255, max(0, (17 * q + 1028) // 8))

        for doc_id in (3, 7, 11, 19, 110, 111):
            rgb = jpeg_decode_rgb(jpeg_color_bytes(doc_id))
            h, w, _ = rgb.shape
            assert (w, h) == (16 * (1 + doc_id % 3), 16 * (1 + doc_id % 2))
            for by in range(h // 8):
                for bx in range(w // 8):
                    yv = min(
                        255,
                        max(
                            0,
                            128
                            + 2
                            * (
                                (_jpeg_color_value("y", bx, by, doc_id) + 129)
                                // 2
                                - 128
                            ),
                        ),
                    )
                    cbv = crec(_jpeg_color_value("cb", bx // 2, by // 2, doc_id))
                    crv = crec(_jpeg_color_value("cr", bx // 2, by // 2, doc_id))
                    exp = (
                        min(255, max(0, yv + fx(91881 * (crv - 128)))),
                        min(
                            255,
                            max(
                                0,
                                yv
                                + fx(
                                    -22554 * (cbv - 128) - 46802 * (crv - 128)
                                ),
                            ),
                        ),
                        min(255, max(0, yv + fx(116130 * (cbv - 128)))),
                    )
                    block = rgb[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    got = tuple(int(block[0, 0, i]) for i in range(3))
                    assert got == exp, (doc_id, bx, by, got, exp)
                    for i in range(3):
                        assert (block[:, :, i] == got[i]).all()

    def test_gradient_color_roundtrip_vs_reference(self):
        """General AC path in color: a gradient YCbCr image (nonzero
        AC coefficients in all three components) decodes to the same
        raster as an independent numpy reconstruction of the
        quantized stream (forward DCT + quantize + dequant + IDCT +
        the same rounding + the same fixed-point RGB)."""
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            _dct_matrix,
            _JPEG_QTABLE,
            _JPEG_QTABLE_C,
            jpeg_decode_rgb,
            jpeg_encode_ycbcr,
        )

        rng_free = np.arange(32 * 32, dtype=np.uint8).reshape(32, 32)
        yp = ((rng_free * 7) % 256).astype(np.uint8)
        cb = ((rng_free // 3 + 40) % 256).astype(np.uint8)
        cr = ((rng_free[::-1, ::-1] // 2 + 90) % 256).astype(np.uint8)
        buf = jpeg_encode_ycbcr(yp, cb, cr, "444")
        got = jpeg_decode_rgb(buf)

        C = _dct_matrix()

        def recon(plane, qtab):
            q = np.array(qtab, dtype=np.int64).reshape(8, 8)
            out = np.zeros_like(plane)
            for by in range(plane.shape[0] // 8):
                for bx in range(plane.shape[1] // 8):
                    blk = plane[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ].astype(np.float64) - 128.0
                    coef = C @ blk @ C.T
                    ci = np.floor(np.abs(coef) + 0.5).astype(
                        np.int64
                    ) * np.sign(coef).astype(np.int64)
                    quant = (2 * ci + q) // (2 * q)
                    rec = C.T @ (quant * q).astype(np.float64) @ C
                    out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                        np.floor(rec + 128.5 + 1e-9), 0, 255
                    ).astype(np.uint8)
            return out

        ydec = recon(yp, _JPEG_QTABLE)
        cbdec = recon(cb, _JPEG_QTABLE_C)
        crdec = recon(cr, _JPEG_QTABLE_C)
        yi = ydec.astype(np.int64)
        cx = cbdec.astype(np.int64) - 128
        cy = crdec.astype(np.int64) - 128
        OFF = 512 * 65536

        def fx(n):
            return (n + 32768 + OFF) // 65536 - 512

        exp = np.stack(
            [
                np.clip(yi + fx(91881 * cy), 0, 255),
                np.clip(yi + fx(-22554 * cx - 46802 * cy), 0, 255),
                np.clip(yi + fx(116130 * cx), 0, 255),
            ],
            axis=2,
        ).astype(np.uint8)
        assert (got == exp).all()

    def test_decode_image_routes_color_without_pil(self):
        from concurrent_etl_spark.operators.multimodal import (
            _pil_available,
            decode_image,
            jpeg_color_bytes,
            jpeg_decode_rgb,
        )

        if _pil_available():
            return
        buf = jpeg_color_bytes(7)
        h, w, mode, raw = decode_image(buf)
        rgb = jpeg_decode_rgb(buf)
        assert (h, w, mode) == (rgb.shape[0], rgb.shape[1], "RGB")
        assert raw == rgb.tobytes()

    def test_color_error_surface(self):
        import pytest as _pytest

        from concurrent_etl_spark.operators.multimodal import (
            UnsupportedJpegError,
            jpeg_color_bytes,
            jpeg_decode_rgb,
        )

        with _pytest.raises(ValueError, match="SOI"):
            jpeg_decode_rgb(b"not a jpeg")
        buf = bytearray(jpeg_color_bytes(3))
        # truncate inside the entropy stream
        with _pytest.raises(ValueError, match="truncated"):
            jpeg_decode_rgb(bytes(buf[:-20]))
        # unsupported sampling: luma 2x1
        i = bytes(buf).index(b"\xff\xc0")
        sof_comp0_sampling = i + 2 + 2 + 6 + 1  # marker+len+prec/h/w/nc, id
        assert buf[sof_comp0_sampling] in (0x11, 0x22)
        buf[sof_comp0_sampling] = 0x21
        with _pytest.raises(UnsupportedJpegError, match="sampling"):
            jpeg_decode_rgb(bytes(buf))


class TestJpegProgressiveCodec:
    """Progressive (SOF2) JPEG: multi-scan entropy over the same
    quantized coefficients as baseline — so decode(progressive(x))
    must be BIT-IDENTICAL to decode(baseline(x)), which pins the
    whole scan-script surface (spectral selection, successive
    approximation, EOBn runs, AC refinement correction bits)
    against the already-oracle-verified baseline path."""

    def test_gray_random_rasters_match_baseline(self):
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_decode_gray,
            jpeg_decode_progressive,
            jpeg_encode_gray,
            jpeg_encode_progressive_gray,
        )

        rng = np.random.default_rng(17)
        for shape in [(8, 8), (16, 24), (40, 32)]:
            pix = rng.integers(0, 256, shape).astype(np.uint8)
            base = jpeg_decode_gray(jpeg_encode_gray(pix))
            prog = jpeg_decode_progressive(jpeg_encode_progressive_gray(pix))
            assert np.array_equal(np.stack([base] * 3, axis=2), prog)

    def test_flat_raster_exercises_long_eob_runs(self):
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_decode_gray,
            jpeg_decode_progressive,
            jpeg_encode_gray,
            jpeg_encode_progressive_gray,
        )

        # all-AC-zero blocks: every AC scan is one EOBn covering all
        # 48 blocks (the multi-block End-Of-Band run path)
        pix = np.full((48, 64), 131, dtype=np.uint8)
        base = jpeg_decode_gray(jpeg_encode_gray(pix))
        prog = jpeg_decode_progressive(jpeg_encode_progressive_gray(pix))
        assert np.array_equal(np.stack([base] * 3, axis=2), prog)

    def test_color_both_subsamplings_match_baseline(self):
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_decode_progressive,
            jpeg_decode_rgb,
            jpeg_encode_progressive_ycbcr,
            jpeg_encode_ycbcr,
        )

        rng = np.random.default_rng(23)
        for mode, csh in (("444", 1), ("420", 2)):
            h, w = 32, 48
            yp = rng.integers(0, 256, (h, w)).astype(np.uint8)
            cb = rng.integers(0, 256, (h // csh, w // csh)).astype(np.uint8)
            cr = rng.integers(0, 256, (h // csh, w // csh)).astype(np.uint8)
            base = jpeg_decode_rgb(jpeg_encode_ycbcr(yp, cb, cr, mode))
            prog = jpeg_decode_progressive(
                jpeg_encode_progressive_ycbcr(yp, cb, cr, mode)
            )
            assert np.array_equal(base, prog)

    def test_decode_rgb_delegates_sof2(self):
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_decode_progressive,
            jpeg_decode_rgb,
            jpeg_progressive_bytes,
        )

        buf = jpeg_progressive_bytes(6)
        assert b"\xff\xc2" in buf  # really SOF2
        assert np.array_equal(jpeg_decode_rgb(buf), jpeg_decode_progressive(buf))

    def test_fixture_matches_color_fixture_pixels(self):
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_color_bytes,
            jpeg_decode_progressive,
            jpeg_decode_rgb,
            jpeg_progressive_bytes,
        )

        # same planes, same quantized coefficients, different entropy
        # delivery => identical decoded pixels (what lets the query
        # reuse the color oracle's closed form)
        for doc_id in (0, 3, 5, 10):
            assert np.array_equal(
                jpeg_decode_rgb(jpeg_color_bytes(doc_id)),
                jpeg_decode_progressive(jpeg_progressive_bytes(doc_id)),
            )

    def test_decode_image_routes_progressive_without_pil(self):
        from concurrent_etl_spark.operators.multimodal import (
            _pil_available,
            decode_image,
            jpeg_decode_progressive,
            jpeg_progressive_bytes,
        )

        if _pil_available():
            return
        buf = jpeg_progressive_bytes(9)
        h, w, mode, raw = decode_image(buf)
        rgb = jpeg_decode_progressive(buf)
        assert (h, w, mode) == (rgb.shape[0], rgb.shape[1], "RGB")
        assert raw == rgb.tobytes()

    def test_error_surface(self):
        import pytest as _pytest

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_decode_progressive,
            jpeg_progressive_bytes,
        )

        with _pytest.raises(ValueError, match="SOI"):
            jpeg_decode_progressive(b"not a jpeg")
        buf = jpeg_progressive_bytes(2)
        with _pytest.raises(ValueError, match="truncated|Huffman|band"):
            jpeg_decode_progressive(buf[: len(buf) - 8])
        with _pytest.raises(ValueError, match="SOF2"):
            # a baseline stream is the WRONG input for this decoder
            from concurrent_etl_spark.operators.multimodal import jpeg_bytes

            jpeg_decode_progressive(jpeg_bytes(1))


class TestJpegRestartIntervals:
    """DRI/RSTn support in the general baseline decoder: restart
    markers change the entropy FRAMING (byte-aligned RSTn every N
    MCUs, DC predictors reset), never the pixels."""

    def test_roundtrip_matches_plain_both_modes(self):
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_decode_rgb,
            jpeg_encode_ycbcr,
        )

        rng = np.random.default_rng(29)
        for mode, csh, mcus in (("444", 1, 24), ("420", 2, 6)):
            h, w = 32, 48
            yp = rng.integers(0, 256, (h, w)).astype(np.uint8)
            cb = rng.integers(0, 256, (h // csh, w // csh)).astype(np.uint8)
            cr = rng.integers(0, 256, (h // csh, w // csh)).astype(np.uint8)
            plain = jpeg_decode_rgb(jpeg_encode_ycbcr(yp, cb, cr, mode))
            for rst in (1, 2, 3, 7):
                buf = jpeg_encode_ycbcr(
                    yp, cb, cr, mode, restart_interval=rst
                )
                if mcus > rst:  # at least one boundary falls inside
                    assert any(
                        bytes((0xFF, 0xD0 + i)) in buf for i in range(8)
                    )
                assert np.array_equal(plain, jpeg_decode_rgb(buf))

    def test_fixture_restart_docs_carry_markers(self):
        from concurrent_etl_spark.operators.multimodal import jpeg_color_bytes

        plain = jpeg_color_bytes(3)   # (3//8)%2 == 0
        rst = jpeg_color_bytes(11)    # (11//8)%2 == 1
        assert b"\xff\xdd" not in plain
        assert b"\xff\xdd" in rst

    def test_out_of_order_restart_is_valueerror(self):
        import numpy as np
        import pytest as _pytest

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_decode_rgb,
            jpeg_encode_ycbcr,
        )

        rng = np.random.default_rng(31)
        yp = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        cb = rng.integers(0, 256, (16, 24)).astype(np.uint8)
        cr = rng.integers(0, 256, (16, 24)).astype(np.uint8)
        buf = bytearray(
            jpeg_encode_ycbcr(yp, cb, cr, "420", restart_interval=2)
        )
        i = bytes(buf).index(b"\xff\xd0")
        buf[i + 1] = 0xD5  # wrong restart index -> lost-MCU data error
        with _pytest.raises(ValueError, match="restart"):
            jpeg_decode_rgb(bytes(buf))


class TestJpegProgressiveRestarts:
    """Restart intervals inside PROGRESSIVE scans: every scan kind
    (DC first/refine, AC first with EOBn, AC refine with buffered
    correction bits) byte-aligns at RSTn boundaries, resets its
    predictors / EOB run, and still reconstructs pixels bit-identical
    to the baseline encoding of the same raster."""

    def test_gray_and_color_match_baseline(self):
        import numpy as np

        from concurrent_etl_spark.operators.multimodal import (
            jpeg_decode_gray,
            jpeg_decode_progressive,
            jpeg_decode_rgb,
            jpeg_encode_gray,
            jpeg_encode_progressive_gray,
            jpeg_encode_progressive_ycbcr,
            jpeg_encode_ycbcr,
        )

        rng = np.random.default_rng(43)
        pix = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        base = jpeg_decode_gray(jpeg_encode_gray(pix))
        for rst in (1, 2, 5):
            buf = jpeg_encode_progressive_gray(pix, restart_interval=rst)
            assert b"\xff\xdd" in buf
            assert np.array_equal(
                np.stack([base] * 3, axis=2), jpeg_decode_progressive(buf)
            )
        for mode, csh in (("444", 1), ("420", 2)):
            h, w = 32, 48
            yp = rng.integers(0, 256, (h, w)).astype(np.uint8)
            cb = rng.integers(0, 256, (h // csh, w // csh)).astype(np.uint8)
            cr = rng.integers(0, 256, (h // csh, w // csh)).astype(np.uint8)
            b0 = jpeg_decode_rgb(jpeg_encode_ycbcr(yp, cb, cr, mode))
            for rst in (1, 3):
                prog = jpeg_decode_progressive(
                    jpeg_encode_progressive_ycbcr(
                        yp, cb, cr, mode, restart_interval=rst
                    )
                )
                assert np.array_equal(b0, prog)

    def test_fixture_restart_docs_carry_markers(self):
        from concurrent_etl_spark.operators.multimodal import (
            jpeg_progressive_bytes,
        )

        assert b"\xff\xdd" not in jpeg_progressive_bytes(2)   # (2//8)%2 == 0
        assert b"\xff\xdd" in jpeg_progressive_bytes(10)      # (10//8)%2 == 1
