"""Property tests for the vendored Avro object-container codec."""

from __future__ import annotations

import math
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from concurrent_etl_spark.sources.avro import (
    _dec_long,
    _enc_long,
    decode_avro_bytes,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "u", "type": ["null", "long"]},
    ],
}


class TestZigzagVarint:
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    @settings(max_examples=300, deadline=None)
    def test_roundtrip_any_int64(self, n):
        buf = _enc_long(n)
        back, pos = _dec_long(memoryview(buf), 0)
        assert back == n and pos == len(buf)

    def test_known_wire_values(self):
        # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
        assert _enc_long(0) == b"\x00"
        assert _enc_long(-1) == b"\x01"
        assert _enc_long(1) == b"\x02"
        assert _enc_long(-2) == b"\x03"
        assert _enc_long(2) == b"\x04"
        assert _enc_long(64) == b"\x80\x01"


rows_strategy = st.lists(
    st.fixed_dictionaries(
        {
            "k": st.integers(min_value=-(2**62), max_value=2**62),
            "s": st.text(max_size=40),
            "d": st.floats(allow_nan=False),
            "b": st.booleans(),
            "u": st.one_of(st.none(), st.integers(-(2**31), 2**31)),
        }
    ),
    max_size=40,
)


class TestContainerRoundtrip:
    @given(rows=rows_strategy, codec=st.sampled_from(["null", "deflate"]))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip(self, tmp_path_factory, rows, codec):
        path = str(tmp_path_factory.mktemp("avro") / "t.avro")
        write_avro(path, SCHEMA, rows, codec=codec, block_records=7)
        schema, back = decode_avro_bytes(open(path, "rb").read())
        assert schema == SCHEMA
        assert len(back) == len(rows)
        for want, got in zip(rows, back):
            assert got["k"] == want["k"]
            assert got["s"] == want["s"]
            assert got["b"] == want["b"]
            assert got["u"] == want["u"]
            if math.isnan(want["d"]):
                assert math.isnan(got["d"])
            else:
                assert got["d"] == want["d"]

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "bad.avro"
        p.write_bytes(b"PK\x03\x04 definitely not avro")
        with pytest.raises(ValueError, match="magic"):
            decode_avro_bytes(p.read_bytes())

    def test_corrupt_block_detected(self, tmp_path):
        p = str(tmp_path / "t.avro")
        write_avro(p, SCHEMA, [{"k": 1, "s": "x", "d": 0.0, "b": True,
                                "u": None}], codec="null")
        blob = bytearray(open(p, "rb").read())
        blob[-1] ^= 0xFF  # flip a sync-marker byte
        with pytest.raises(ValueError, match="sync"):
            decode_avro_bytes(bytes(blob))


class TestDistributedRead:
    def test_read_avro_dir_matches_written_rows(self, spark, tmp_path):
        from pyspark.sql.types import (
            BooleanType,
            LongType,
            StringType,
            StructField,
            StructType,
            DoubleType,
        )

        from concurrent_etl_spark.sources.avro import read_avro_dir

        rows_a = [
            {"k": i, "s": f"s{i}", "d": i / 4, "b": i % 2 == 0,
             "u": None if i % 3 == 0 else i * 10}
            for i in range(20)
        ]
        rows_b = [
            {"k": -i, "s": "", "d": -i / 8, "b": False, "u": i}
            for i in range(1, 10)
        ]
        write_avro(str(tmp_path / "a.avro"), SCHEMA, rows_a,
                   codec="deflate", block_records=6)
        write_avro(str(tmp_path / "b.avro"), SCHEMA, rows_b, codec="null")
        out_schema = StructType(
            [
                StructField("k", LongType()),
                StructField("s", StringType()),
                StructField("d", DoubleType()),
                StructField("b", BooleanType()),
                StructField("u", LongType()),
            ]
        )
        got = read_avro_dir(
            spark, str(tmp_path / "*.avro"), out_schema
        ).collect()
        want = {
            (r["k"], r["s"], r["d"], r["b"], r["u"])
            for r in rows_a + rows_b
        }
        assert {
            (r["k"], r["s"], r["d"], r["b"], r["u"]) for r in got
        } == want
