"""Avro object-container source/sink — vendored zero-dependency codec.

Spark's Avro support lives in the EXTERNAL ``spark-avro`` module,
which this environment does not deploy (``format("avro")`` raises
"external data source module"). Avro is a documented public format
(Apache Avro spec, "Object Container Files"): a file is the magic
``Obj\\x01``, a file-metadata map carrying ``avro.schema`` (JSON) and
``avro.codec``, a random 16-byte sync marker, then data blocks of
``[record count, payload byte size, payload, sync marker]``; the
binary record encoding is zigzag-varint longs, length-prefixed UTF-8
strings, little-endian IEEE floats/doubles, one-byte booleans, and a
varint branch index for unions. That is small enough to vendor the
same way ``sources/excel.py`` vendors SpreadsheetML: the writer
manufactures genuine container files for fixtures, and the reader
runs distributed as binaryFile -> Arrow batches -> per-file decode in
executors (listing/scheduling/retries stay Spark's job; only byte
decode is Python — the identical architecture to the xlsx adapter).

Supported schema surface: flat records over ``null boolean int long
float double string bytes`` and two-branch ``["null", T]`` unions —
the staging shapes the engine's sources contract needs. Both codecs:
``null`` and ``deflate`` (raw RFC-1951 via stdlib zlib).

Reference parity: the reference has no Avro surface; this extends the
S-family source coverage (SURVEY §2.1) to the lake's other row
format.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive binary encoding
# ---------------------------------------------------------------------------

def _enc_long(n: int) -> bytes:
    """Zigzag + base-128 varint (little-endian, continuation bit)."""
    z = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1) | 1
    # the arithmetic form above is exact for arbitrary ints; mask to
    # the 64-bit wire domain the spec defines
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: memoryview, pos: int) -> tuple[int, int]:
    z = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _enc_value(v, typ) -> bytes:
    if isinstance(typ, list):  # ["null", T] union
        if v is None:
            return _enc_long(typ.index("null"))
        branch = 1 - typ.index("null")
        return _enc_long(branch) + _enc_value(v, typ[branch])
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return _enc_long(int(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _enc_long(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(v)
        return _enc_long(len(raw)) + raw
    raise ValueError(f"unsupported avro type: {typ!r}")


def _dec_value(buf: memoryview, pos: int, typ):
    if isinstance(typ, list):
        branch, pos = _dec_long(buf, pos)
        t = typ[branch]
        if t == "null":
            return None, pos
        return _dec_value(buf, pos, t)
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _dec_long(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "string":
        n, pos = _dec_long(buf, pos)
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = _dec_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type: {typ!r}")


# ---------------------------------------------------------------------------
# container file write / read
# ---------------------------------------------------------------------------

def write_avro(
    path: str,
    schema: dict,
    rows: list[dict],
    codec: str = "deflate",
    block_records: int = 1000,
) -> None:
    """Write one genuine Avro object-container file.

    ``schema`` is a record schema dict ({"type": "record", "name":
    ..., "fields": [{"name": n, "type": t}, ...]}). The sync marker
    is derived deterministically from the schema JSON so fixture
    builds are byte-reproducible.
    """
    import hashlib

    fields = schema["fields"]
    schema_json = json.dumps(schema, separators=(",", ":"))
    sync = hashlib.md5(("sync|" + schema_json).encode()).digest()

    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    out.write(_enc_long(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out.write(_enc_long(len(kb)) + kb)
        out.write(_enc_long(len(v)) + v)
    out.write(_enc_long(0))  # metadata map terminator
    out.write(sync)

    for i in range(0, len(rows), block_records):
        block = rows[i : i + block_records]
        payload = b"".join(
            b"".join(_enc_value(r.get(f["name"]), f["type"]) for f in fields)
            for r in block
        )
        if codec == "deflate":
            payload = zlib.compress(payload, 9)[2:-4]  # raw RFC-1951
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        out.write(_enc_long(len(block)))
        out.write(_enc_long(len(payload)))
        out.write(payload)
        out.write(sync)

    with open(path, "wb") as f:
        f.write(out.getvalue())


def decode_avro_bytes(blob: bytes) -> tuple[dict, list[dict]]:
    """Decode one container file: (schema dict, rows)."""
    buf = memoryview(blob)
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _dec_long(buf, pos)
        if count == 0:
            break
        if count < 0:  # spec: negative count prefixes a block byte size
            count = -count
            _, pos = _dec_long(buf, pos)
        for _ in range(count):
            n, pos = _dec_long(buf, pos)
            key = bytes(buf[pos : pos + n]).decode()
            pos += n
            n, pos = _dec_long(buf, pos)
            meta[key] = bytes(buf[pos : pos + n])
            pos += n
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = bytes(buf[pos : pos + 16])
    pos += 16

    fields = schema["fields"]
    rows: list[dict] = []
    total = len(buf)
    while pos < total:
        n_rec, pos = _dec_long(buf, pos)
        n_bytes, pos = _dec_long(buf, pos)
        payload = bytes(buf[pos : pos + n_bytes])
        pos += n_bytes
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        p = memoryview(payload)
        ppos = 0
        for _ in range(n_rec):
            rec = {}
            for f in fields:
                rec[f["name"]], ppos = _dec_value(p, ppos, f["type"])
            rows.append(rec)
    return schema, rows


def read_avro_dir(
    spark: SparkSession, path_glob: str, out_schema: StructType
) -> DataFrame:
    """Read a directory of Avro container files, distributed.

    binaryFile source -> one decode task per file -> Arrow batches.
    ``out_schema``'s field names select/order the decoded columns;
    files missing a field surface nulls (schema-on-read). Memory per
    task is bounded by the largest single file — the same contract
    as the xlsx adapter.
    """
    cols = [f.name for f in out_schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                _, rows = decode_avro_bytes(bytes(row["content"]))
                data = pd.DataFrame(
                    {c: [r.get(c) for r in rows] for c in cols}
                )
                yield data

    binary = (
        spark.read.format("binaryFile").load(path_glob).select("content")
    )
    return binary.mapInPandas(decode, out_schema)
