"""Avro Object Container File codec (pure Python, spec-derived).

The reference reads Avro through its record-decoder SPI
(presto-record-decoder/src/main/java/com/facebook/presto/decoder/avro/
AvroRowDecoderFactory.java); Spark's own ``avro`` datasource is an
EXTERNAL module (spark-avro) that is not deployed in this container, and
no Python Avro library is available either — so, like the PNG/AVI codecs
in ``multimodal.py``, the container format is implemented here directly
from the public specification (Apache Avro 1.11 spec, "Object Container
Files" + "Binary Encoding"):

* file = magic ``Obj\\x01`` + metadata map (``avro.schema`` JSON,
  ``avro.codec``) + 16-byte sync marker, then data blocks;
* block = record count (long) + byte size (long) + records + sync marker;
* primitives: int/long are zigzag varints, float/double little-endian
  IEEE, string/bytes length-prefixed, boolean one byte.

Only flat record schemas over those primitives are supported — exactly
the record-decoder surface the reference exposes for Kafka/Redis Avro
messages (nested/union decoding raises loudly).  The codec is
deterministic (fixed sync marker, canonical schema JSON) so written
files are byte-stable across runs.

Scale posture: the SINK writes one container file per Spark partition
(each task encodes only its own rows); the SOURCE decodes whole files
inside an Arrow ``mapInPandas`` pass over a ``binaryFile`` scan —
per-file parallelism, the unit Avro OCF guarantees splittable-safe
(finer intra-file splits would seek to the next sync marker, which a
cluster deployment of spark-avro does; per-file tasks are the honest
local equivalent and payloads never visit the driver).
"""

from __future__ import annotations

import json
import struct
from typing import Iterable

MAGIC = b"Obj\x01"
# Any 16 bytes are a spec-legal sync marker; a fixed one keeps output
# byte-stable (the spec only requires it be consistent within the file).
SYNC = bytes.fromhex("73656e73716c2d6176726f2d73796e63")  # 16 bytes

_PRIMITIVES = {"boolean", "int", "long", "float", "double", "string", "bytes"}


# -- binary encoding (Avro spec "Binary Encoding") --------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    n = (u >> 1) ^ -(u & 1)
    return n, pos


def _encode_value(typ: str, v) -> bytes:
    if typ in ("long", "int"):
        return _zigzag_encode(int(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(v)
        return _zigzag_encode(len(raw)) + raw
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    raise NotImplementedError(
        f"Avro type {typ!r} is outside the flat-primitive record surface "
        "(reference record-decoder parity; no unions/nesting)"
    )


def _decode_value(typ: str, buf: bytes, pos: int):
    if typ in ("long", "int"):
        return _zigzag_decode(buf, pos)
    if typ in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    raise NotImplementedError(f"Avro type {typ!r} unsupported")


# -- container files (Avro spec "Object Container Files") -------------------


def schema_json(name: str, fields: list[tuple[str, str]]) -> str:
    for _, t in fields:
        if t not in _PRIMITIVES:
            raise NotImplementedError(f"Avro type {t!r} unsupported")
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        },
        separators=(",", ":"),
    )


def write_container(
    fields: list[tuple[str, str]],
    rows: Iterable[tuple],
    name: str = "row",
) -> bytes:
    """Serialize ``rows`` (tuples in field order) to one OCF byte string."""
    body = bytearray()
    count = 0
    for row in rows:
        for (_, typ), v in zip(fields, row):
            body += _encode_value(typ, v)
        count += 1
    meta = {
        "avro.schema": schema_json(name, fields).encode(),
        "avro.codec": b"null",
    }
    out = bytearray(MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        out += _encode_value("string", k)
        out += _encode_value("bytes", v)
    out += _zigzag_encode(0)  # end of metadata map
    out += SYNC
    if count:
        out += _zigzag_encode(count)
        out += _zigzag_encode(len(body))
        out += body
        out += SYNC
    return bytes(out)


def read_container(buf: bytes) -> tuple[list[tuple[str, str]], list[tuple]]:
    """Parse one OCF byte string -> (fields, rows)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            n = -n
            _, pos = _zigzag_decode(buf, pos)
        for _ in range(n):
            k, pos = _decode_value("string", buf, pos)
            v, pos = _decode_value("bytes", buf, pos)
            meta[k] = v
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise NotImplementedError(f"Avro codec {codec!r} unsupported (null only)")
    schema = json.loads(meta["avro.schema"])
    if schema.get("type") != "record":
        raise NotImplementedError("only flat record schemas are supported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    for _, t in fields:
        if t not in _PRIMITIVES:
            raise NotImplementedError(f"Avro type {t!r} unsupported")
    sync = buf[pos : pos + 16]
    pos += 16
    rows: list[tuple] = []
    while pos < len(buf):
        count, pos = _zigzag_decode(buf, pos)
        _, pos = _zigzag_decode(buf, pos)  # block byte size (unused: null codec)
        for _ in range(count):
            vals = []
            for _, typ in fields:
                v, pos = _decode_value(typ, buf, pos)
                vals.append(v)
            rows.append(tuple(vals))
        if buf[pos : pos + 16] != sync:
            raise ValueError("Avro block sync marker mismatch (corrupt file)")
        pos += 16
    return fields, rows
