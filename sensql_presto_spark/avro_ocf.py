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

Record schemas over those primitives plus the spec's complex types —
NESTED RECORDS, ARRAYS and MAPS (Avro spec "Complex Types": arrays/maps
are block-encoded — count-prefixed item runs, a negative count carries
a block byte size, a zero count terminates), ENUMS (zigzag symbol
index), FIXED (raw size bytes) and UNIONS (zigzag branch index + branch
value) — are supported, matching the reference decoder surface
(AvroColumnDecoder.java:105-110 ARRAY/MAP types, :126-140 locateNode
nested-record paths, :206 GenericEnumSymbol as VARCHAR, :213
GenericFixed as VARBINARY, null-union values surfacing as SQL NULL).
Unions are GENERAL multi-branch ``[A, B, ...]`` arrays (the spec's two
rules are enforced: no union immediately inside a union, no two
branches of the same type except named types with distinct names); the
decoder dispatches on the written branch index — the value-driven
posture of the reference (the avro reader resolves the branch before
``AvroColumnDecoder.serializeValue`` sees the value,
AvroColumnDecoder.java:160-216).  Nested record values surface as
Python dicts, arrays as lists, maps as dicts, enums as symbol strings,
fixed as bytes, a null branch as None.  The writer picks the first
branch whose type matches the Python value; ``Branch(index, value)``
tags a value with an explicit branch when first-match is not the
intent (e.g. the ``long`` arm of ``["int", "long"]``).
The codec is deterministic (fixed sync marker, canonical schema JSON,
insertion-ordered map entries) so written files are byte-stable across
runs.

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
        f"Avro type {typ!r} is outside the supported record surface "
        "(primitives + record/array/map; no unions/enums/fixed)"
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


# -- complex types (Avro spec "Complex Types") -------------------------------
#
# A field type is either a primitive name (str) or a JSON-shaped spec:
#   {"type": "record", "name": ..., "fields": [{"name":.., "type":..}]}
#   {"type": "array", "items": <type>}
#   {"type": "map", "values": <type>}
#   {"type": "enum", "name": ..., "symbols": [...]}  (spec: int index)
#   {"type": "fixed", "name": ..., "size": n}        (spec: n raw bytes)
#   [A, B, ...]  — a union (spec: unions are JSON arrays, encoded as
#   zigzag branch index + branch value; "null" is a legal branch)
# exactly the surface the reference's AvroColumnDecoder consumes beyond
# primitives: ARRAY/MAP columns (AvroColumnDecoder.java:105-110,
# :224-226), enum symbols read as VARCHAR (GenericEnumSymbol at
# getSlice, :206), fixed read as VARBINARY (GenericFixed, :213), and
# union values resolved by branch BEFORE the column decoder sees them
# (the value-driven serializeValue dispatch, :160-216 — a null branch
# surfaces as SQL NULL via the isNull check).  Spec union rules
# enforced: no union immediately inside a union; no duplicate branch
# type except named types with distinct names.  Python-side values:
# nested record = dict, array = list, map = dict (string keys), enum =
# symbol string, fixed = bytes of exactly `size`, union = None (null
# branch) or the branch value; the writer matches values to branches
# first-match-by-type, overridable with Branch(index, value).


class Branch:
    """Writer-side explicit union-branch tag.

    ``Branch(index, value)`` encodes ``value`` through branch ``index``
    of a union field, bypassing first-match-by-type selection — needed
    when two branches accept the same Python type (``["int", "long"]``,
    a string vs. an enum, ``bytes`` vs. a same-width ``fixed``).  The
    decoder never produces ``Branch``; it returns plain values (the
    reference's reader likewise resolves the branch away before the
    column decoder runs, AvroColumnDecoder.java:160-216).
    """

    __slots__ = ("index", "value")

    def __init__(self, index: int, value) -> None:
        self.index = index
        self.value = value

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Branch({self.index}, {self.value!r})"


def _union_branch_key(b):
    """Spec dedup key: unnamed types at most once per kind; named types
    (record/enum/fixed) distinguished by name."""
    if isinstance(b, str):
        return b
    kind = b.get("type")
    if kind in ("record", "enum", "fixed"):
        return (kind, b.get("name"))
    return kind


def _validate_type(t) -> None:
    if isinstance(t, str):
        if t not in _PRIMITIVES:
            raise NotImplementedError(f"Avro type {t!r} unsupported")
        return
    if isinstance(t, list):
        # spec "Unions": a union is a JSON array of branch schemas.
        # General multi-branch unions are supported (the reference's
        # avro reader resolves the branch before the column decoder
        # sees the value); the spec's two structural rules are
        # enforced as invalid-schema errors.
        if len(t) < 2:
            raise ValueError(f"Avro union needs at least two branches: {t!r}")
        seen: set = set()
        for b in t:
            if isinstance(b, list):
                # spec: unions may not immediately contain other unions
                raise ValueError(
                    f"Avro union may not immediately contain a union: {t!r}"
                )
            if b != "null":
                _validate_type(b)
            key = _union_branch_key(b)
            if key in seen:
                raise ValueError(
                    f"Avro union has two branches of the same type "
                    f"{key!r} (spec: only named types may repeat, and "
                    f"only under distinct names): {t!r}"
                )
            seen.add(key)
        return
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "record":
            for f in t.get("fields", []):
                _validate_type(f["type"])
            return
        if kind == "array":
            _validate_type(t["items"])
            return
        if kind == "map":
            _validate_type(t["values"])
            return
        if kind == "enum":
            symbols = t.get("symbols")
            if not t.get("name"):
                raise ValueError(f"enum needs a name (Avro named type): {t!r}")
            if not symbols or len(set(symbols)) != len(symbols):
                raise ValueError(f"enum needs distinct symbols: {t!r}")
            return
        if kind == "fixed":
            if not t.get("name"):
                raise ValueError(f"fixed needs a name (Avro named type): {t!r}")
            if not isinstance(t.get("size"), int) or t["size"] < 0:
                raise ValueError(f"fixed needs a non-negative size: {t!r}")
            return
    raise NotImplementedError(
        f"Avro type {t!r} is outside the supported record surface "
        "(primitives + record/array/map/enum/fixed + unions)"
    )


def _branch_matches(b, v) -> bool:
    """First-match-by-type writer-side branch selection (decode side is
    index-driven and never consults this)."""
    if b == "null":
        return v is None
    if v is None:
        return False
    if isinstance(b, str):
        if b == "boolean":
            return isinstance(v, bool)
        if b in ("int", "long"):
            return isinstance(v, int) and not isinstance(v, bool)
        if b in ("float", "double"):
            return isinstance(v, float)
        if b == "string":
            return isinstance(v, str)
        if b == "bytes":
            return isinstance(v, (bytes, bytearray))
        return False
    kind = b["type"]
    if kind == "enum":
        return isinstance(v, str) and v in b["symbols"]
    if kind == "fixed":
        return isinstance(v, (bytes, bytearray)) and len(v) == b["size"]
    if kind == "array":
        return isinstance(v, (list, tuple))
    if kind == "map":
        return isinstance(v, dict)
    if kind == "record":
        return isinstance(v, dict) and all(
            f["name"] in v for f in b["fields"]
        )
    return False


def _encode_any(t, v) -> bytes:
    if isinstance(t, str):
        if v is None:
            raise ValueError(
                "NULL inside an Avro value: the non-union schemas this codec "
                "writes have no null branch (spec: null requires a union)"
            )
        return _encode_value(t, v)
    if isinstance(t, list):  # union: branch index, then branch value
        if isinstance(v, Branch):
            idx, v = v.index, v.value
            if not 0 <= idx < len(t):
                raise ValueError(
                    f"explicit union branch index {idx} out of range for {t!r}"
                )
        else:
            idx = next(
                (i for i, b in enumerate(t) if _branch_matches(b, v)), None
            )
            if idx is None:
                raise ValueError(
                    f"no branch of Avro union {t!r} matches value {v!r}"
                )
        if t[idx] == "null":
            if v is not None:
                raise ValueError(
                    f"union branch {idx} of {t!r} is null but value is {v!r}"
                )
            return _zigzag_encode(idx)
        return _zigzag_encode(idx) + _encode_any(t[idx], v)
    kind = t["type"]
    if kind == "enum":
        symbols = t["symbols"]
        if v not in symbols:
            raise ValueError(f"value {v!r} is not an enum symbol of {t['name']}")
        return _zigzag_encode(symbols.index(v))
    if kind == "fixed":
        raw = bytes(v)
        if len(raw) != t["size"]:
            raise ValueError(
                f"fixed {t['name']} needs exactly {t['size']} bytes, got {len(raw)}"
            )
        return raw
    if kind == "record":
        out = bytearray()
        for f in t["fields"]:
            out += _encode_any(f["type"], v[f["name"]])
        return bytes(out)
    if kind == "array":
        items = list(v)
        out = bytearray()
        if items:
            out += _zigzag_encode(len(items))
            for item in items:
                out += _encode_any(t["items"], item)
        out += _zigzag_encode(0)  # zero count terminates the block run
        return bytes(out)
    if kind == "map":
        entries = list(v.items())
        out = bytearray()
        if entries:
            out += _zigzag_encode(len(entries))
            for k, val in entries:
                out += _encode_value("string", k)
                out += _encode_any(t["values"], val)
        out += _zigzag_encode(0)
        return bytes(out)
    raise NotImplementedError(f"Avro type {kind!r} unsupported")


def _decode_any(t, buf: bytes, pos: int):
    if isinstance(t, str):
        return _decode_value(t, buf, pos)
    if isinstance(t, list):  # union: written branch index drives dispatch
        idx, pos = _zigzag_decode(buf, pos)
        if not 0 <= idx < len(t):
            raise ValueError(f"union branch index {idx} out of range for {t!r}")
        if t[idx] == "null":
            return None, pos
        return _decode_any(t[idx], buf, pos)
    kind = t["type"]
    if kind == "enum":
        idx, pos = _zigzag_decode(buf, pos)
        symbols = t["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError(f"enum index {idx} out of range for {t['name']}")
        return symbols[idx], pos
    if kind == "fixed":
        n = t["size"]
        if pos + n > len(buf):
            # loud on truncation (ADVICE r11): a silent short slice would
            # advance pos past the end and defer the failure to the sync
            # check — or miss it entirely on a bare-buffer decode.
            raise ValueError(
                f"fixed {t['name']} needs {n} bytes but only "
                f"{len(buf) - pos} remain (truncated buffer)"
            )
        return bytes(buf[pos : pos + n]), pos + n
    if kind == "record":
        rec: dict = {}
        for f in t["fields"]:
            rec[f["name"]], pos = _decode_any(f["type"], buf, pos)
        return rec, pos
    if kind == "array":
        arr: list = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:  # spec: negative count precedes a block byte size
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(n):
                item, pos = _decode_any(t["items"], buf, pos)
                arr.append(item)
        return arr, pos
    if kind == "map":
        m: dict = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _ in range(n):
                k, pos = _decode_value("string", buf, pos)
                m[k], pos = _decode_any(t["values"], buf, pos)
        return m, pos
    raise NotImplementedError(f"Avro type {kind!r} unsupported")


# -- container files (Avro spec "Object Container Files") -------------------


def schema_json(name: str, fields: "list[tuple[str, object]]") -> str:
    for _, t in fields:
        _validate_type(t)
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        },
        separators=(",", ":"),
        sort_keys=False,
    )


def write_container(
    fields: "list[tuple[str, object]]",
    rows: Iterable[tuple],
    name: str = "row",
) -> bytes:
    """Serialize ``rows`` (tuples in field order) to one OCF byte string.

    Field types are primitive names or record/array/map specs (see
    ``_validate_type``); nested record cells are dicts, arrays lists,
    maps dicts.
    """
    body = bytearray()
    count = 0
    for row in rows:
        for (_, typ), v in zip(fields, row):
            body += _encode_any(typ, v)
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
        raise NotImplementedError("only record schemas are supported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    for _, t in fields:
        _validate_type(t)
    sync = buf[pos : pos + 16]
    pos += 16
    rows: list[tuple] = []
    while pos < len(buf):
        count, pos = _zigzag_decode(buf, pos)
        _, pos = _zigzag_decode(buf, pos)  # block byte size (unused: null codec)
        for _ in range(count):
            vals = []
            for _, typ in fields:
                v, pos = _decode_any(typ, buf, pos)
                vals.append(v)
            rows.append(tuple(vals))
        if buf[pos : pos + 16] != sync:
            raise ValueError("Avro block sync marker mismatch (corrupt file)")
        pos += 16
    return fields, rows
