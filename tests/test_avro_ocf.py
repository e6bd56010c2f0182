"""Unit tests for the spec-derived Avro object-container codec
(``avro_ocf.py`` — reference parity target: presto-record-decoder's
AvroRowDecoderFactory flat-record surface).  The Spark-side roundtrip
entry ``source_avro_roundtrip`` is oracle-checked separately; these pin
the codec's binary format and its loud error contracts."""

from __future__ import annotations

import json

import pytest

from sensql_presto_spark import avro_ocf

FIELDS = [
    ("k", "long"),
    ("s", "string"),
    ("i", "int"),
    ("d", "double"),
    ("b", "boolean"),
    ("raw", "bytes"),
]
ROWS = [
    (0, "", 0, 0.0, False, b""),
    (-1, "héllo", -42, -1.5, True, b"\x00\xff"),
    (2**62, "x" * 300, 2**31 - 1, 6.02214076e23, False, bytes(range(64))),
    (-(2**62), "quote'inside", -(2**31), float("inf"), True, b"sync"),
]


def test_roundtrip_values_exact():
    blob = avro_ocf.write_container(FIELDS, ROWS, name="t")
    fields, rows = avro_ocf.read_container(blob)
    assert fields == FIELDS
    assert rows == ROWS


def test_container_layout_is_spec_shaped_and_deterministic():
    blob = avro_ocf.write_container(FIELDS, ROWS, name="t")
    assert blob[:4] == b"Obj\x01"
    # canonical schema JSON is embedded in the metadata map
    assert b'"type":"record"' in blob
    schema_start = blob.index(b'{"type":"record"')
    schema = json.loads(
        blob[schema_start : blob.index(b"}]}", schema_start) + 3]
    )
    assert [f["name"] for f in schema["fields"]] == [n for n, _ in FIELDS]
    # byte-stable across calls (fixed sync marker, sorted metadata)
    assert blob == avro_ocf.write_container(FIELDS, ROWS, name="t")
    # sync marker closes the header and every block
    assert blob.count(avro_ocf.SYNC) == 2


def test_zigzag_edge_values():
    for n in (0, -1, 1, 63, -64, 2**63 - 1, -(2**63)):
        enc = avro_ocf._zigzag_encode(n)
        dec, pos = avro_ocf._zigzag_decode(enc, 0)
        assert dec == n and pos == len(enc)


def test_empty_rowset_roundtrips():
    blob = avro_ocf.write_container(FIELDS, [], name="t")
    fields, rows = avro_ocf.read_container(blob)
    assert fields == FIELDS and rows == []


def test_unsupported_type_raises_loudly():
    with pytest.raises(NotImplementedError, match="record-decoder parity"):
        avro_ocf.write_container([("m", "map")], [({},)])
    with pytest.raises(NotImplementedError):
        avro_ocf.schema_json("t", [("u", "union")])


def test_bad_magic_and_corrupt_sync_raise():
    with pytest.raises(ValueError, match="magic"):
        avro_ocf.read_container(b"PAR1" + b"\x00" * 32)
    blob = bytearray(avro_ocf.write_container(FIELDS, ROWS, name="t"))
    blob[-1] ^= 0xFF  # corrupt the trailing block sync
    with pytest.raises(ValueError, match="sync"):
        avro_ocf.read_container(bytes(blob))


def test_unsupported_codec_raises():
    blob = avro_ocf.write_container([("k", "long")], [(1,)], name="t")
    patched = blob.replace(b"null", b"defl", 1)  # avro.codec value
    with pytest.raises(NotImplementedError, match="codec"):
        avro_ocf.read_container(patched)
