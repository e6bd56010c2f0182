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
    # a bare "map" string is not a type: complex types are dict specs
    # ({"type": "map", "values": ...}); unions/enums/fixed stay out
    with pytest.raises(NotImplementedError, match="record/array/map"):
        avro_ocf.write_container([("m", "map")], [({},)])
    with pytest.raises(NotImplementedError):
        avro_ocf.schema_json("t", [("u", "union")])
    with pytest.raises(ValueError, match="needs a name"):  # unnamed named-type
        avro_ocf.schema_json("t", [("e", {"type": "enum", "symbols": ["A"]})])
    with pytest.raises(NotImplementedError):  # nested unsupported leaf
        avro_ocf.schema_json("t", [("a", {"type": "array", "items": "fxd"})])


NESTED_FIELDS = [
    (
        "meta",
        {
            "type": "record",
            "name": "meta",
            "fields": [
                {"name": "id", "type": "long"},
                {
                    "name": "geo",
                    "type": {
                        "type": "record",
                        "name": "geo",
                        "fields": [{"name": "cc", "type": "string"}],
                    },
                },
            ],
        },
    ),
    ("tags", {"type": "array", "items": "string"}),
    ("props", {"type": "map", "values": "long"}),
    ("nested_arrays", {"type": "array", "items": {"type": "array", "items": "int"}}),
]
NESTED_ROWS = [
    ({"id": 7, "geo": {"cc": "US"}}, ["a", "b", ""], {"x": 1, "y": -2}, [[1, 2], []]),
    ({"id": -(2**60), "geo": {"cc": "fr"}}, [], {}, []),
    ({"id": 0, "geo": {"cc": "日本"}}, ["x" * 200], {"k" * 50: 2**62}, [[-1]]),
]


def test_nested_record_array_map_roundtrip():
    """Complex-type roundtrip (Avro spec 'Complex Types'): nested records
    two deep, arrays, maps, arrays-of-arrays — values and schema survive
    byte-exactly, and the container stays byte-stable across calls."""
    blob = avro_ocf.write_container(NESTED_FIELDS, NESTED_ROWS, name="event")
    fields, rows = avro_ocf.read_container(blob)
    assert fields == NESTED_FIELDS
    assert rows == NESTED_ROWS
    assert blob == avro_ocf.write_container(NESTED_FIELDS, NESTED_ROWS, name="event")


def test_negative_block_count_decodes():
    """Spec branch our writer never emits but readers must accept: a
    NEGATIVE item count precedes a block byte size (Avro spec 'Data
    Serialization', arrays/maps)."""
    t = {"type": "array", "items": "long"}
    body = (
        avro_ocf._zigzag_encode(-2)  # two items, size-prefixed block
        + avro_ocf._zigzag_encode(2)  # block byte size (2 one-byte longs)
        + avro_ocf._zigzag_encode(5)
        + avro_ocf._zigzag_encode(-5)
        + avro_ocf._zigzag_encode(0)  # terminator
    )
    vals, pos = avro_ocf._decode_any(t, body, 0)
    assert vals == [5, -5] and pos == len(body)
    m = {"type": "map", "values": "boolean"}
    mbody = (
        avro_ocf._zigzag_encode(-1)
        + avro_ocf._zigzag_encode(3)
        + avro_ocf._encode_value("string", "k")
        + b"\x01"
        + avro_ocf._zigzag_encode(0)
    )
    mvals, mpos = avro_ocf._decode_any(m, mbody, 0)
    assert mvals == {"k": True} and mpos == len(mbody)


def test_null_inside_nonunion_schema_raises():
    with pytest.raises(ValueError, match="union"):
        avro_ocf.write_container(
            [("tags", {"type": "array", "items": "string"})], [(["ok", None],)]
        )


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


ENUM_FIXED_UNION_FIELDS = [
    ("ev", {"type": "enum", "name": "ev", "symbols": ["click", "view", "buy"]}),
    ("fp", {"type": "fixed", "name": "fp8", "size": 8}),
    ("maybe", ["null", "double"]),
    ("maybe_arr", ["null", {"type": "array", "items": "long"}]),
]
ENUM_FIXED_UNION_ROWS = [
    ("click", b"\x01" * 8, 2.5, [1, 2]),
    ("buy", bytes(range(8)), None, None),
    ("view", b"\x00" * 8, -0.5, []),
]


def test_enum_fixed_nullable_union_roundtrip():
    """Reference type-surface completion (AvroColumnDecoder.java:206
    GenericEnumSymbol, :213 GenericFixed, reader-resolved null unions):
    enum = zigzag symbol index, fixed = raw size bytes, ["null", X] =
    branch index + value; None round-trips through the null branch,
    including for a complex branch type."""
    blob = avro_ocf.write_container(
        ENUM_FIXED_UNION_FIELDS, ENUM_FIXED_UNION_ROWS, name="t"
    )
    fields, rows = avro_ocf.read_container(blob)
    assert fields == ENUM_FIXED_UNION_FIELDS
    assert rows == ENUM_FIXED_UNION_ROWS
    assert blob == avro_ocf.write_container(
        ENUM_FIXED_UNION_FIELDS, ENUM_FIXED_UNION_ROWS, name="t"
    )


def test_enum_fixed_union_error_contracts():
    # a value outside the enum's symbol set
    with pytest.raises(ValueError, match="enum symbol"):
        avro_ocf.write_container(
            [("e", {"type": "enum", "name": "e", "symbols": ["a"]})], [("b",)]
        )
    # duplicate symbols are an invalid schema
    with pytest.raises(ValueError, match="distinct symbols"):
        avro_ocf.schema_json(
            "t", [("e", {"type": "enum", "name": "e", "symbols": ["a", "a"]})]
        )
    # wrong-width fixed payload
    with pytest.raises(ValueError, match="exactly 4 bytes"):
        avro_ocf.write_container(
            [("f", {"type": "fixed", "name": "f", "size": 4})], [(b"abc",)]
        )
    # enum decode rejects an out-of-range symbol index
    t = {"type": "enum", "name": "e", "symbols": ["a", "b"]}
    with pytest.raises(ValueError, match="out of range"):
        avro_ocf._decode_any(t, avro_ocf._zigzag_encode(7), 0)
    # fixed decode is loud on a truncated buffer (never a short slice)
    f4 = {"type": "fixed", "name": "f4", "size": 4}
    with pytest.raises(ValueError, match="truncated"):
        avro_ocf._decode_any(f4, b"\x01\x02", 0)


MULTIBRANCH_FIELDS = [
    # numeric widening: same Python type on both arms -> Branch tags
    ("n", ["int", "long"]),
    # three-way with null + two string-shaped arms
    (
        "label",
        [
            "null",
            "string",
            {"type": "enum", "name": "kind", "symbols": ["a", "b"]},
        ],
    ),
    # bytes vs same-width fixed
    ("payload", ["null", "bytes", {"type": "fixed", "name": "h4", "size": 4}]),
]


def test_multibranch_union_roundtrip():
    """General [A, B, ...] unions (r11 VERDICT next-round #3): the writer
    encodes zigzag branch index + branch value — first-match-by-type, or
    an explicit Branch(index, value) tag where types collide — and the
    decoder dispatches on the WRITTEN index (the reference's avro reader
    resolves the branch before AvroColumnDecoder.serializeValue,
    AvroColumnDecoder.java:160-216).  Decoded values are plain (never
    Branch), and the blob is byte-stable."""
    B = avro_ocf.Branch
    rows = [
        (B(0, 7), "plain", b"\x01\x02\x03"),          # int arm, string arm, bytes arm
        (B(1, 7), B(2, "a"), B(2, b"\xde\xad\xbe\xef")),  # long, enum, fixed arms
        (5, None, None),                               # auto int (first match), null arms
    ]
    blob = avro_ocf.write_container(MULTIBRANCH_FIELDS, rows, name="t")
    fields, out = avro_ocf.read_container(blob)
    assert fields == MULTIBRANCH_FIELDS
    assert out == [
        (7, "plain", b"\x01\x02\x03"),
        (7, "a", b"\xde\xad\xbe\xef"),
        (5, None, None),
    ]
    assert blob == avro_ocf.write_container(MULTIBRANCH_FIELDS, rows, name="t")
    # the two 7s took DIFFERENT branches: re-encode row0 with the long
    # arm and the bytes differ (branch index is part of the encoding)
    a = avro_ocf._encode_any(["int", "long"], B(0, 7))
    b = avro_ocf._encode_any(["int", "long"], B(1, 7))
    assert a[:1] != b[:1] and a[1:] == b[1:]


def test_multibranch_union_error_contracts():
    B = avro_ocf.Branch
    # spec: no union directly inside a union (invalid schema, not a
    # missing feature -> ValueError since r12)
    with pytest.raises(ValueError, match="immediately contain"):
        avro_ocf.schema_json("t", [("u", ["null", ["null", "int"]])])
    # spec: duplicate branch types are invalid, except named types
    # under distinct names
    with pytest.raises(ValueError, match="same type"):
        avro_ocf.schema_json("t", [("u", ["int", "string", "int"])])
    with pytest.raises(ValueError, match="same type"):
        avro_ocf.schema_json(
            "t",
            [("u", [
                {"type": "fixed", "name": "f", "size": 2},
                {"type": "fixed", "name": "f", "size": 4},
            ])],
        )
    # ... two fixed under DIFFERENT names are legal
    avro_ocf.schema_json(
        "t",
        [("u", [
            {"type": "fixed", "name": "f2", "size": 2},
            {"type": "fixed", "name": "f4", "size": 4},
        ])],
    )
    # a single-branch "union" is invalid
    with pytest.raises(ValueError, match="two branches"):
        avro_ocf.schema_json("t", [("u", ["int"])])
    # no branch matches the value
    with pytest.raises(ValueError, match="no branch"):
        avro_ocf._encode_any(["int", "string"], 2.5)
    # explicit Branch index out of range
    with pytest.raises(ValueError, match="out of range"):
        avro_ocf._encode_any(["int", "string"], B(2, "x"))
    # explicit null branch with a non-null value
    with pytest.raises(ValueError, match="is null but value"):
        avro_ocf._encode_any(["null", "int"], B(0, 3))
    # decode rejects a branch index past the union's arity
    bad = avro_ocf._zigzag_encode(3) + avro_ocf._zigzag_encode(1)
    with pytest.raises(ValueError, match="out of range"):
        avro_ocf._decode_any(["null", "int"], bad, 0)
