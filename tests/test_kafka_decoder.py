"""Kafka record-decoder parity (presto-record-decoder csv/json/raw/avro).

Beyond the registry oracles (source_kafka_decoder, source_kafka_avro),
pin the pieces the oracles can't see: the segment framing codec's
roundtrip and torn-frame errors, null-key framing, the raw decoder's
sign extension and span bounds, bit-exact raw FLOAT/DOUBLE decode, the
avro decoder's one-record/extra-record/nested-path error contracts, and
the reference's null semantics (CsvColumnDecoder.java:83 short rows,
JsonRowDecoder.java:73 missing path nodes, AvroColumnDecoder.java:130
locateNode).
"""

from __future__ import annotations

import pytest

from sensql_presto_spark import kafka_decoder as kd


def test_segment_roundtrip_and_null_keys():
    msgs = [(b"k1", b"hello"), (None, b""), (b"", b"\x00\xff"), (None, b"tail")]
    assert kd.decode_segment(kd.encode_segment(msgs)) == msgs


@pytest.mark.parametrize(
    "blob",
    [
        b"\x00\x00\x00",  # torn key length
        b"\x00\x00\x00\x02k",  # key shorter than its length
        b"\xff\xff\xff\xff\x00\x00\x00\x09ab",  # value shorter than its length
        b"\xff\xff\xff\xfe\x00\x00\x00\x00",  # key length < -1
    ],
)
def test_segment_torn_frames_raise(blob):
    with pytest.raises(ValueError):
        kd.decode_segment(blob)


def _kafka_df(spark, values: "list[bytes]"):
    rows = [(None, v, "t", 0, i) for i, v in enumerate(values)]
    return spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    )


def test_raw_sign_extension_and_span_bounds(spark):
    import struct

    cols = [
        kd.KafkaColumn("a", "BIGINT", "0", "LONG"),
        kd.KafkaColumn("b", "BIGINT", "8:10", "SHORT"),
        kd.KafkaColumn("c", "BIGINT", "10", "INT"),
        kd.KafkaColumn("d", "BIGINT", "14", "BYTE"),
        kd.KafkaColumn("s", "STRING", "15"),
    ]
    v1 = struct.pack(">qhib", -2, -1, -(2**31), -128) + "héllo".encode()
    v2 = struct.pack(">qhib", 2**62, 32767, 7, 127) + b""
    v3 = struct.pack(">qh", 5, 5)  # too short for c/d/s
    out = {
        r.offset: r
        for r in kd.decode_raw(_kafka_df(spark, [v1, v2, v3]), cols).collect()
    }
    assert (out[0].a, out[0].b, out[0].c, out[0].d, out[0].s) == (
        -2, -1, -(2**31), -128, "héllo",
    )
    assert (out[1].a, out[1].b, out[1].c, out[1].d, out[1].s) == (
        2**62, 32767, 7, 127, "",
    )
    # spans past the end of the message decode to NULL, not garbage
    assert (out[2].a, out[2].b, out[2].c, out[2].d, out[2].s) == (5, 5, None, None, None)


def test_raw_float_double_decode_bit_exact(spark):
    """Raw FLOAT/DOUBLE fields (r10: closes the r9 loud-contract gap)
    decode big-endian IEEE bit-exactly, including negatives, subnormals
    and infinities; short spans decode NULL like the integer fields."""
    import math
    import struct

    cols = [
        kd.KafkaColumn("d", "DOUBLE", "0", "DOUBLE"),
        kd.KafkaColumn("f", "DOUBLE", "8:12", "FLOAT"),
    ]
    payloads = [
        struct.pack(">df", -1234.5678, 2.5),
        struct.pack(">df", 5e-324, float("inf")),  # min subnormal double
        struct.pack(">d", 1.0),  # too short for f
    ]
    out = {r.offset: r for r in kd.decode_raw(_kafka_df(spark, payloads), cols).collect()}
    assert out[0].d == -1234.5678 and out[0].f == 2.5
    assert out[1].d == 5e-324 and math.isinf(out[1].f)
    assert out[2].d == 1.0 and out[2].f is None
    # mapping span must match the IEEE width, as for the integer formats
    with pytest.raises(ValueError, match="does not match dataFormat"):
        kd.decode_raw(
            _kafka_df(spark, [b"\x00" * 8]),
            [kd.KafkaColumn("x", "DOUBLE", "0:6", "DOUBLE")],
        )


def _avro_msg(fields, row, name="event"):
    from sensql_presto_spark import avro_ocf

    return avro_ocf.write_container(fields, [row], name=name)


def test_avro_decode_types_missing_field_and_error_contracts(spark):
    """decode_avro: AvroRowDecoder parity — one-record container per
    message, typed primitive fields, locateNode NULL for a mapped field
    absent from the writer schema, and LOUD errors on zero records,
    extra records (AvroRowDecoder.java:56-70) and nested mapping paths
    (flat-record codec contract)."""
    from sensql_presto_spark import avro_ocf

    fields = [("a", "long"), ("s", "string"), ("x", "double"), ("b", "boolean")]
    msgs = [
        _avro_msg(fields, (7, "hi", 2.25, True)),
        _avro_msg(fields, (-3, "", -0.5, False)),
    ]
    cols = [
        kd.KafkaColumn("a", "BIGINT", "a"),
        kd.KafkaColumn("s", "STRING", "s"),
        kd.KafkaColumn("x", "DOUBLE", "x"),
        kd.KafkaColumn("b", "BOOLEAN", "b"),
        kd.KafkaColumn("nope", "STRING", "ghost"),  # absent field -> NULL
    ]
    out = {r.offset: r for r in kd.decode_avro(_kafka_df(spark, msgs), cols).collect()}
    assert (out[0].a, out[0].s, out[0].x, out[0].b, out[0].nope) == (7, "hi", 2.25, True, None)
    assert (out[1].a, out[1].s, out[1].x, out[1].b, out[1].nope) == (-3, "", -0.5, False, None)

    # zero records in the container -> loud error
    empty = avro_ocf.write_container(fields, [])
    with pytest.raises(Exception, match="[Nn]o avro record"):
        kd.decode_avro(_kafka_df(spark, [empty]), cols[:1]).collect()
    # a second record -> loud error
    two = avro_ocf.write_container(fields, [(1, "x", 0.0, True), (2, "y", 1.0, False)])
    with pytest.raises(Exception, match="extra avro record"):
        kd.decode_avro(_kafka_df(spark, [two]), cols[:1]).collect()
    # nested mapping path over a FLAT record: locateNode finds no 'meta'
    # node -> NULL (AvroColumnDecoder.java:126-140 null propagation),
    # and a path that keeps descending PAST a scalar leaf is likewise
    # NULL, never an error
    nested_nulls = kd.decode_avro(
        _kafka_df(spark, msgs),
        [
            kd.KafkaColumn("z", "BIGINT", "meta/id"),
            kd.KafkaColumn("w", "STRING", "s/deeper"),
        ],
    ).collect()
    assert all(r.z is None and r.w is None for r in nested_nulls)
    # type-mismatched mapping (string field declared BIGINT) raises at
    # the Arrow boundary — the analog of the reference's
    # DECODER_CONVERSION_NOT_SUPPORTED, never a silent coercion
    with pytest.raises(Exception, match="."):
        kd.decode_avro(
            _kafka_df(spark, msgs), [kd.KafkaColumn("x", "BIGINT", "s")]
        ).collect()


NESTED_FIELDS = [
    (
        "meta",
        {
            "type": "record",
            "name": "meta",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "user", "type": "int"},
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
    ("score", "double"),
]


def test_avro_nested_paths_and_array_map_columns(spark):
    """decode_avro over NESTED writer schemas (r10 VERDICT What's-missing
    #1): '/'-paths walk nested records one AND two levels deep
    (AvroColumnDecoder.java:126-140 locateNode), ARRAY/MAP column
    handles decode avro array/map fields into Spark ArrayType/MapType
    (:105-110, :224-226), and null propagation covers a missing leaf
    inside an existing nested record, a missing intermediate record,
    and a path descending past a scalar."""
    rows = [
        ({"id": 7, "user": 3, "geo": {"cc": "US"}}, ["a", "b"], {"x": 1, "y": -2}, 2.25),
        ({"id": -1, "user": 0, "geo": {"cc": ""}}, [], {}, -0.5),
    ]
    msgs = [_avro_msg(NESTED_FIELDS, r) for r in rows]
    cols = [
        kd.KafkaColumn("event_id", "BIGINT", "meta/id"),
        kd.KafkaColumn("user_id", "INT", "meta/user"),
        kd.KafkaColumn("cc", "STRING", "meta/geo/cc"),
        kd.KafkaColumn("tags", "ARRAY<STRING>", "tags"),
        kd.KafkaColumn("props", "MAP<STRING,BIGINT>", "props"),
        kd.KafkaColumn("score", "DOUBLE", "score"),
        kd.KafkaColumn("gone_leaf", "STRING", "meta/geo/region"),
        kd.KafkaColumn("gone_mid", "BIGINT", "nope/x"),
        kd.KafkaColumn("past_scalar", "STRING", "meta/id/deeper"),
    ]
    out = {r.event_id: r for r in kd.decode_avro(_kafka_df(spark, msgs), cols).collect()}
    r0, r1 = out[7], out[-1]
    assert (r0.user_id, r0.cc, r0.score) == (3, "US", 2.25)
    assert list(r0.tags) == ["a", "b"]
    assert dict(r0.props) == {"x": 1, "y": -2}
    assert (r1.user_id, r1.cc, r1.score) == (0, "", -0.5)
    assert list(r1.tags) == [] and dict(r1.props) == {}
    for r in (r0, r1):
        assert r.gone_leaf is None and r.gone_mid is None and r.past_scalar is None


def test_raw_bad_mapping_and_size_mismatch(spark):
    df = _kafka_df(spark, [b"\x00" * 8])
    with pytest.raises(ValueError, match="invalid raw mapping"):
        kd.decode_raw(df, [kd.KafkaColumn("x", "BIGINT", "a:b", "LONG")])
    with pytest.raises(ValueError, match="does not match dataFormat"):
        kd.decode_raw(df, [kd.KafkaColumn("x", "BIGINT", "0:3", "LONG")])


def test_csv_short_rows_null_fill_and_quotes(spark):
    cols = [
        kd.KafkaColumn("i", "BIGINT", "0"),
        kd.KafkaColumn("s", "STRING", "1"),
        kd.KafkaColumn("v", "BIGINT", "2"),
    ]
    values = [b'1,"a,b",3', b"2,plain", b"3,,9", b"4"]
    out = {r.i: r for r in kd.decode_csv(_kafka_df(spark, values), cols).collect()}
    assert (out[1].s, out[1].v) == ("a,b", 3)  # quoted comma survives
    assert (out[2].s, out[2].v) == ("plain", None)  # short row null-fills
    assert (out[3].s, out[3].v) == (None, 9)  # empty token -> NULL
    assert (out[4].s, out[4].v) == (None, None)


def test_json_drops_undecodable_and_nulls_missing_paths(spark):
    cols = [
        kd.KafkaColumn("i", "BIGINT", "a/b"),
        kd.KafkaColumn("m", "STRING", "a/missing/deep"),
        kd.KafkaColumn("t", "STRING", "top"),
    ]
    values = [
        b'{"a":{"b":41},"top":"x"}',
        b'{"a":{},"other":1}',
        b"not json at all",
        b'{"a":{"b":',
    ]
    rows = kd.decode_json(_kafka_df(spark, values), cols).collect()
    assert len(rows) == 2  # two undecodable messages dropped
    by_off = {r.offset: r for r in rows}
    assert (by_off[0].i, by_off[0].m, by_off[0].t) == (41, None, "x")
    assert (by_off[1].i, by_off[1].m, by_off[1].t) == (None, None, None)


def test_topic_dir_rejects_foreign_files(spark, tmp_path):
    (tmp_path / "partition=0.seg").write_bytes(
        kd.encode_segment([(b"k", b"v")])
    )
    df = kd.read_topic_dir(spark, str(tmp_path))
    rows = df.collect()
    assert [(bytes(r.key), bytes(r.value), r.partition, r.offset) for r in rows] == [
        (b"k", b"v", 0, 0)
    ]


def test_raw_inverted_varchar_span_rejected():
    """A VARCHAR raw mapping whose end precedes its start must raise at
    mapping-parse time (the integer path already validates span-vs-size;
    without this check every row silently decodes to '')."""
    import pytest

    from sensql_presto_spark.kafka_decoder import KafkaColumn, _raw_span

    with pytest.raises(ValueError, match="span end precedes start"):
        _raw_span(KafkaColumn("s", "STRING", "3:1"))
    # degenerate zero-length span stays legal (decodes to '')
    assert _raw_span(KafkaColumn("s", "STRING", "3:3")) == (3, 3)


def test_avro_enum_fixed_union_columns(spark):
    """decode_avro over enum/fixed/nullable-union writer schemas: enum
    symbols decode as STRING (AvroColumnDecoder.java:206), fixed as
    BINARY (:213), and null-union values as SQL NULL — completing the
    reference avro type surface."""
    fields = [
        ("ev", {"type": "enum", "name": "ev", "symbols": ["click", "view"]}),
        ("fp", {"type": "fixed", "name": "fp4", "size": 4}),
        ("maybe", ["null", "long"]),
    ]
    msgs = [
        _avro_msg(fields, ("click", b"\xde\xad\xbe\xef", 42)),
        _avro_msg(fields, ("view", b"\x00\x00\x00\x01", None)),
    ]
    cols = [
        kd.KafkaColumn("ev", "STRING", "ev"),
        kd.KafkaColumn("fp", "BINARY", "fp"),
        kd.KafkaColumn("maybe", "BIGINT", "maybe"),
    ]
    out = {r.offset: r for r in kd.decode_avro(_kafka_df(spark, msgs), cols).collect()}
    assert (out[0].ev, bytes(out[0].fp), out[0].maybe) == ("click", b"\xde\xad\xbe\xef", 42)
    assert (out[1].ev, bytes(out[1].fp), out[1].maybe) == ("view", b"\x00\x00\x00\x01", None)


def test_avro_multibranch_union_columns(spark):
    """General multi-branch unions (r11 VERDICT next-round #3): the
    decoder dispatches on the WRITTEN branch index; a branch value that
    matches the declared column type surfaces, a null branch is SQL
    NULL — AvroColumnDecoder.java:160-216 value-driven serializeValue
    semantics (the avro reader resolves the branch first)."""
    from sensql_presto_spark.avro_ocf import Branch as B

    fields = [
        ("n", ["int", "long"]),
        ("label", [
            "null",
            "string",
            {"type": "enum", "name": "kind", "symbols": ["click", "view"]},
        ]),
    ]
    msgs = [
        _avro_msg(fields, (B(0, 7), "plain")),           # int + string arms
        _avro_msg(fields, (B(1, 1 << 40), B(2, "view"))),  # long + enum arms
        _avro_msg(fields, (3, None)),                     # auto int + null arms
    ]
    cols = [
        kd.KafkaColumn("n", "BIGINT", "n"),
        kd.KafkaColumn("label", "STRING", "label"),
    ]
    out = {r.offset: r for r in kd.decode_avro(_kafka_df(spark, msgs), cols).collect()}
    assert (out[0].n, out[0].label) == (7, "plain")
    assert (out[1].n, out[1].label) == (1 << 40, "view")
    assert (out[2].n, out[2].label) == (3, None)


def test_avro_union_branch_column_type_mismatch_raises(spark):
    """A union branch that does NOT match the declared column type fails
    loudly naming the column — the reference's serializeValue would hit
    a ClassCastException on the same read (value-driven dispatch, never
    a silent NULL)."""
    import pytest

    fields = [("u", ["long", "string"])]
    msgs = [
        _avro_msg(fields, (5,)),
        _avro_msg(fields, ("oops",)),  # string arm under a BIGINT column
    ]
    cols = [kd.KafkaColumn("u", "BIGINT", "u")]
    with pytest.raises(Exception, match="does not match column 'u'"):
        kd.decode_avro(_kafka_df(spark, msgs), cols).collect()


def test_avro_spark_type_validates_collections():
    """ADVICE r11: ARRAY/MAP handles are validated against the scalar
    table (AvroColumnDecoder.isSupportedType) — nested collections and
    non-VARCHAR map keys are rejected instead of passed through."""
    import pytest

    from sensql_presto_spark.kafka_decoder import _avro_spark_type

    assert _avro_spark_type("ARRAY<STRING>") == "array<string>"
    assert _avro_spark_type("MAP<STRING,BIGINT>") == "map<string,long>"
    assert _avro_spark_type("MAP<VARCHAR, DOUBLE>") == "map<string,double>"
    with pytest.raises(ValueError, match="ARRAY element"):
        _avro_spark_type("ARRAY<ARRAY<INT>>")
    with pytest.raises(ValueError, match="MAP key"):
        _avro_spark_type("MAP<BIGINT,STRING>")
    with pytest.raises(ValueError, match="MAP value"):
        _avro_spark_type("MAP<STRING,MAP<STRING,INT>>")
    with pytest.raises(ValueError, match="malformed"):
        _avro_spark_type("MAP<STRING>")
