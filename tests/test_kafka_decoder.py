"""Kafka record-decoder parity (presto-record-decoder csv/json/raw).

Beyond the registry oracle (source_kafka_decoder), pin the pieces the
oracle can't see: the segment framing codec's roundtrip and torn-frame
errors, null-key framing, the raw decoder's sign extension and span
bounds, the loud FLOAT/DOUBLE contract, and the reference's null
semantics (CsvColumnDecoder.java:83 short rows, JsonRowDecoder.java:73
missing path nodes).
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


def test_raw_float_is_a_loud_contract(spark):
    with pytest.raises(NotImplementedError, match="IEEE-754"):
        kd.decode_raw(
            _kafka_df(spark, [b"\x00" * 8]),
            [kd.KafkaColumn("x", "DOUBLE", "0", "DOUBLE")],
        )


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
