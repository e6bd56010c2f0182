"""HMAC UDFs vs Python's hmac reference implementation."""

from __future__ import annotations

import hashlib
import hmac

from pyspark.sql import functions as F

from sensql_presto_spark.functions.udfs import register_hmac_udfs


def test_hmac_sha256_matches_python(spark):
    register_hmac_udfs(spark)
    df = spark.createDataFrame(
        [("hello", "key1"), ("world", "key2")], ["data", "key"]
    ).select(
        "data",
        "key",
        F.expr("hmac_sha256(encode(data, 'UTF-8'), encode(key, 'UTF-8'))").alias("mac"),
    )
    for r in df.collect():
        expected = hmac.new(r.key.encode(), r.data.encode(), hashlib.sha256).digest()
        assert bytes(r.mac) == expected


def test_fnv_known_vectors(spark):
    from sensql_presto_spark.functions.udfs import register_hash_codec_udfs

    register_hash_codec_udfs(spark)
    row = spark.sql(
        "SELECT fnv1a_64(encode('hello', 'UTF-8')) AS h64a, "
        "fnv1_32(encode('hello', 'UTF-8')) AS h32, "
        "fnv1a_32(encode('', 'UTF-8')) AS h32e"
    ).collect()[0]
    # standard FNV test vectors (signed 64-bit view for the 64-bit variant)
    assert row.h64a == -6615550055289275125  # 0xa430d84680aabd0b
    assert row.h32 == 0xB6FA7167
    assert row.h32e == 0x811C9DC5


def test_ieee754_roundtrip(spark):
    from sensql_presto_spark.functions.udfs import register_hash_codec_udfs

    register_hash_codec_udfs(spark)
    row = spark.sql(
        "SELECT from_ieee754_64(to_ieee754_64(3.141592653589793)) AS d, "
        "hex(to_ieee754_64(1.0)) AS one_bits, "
        "abs(from_ieee754_32(to_ieee754_32(2.5)) - 2.5) < 1e-6 AS f_ok"
    ).collect()[0]
    assert row.d == 3.141592653589793
    assert row.one_bits == "3FF0000000000000"
    assert row.f_ok is True
