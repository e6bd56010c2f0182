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
