"""Scale-pattern demonstrations: skew salting, partitioned writes, pruning.

These pin the two remaining 100 TB levers that don't appear in the query
registry: explicit salting for skewed join keys (what you reach for when
AQE's skew-join split isn't enough — e.g. one key is 50% of the fact
table), and partitionBy writes whose reads prune directories.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from sensql_presto_spark import catalog

SF = "/root/testdata/sf0.01"
SALT = 8


def _skewed_fact(spark):
    """lineitem with 90% of rows collapsed onto join key 0."""
    li = catalog.table(spark, SF, "lineitem")
    return li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.col("l_orderkey") % 97)
        .alias("k"),
        "l_extendedprice",
    )


def _dim(spark):
    return spark.range(0, 97).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )


def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)

    # Plain join (AQE skew-split handles moderate skew automatically).
    plain = (
        fact.join(dim, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )

    # Salted join: fact rows get a deterministic salt in [0, SALT); the dim
    # side is exploded SALT times so every (k, salt) bucket joins locally.
    # The hot key's rows now spread over SALT reducers instead of one.
    salted_fact = fact.withColumn("salt", F.pmod(F.xxhash64("l_extendedprice"), F.lit(SALT)))
    salted_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    ).withColumn("salt", F.col("salt").cast("long"))
    salted = (
        salted_fact.join(salted_dim, ["k", "salt"])
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )

    p = {r.k: (r.n, r.s) for r in plain.collect()}
    q = {r.k: (r.n, r.s) for r in salted.collect()}
    assert p == q and p[0][0] > sum(n for n, _ in p.values()) * 0.8


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = catalog.table(spark, SF, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)

    df = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # Partition filter must reach the scan as a PartitionFilters entry, and
    # the row count must match the unpartitioned filter.
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]
    expected = orders.where(F.col("o_orderstatus") == "F").count()
    assert df.count() == expected
