"""Bucketed co-located joins (SURVEY.md §4.2 grouped execution).

The reference co-locates joins via bucketed tables + lifespan-per-bucket
execution; Spark's equivalent is ``bucketBy`` writes — a join on the
bucket key then needs NO shuffle on either side. This is the 100 TB lever
for repeated fact-fact joins: pay the shuffle once at write time.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from sensql_presto_spark import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    catalog.register_views(spark, SF)
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS bkt.{tbl}_b")
        (
            spark.table(tbl)
            .write.format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"bkt.{tbl}_b")
        )
    yield
    spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.sql(
            """
            SELECT o.o_orderkey, count(*) AS n
            FROM bkt.orders_b o JOIN bkt.lineitem_b l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey
            """
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("Exchange")[0] if "Exchange" in plan else plan
        assert "SortMergeJoin" in join_section or "ShuffledHashJoin" in join_section, (
            "join must appear before any Exchange (bucketing removed the shuffle)"
        )
        # No exchange may feed the join inputs: both sides scan bucketed files.
        pre_join = plan.split("SortMergeJoin")[0].split("ShuffledHashJoin")[0]
        assert "Exchange" not in pre_join
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_unbucketed(spark, bucketed):
    a = spark.sql(
        "SELECT count(*) AS n FROM bkt.orders_b o JOIN bkt.lineitem_b l "
        "ON o.o_orderkey = l.l_orderkey"
    ).collect()[0].n
    catalog.register_views(spark, SF)
    e = spark.sql(
        "SELECT count(*) AS n FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey"
    ).collect()[0].n
    assert a == e
