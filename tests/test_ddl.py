"""DDL/DML surface parity (SURVEY.md §3.4).

The reference's grammar covers SELECT/INSERT/CTAS/views/ANALYZE/EXPLAIN/
SHOW/USE/SET; Spark SQL implements these natively, so (per SURVEY.md §7.5)
the job here is tests, not code. Materialized views, transactions and
grants are documented gaps in SURVEY.md §3.4.
"""

from __future__ import annotations

import pytest

from sensql_presto_spark import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    catalog.register_views(spark, SF)
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_test")
    yield
    spark.sql("DROP DATABASE IF EXISTS ddl_test CASCADE")


def test_ctas_and_insert(spark):
    spark.sql("DROP TABLE IF EXISTS ddl_test.nation_copy")
    spark.sql(
        "CREATE TABLE ddl_test.nation_copy USING parquet AS "
        "SELECT * FROM nation WHERE n_regionkey = 0"
    )
    base = spark.sql("SELECT count(*) AS n FROM ddl_test.nation_copy").collect()[0].n
    spark.sql(
        "INSERT INTO ddl_test.nation_copy SELECT * FROM nation WHERE n_regionkey = 1"
    )
    after = spark.sql("SELECT count(*) AS n FROM ddl_test.nation_copy").collect()[0].n
    expected = (
        spark.sql("SELECT count(*) AS n FROM nation WHERE n_regionkey IN (0, 1)").collect()[0].n
    )
    assert after == expected and after > base


def test_insert_overwrite(spark):
    spark.sql("DROP TABLE IF EXISTS ddl_test.ow")
    spark.sql("CREATE TABLE ddl_test.ow USING parquet AS SELECT 1 AS x")
    spark.sql("INSERT OVERWRITE TABLE ddl_test.ow SELECT 2 AS x")
    assert [r.x for r in spark.sql("SELECT x FROM ddl_test.ow").collect()] == [2]


def test_create_view_and_query(spark):
    spark.sql("CREATE OR REPLACE TEMP VIEW nation_eu AS SELECT * FROM nation WHERE n_regionkey = 3")
    n = spark.sql("SELECT count(*) AS n FROM nation_eu").collect()[0].n
    e = spark.sql("SELECT count(*) AS n FROM nation WHERE n_regionkey = 3").collect()[0].n
    assert n == e


def test_analyze_table_stats_feed_cbo(spark):
    spark.sql("DROP TABLE IF EXISTS ddl_test.stats_t")
    spark.sql("CREATE TABLE ddl_test.stats_t USING parquet AS SELECT * FROM customer")
    spark.sql("ANALYZE TABLE ddl_test.stats_t COMPUTE STATISTICS FOR ALL COLUMNS")
    desc = spark.sql("DESCRIBE EXTENDED ddl_test.stats_t c_custkey").collect()
    info = {r.info_name: r.info_value for r in desc}
    assert info.get("distinct_count") not in (None, "NULL")


def test_explain_formats(spark):
    plan = spark.sql("EXPLAIN SELECT count(*) FROM nation").collect()[0].plan
    assert "AdaptiveSparkPlan" in plan or "HashAggregate" in plan
    ext = spark.sql("EXPLAIN EXTENDED SELECT 1").collect()[0].plan
    assert "Parsed Logical Plan" in ext


def test_show_surface(spark):
    tables = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert "nation" in tables  # temp views appear
    dbs = {r.namespace for r in spark.sql("SHOW DATABASES").collect()}
    assert "ddl_test" in dbs
    fns = spark.sql("SHOW FUNCTIONS LIKE 'xxhash64'").collect()
    assert len(fns) == 1
    cols = [r.col_name for r in spark.sql("SHOW COLUMNS IN nation").collect()]
    assert cols == ["n_nationkey", "n_name", "n_regionkey"]


def test_set_and_use(spark):
    spark.sql("SET spark.sql.shuffle.partitions=7")
    v = spark.sql("SET spark.sql.shuffle.partitions").collect()[0].value
    assert v == "7"
    spark.sql("SET spark.sql.shuffle.partitions=8")
    spark.sql("USE ddl_test")
    assert spark.catalog.currentDatabase() == "ddl_test"
    spark.sql("USE default")


def test_tablesample(spark):
    n = spark.sql("SELECT count(*) AS n FROM customer TABLESAMPLE (50 PERCENT)").collect()[0].n
    total = spark.sql("SELECT count(*) AS n FROM customer").collect()[0].n
    assert 0 < n < total


def test_delete_unsupported_on_parquet_documented(spark):
    # SURVEY.md §7 'what's hard': row-level DELETE needs Delta/Iceberg; on
    # plain parquet Spark raises — the gap is explicit, not silent.
    spark.sql("DROP TABLE IF EXISTS ddl_test.del_t")
    spark.sql("CREATE TABLE ddl_test.del_t USING parquet AS SELECT 1 AS x")
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        spark.sql("DELETE FROM ddl_test.del_t WHERE x = 1")
