"""Engine facade (presto-client/StatementClient role, SURVEY §3.3)."""

from __future__ import annotations

from sensql_presto_spark import Engine

SF = "/root/testdata/sf0.001"


def test_engine_sql_query_and_statements(spark):
    eng = Engine(sf_dir=SF, spark=spark)
    assert eng.sql("SELECT count(*) AS n FROM nation").collect()[0].n == 25
    # full statement layer reachable: PREPARE/EXECUTE + SHOW
    eng.sql("PREPARE eq FROM SELECT n_name FROM nation WHERE n_regionkey = ?")
    assert len(eng.sql("EXECUTE eq USING 2").collect()) == 5
    tables = {r[0] for r in eng.sql("SHOW TABLES").collect()}
    assert {"nation", "orders", "lineitem"} <= tables
    # registry access
    assert eng.query("tpch_q01").count() > 0


def test_engine_explain_modes(spark):
    eng = Engine(sf_dir=SF, spark=spark)
    plan = eng.explain("SELECT o_orderkey FROM orders WHERE o_orderkey = 1")
    assert "Physical Plan" in plan and "PushedFilters" in plan
    analyzed = eng.explain(
        "SELECT count(*) AS n FROM orders", analyze=True
    )
    assert analyzed.count() > 0  # one row per operator with runtime stats


def test_engine_context_manager_borrowed_session(spark):
    with Engine(sf_dir=SF, spark=spark) as eng:
        assert eng.sql("SELECT 1 AS x").collect()[0].x == 1
    # borrowed session must survive close()
    assert spark.sql("SELECT 2 AS y").collect()[0].y == 2
