"""Materialized views (SURVEY §3.4; CreateMaterializedViewTask.java)."""

from __future__ import annotations

import pytest

from sensql_presto_spark.statements import StatementSession

SF = "/root/testdata/sf0.001"


def _sess(spark):
    return StatementSession(spark, SF)


def test_create_select_refresh_drop(spark):
    sess = _sess(spark)
    sess.execute(
        "CREATE OR REPLACE MATERIALIZED VIEW mv_region_counts AS "
        "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey"
    )
    rows = sess.execute(
        "SELECT n_regionkey, n FROM mv_region_counts ORDER BY n_regionkey"
    ).collect()
    assert [(r.n_regionkey, r.n) for r in rows] == [(i, 5) for i in range(5)]

    sess.execute("REFRESH MATERIALIZED VIEW mv_region_counts")
    assert sess.matviews._versions("mv_region_counts") == [0, 1]
    # still serves the same (recomputed) contents
    assert sess.execute("SELECT count(*) AS c FROM mv_region_counts").collect()[0].c == 5

    sess.execute("DROP MATERIALIZED VIEW mv_region_counts")
    assert not sess.matviews.exists("mv_region_counts")


def test_query_scans_snapshot_not_base_query(spark):
    """The MV read path is a parquet scan of the storage table, not a
    re-execution of the defining aggregation (the MaterializedView rewrite
    contract)."""
    sess = _sess(spark)
    sess.execute(
        "CREATE OR REPLACE MATERIALIZED VIEW mv_scan_probe AS "
        "SELECT r_regionkey, r_name FROM region"
    )
    plan = sess.execute("SELECT * FROM mv_scan_probe")._jdf.queryExecution().executedPlan().toString()
    assert "matviews/mv_scan_probe" in plan
    assert "Aggregate" not in plan
    sess.execute("DROP MATERIALIZED VIEW mv_scan_probe")


def test_create_without_replace_conflicts(spark):
    sess = _sess(spark)
    sess.execute("CREATE OR REPLACE MATERIALIZED VIEW mv_dup AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="already exists"):
        sess.execute("CREATE MATERIALIZED VIEW mv_dup AS SELECT 2 AS y")
    sess.execute("DROP MATERIALIZED VIEW mv_dup")


def test_mv_survives_new_statement_session(spark):
    """Persisted MVs re-attach in a fresh session (register_all)."""
    s1 = _sess(spark)
    s1.execute(
        "CREATE OR REPLACE MATERIALIZED VIEW mv_persist AS "
        "SELECT count(*) AS n FROM nation"
    )
    s2 = _sess(spark)
    assert s2.execute("SELECT n FROM mv_persist").collect()[0].n == 25
    s2.execute("DROP MATERIALIZED VIEW mv_persist")


def test_refresh_unknown_raises(spark):
    with pytest.raises(ValueError, match="not found"):
        _sess(spark).execute("REFRESH MATERIALIZED VIEW mv_nope")


def test_create_mv_cannot_shadow_base_table(spark):
    """Reference CreateMaterializedViewTask.java:81-84 — ANY existing table
    with the name conflicts, not just another MV."""
    sess = _sess(spark)
    with pytest.raises(ValueError, match="base table"):
        sess.execute("CREATE MATERIALIZED VIEW nation AS SELECT 1 AS x")
    # base table still queryable afterwards
    assert sess.execute("SELECT count(*) AS n FROM nation").collect()[0].n == 25


def test_create_or_replace_is_atomic_on_failure(spark):
    """A failing defining query must leave the previous MV intact."""
    sess = _sess(spark)
    sess.execute("CREATE OR REPLACE MATERIALIZED VIEW mv_atomic AS SELECT 41 AS x")
    with pytest.raises(Exception):
        sess.execute(
            "CREATE OR REPLACE MATERIALIZED VIEW mv_atomic AS SELECT no_such_col FROM nation"
        )
    # old contents and definition survive the failed replace
    assert sess.execute("SELECT x FROM mv_atomic").collect()[0].x == 41
    sess.execute("REFRESH MATERIALIZED VIEW mv_atomic")
    assert sess.execute("SELECT x FROM mv_atomic").collect()[0].x == 41
    sess.execute("DROP MATERIALIZED VIEW mv_atomic")


def test_create_or_replace_success_swaps_contents(spark):
    sess = _sess(spark)
    sess.execute("CREATE OR REPLACE MATERIALIZED VIEW mv_swap AS SELECT 1 AS x")
    sess.execute("CREATE OR REPLACE MATERIALIZED VIEW mv_swap AS SELECT 2 AS x")
    assert sess.execute("SELECT x FROM mv_swap").collect()[0].x == 2
    sess.execute("DROP MATERIALIZED VIEW mv_swap")


def test_kill_mid_replace_leaves_old_mv_readable(spark):
    """Crash-mid-replace simulation: a partial (_SUCCESS-less) snapshot dir
    and a torn definition tmp file — the debris a kill between write start
    and commit leaves — must neither hide the committed version nor break
    the next replace (CreateMaterializedViewTask's storage-table swap is
    atomic in the reference)."""
    import os
    import shutil

    sess = _sess(spark)
    sess.execute("CREATE OR REPLACE MATERIALIZED VIEW mv_kill AS SELECT 7 AS x")
    mv_dir = os.path.join("spark-warehouse/matviews", "mv_kill")
    committed = [e for e in os.listdir(mv_dir) if e.startswith("v=")]
    assert len(committed) == 1
    v = int(committed[0][2:])
    # simulate a killed replace: partial next version without _SUCCESS,
    # plus a torn definition tmp
    partial = os.path.join(mv_dir, f"v={v + 1}")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as f:
        f.write(b"garbage")
    with open(os.path.join(mv_dir, "definition.json.tmp"), "w") as f:
        f.write('{"sql": "SELECT broke')
    # old MV still reads the committed snapshot
    assert sess.execute("SELECT x FROM mv_kill").collect()[0].x == 7
    # a subsequent replace commits cleanly past the debris and retires it
    sess.execute("CREATE OR REPLACE MATERIALIZED VIEW mv_kill AS SELECT 8 AS x")
    assert sess.execute("SELECT x FROM mv_kill").collect()[0].x == 8
    left = [e for e in os.listdir(mv_dir) if e.startswith("v=")]
    assert len(left) == 1 and int(left[0][2:]) > v + 1
    sess.execute("DROP MATERIALIZED VIEW mv_kill")
    shutil.rmtree(mv_dir, ignore_errors=True)


def test_scoped_refresh_where_predicate(spark):
    """REFRESH MATERIALIZED VIEW ... WHERE <pred> (SqlBase.g4:71) only
    recomputes the predicate slice: rows outside the predicate keep their
    pre-refresh contents even when the base data changed everywhere."""
    sess = _sess(spark)
    spark.sql("DROP TABLE IF EXISTS t_mv_base")
    spark.sql(
        "CREATE TABLE t_mv_base AS "
        "SELECT n_nationkey AS k, n_regionkey AS r, n_name AS v FROM nation"
    )
    sess.execute(
        "CREATE OR REPLACE MATERIALIZED VIEW mv_scoped AS "
        "SELECT k, r, v FROM t_mv_base"
    )
    # base changes EVERYWHERE...
    spark.sql("DROP TABLE t_mv_base")
    spark.sql(
        "CREATE TABLE t_mv_base AS "
        "SELECT n_nationkey AS k, n_regionkey AS r, concat(n_name, '_NEW') AS v FROM nation"
    )
    # ...but only region 1 is refreshed
    sess.execute("REFRESH MATERIALIZED VIEW mv_scoped WHERE r = 1")
    rows = {row.k: row.v for row in sess.execute("SELECT k, r, v FROM mv_scoped").collect()}
    fresh = {row.n_nationkey: row.n_name for row in spark.sql(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey = 1").collect()}
    stale = {row.n_nationkey: row.n_name for row in spark.sql(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey <> 1").collect()}
    assert len(rows) == 25
    for k, v in fresh.items():
        assert rows[k] == v + "_NEW", "predicate slice must be recomputed"
    for k, v in stale.items():
        assert rows[k] == v, "rows outside the predicate must carry over unchanged"
    # full refresh catches everything up
    sess.execute("REFRESH MATERIALIZED VIEW mv_scoped")
    rows = {row.k: row.v for row in sess.execute("SELECT k, v FROM mv_scoped").collect()}
    assert all(v.endswith("_NEW") for v in rows.values())
    # a predicate over unknown columns fails loudly, MV intact
    with pytest.raises(Exception):
        sess.execute("REFRESH MATERIALIZED VIEW mv_scoped WHERE no_such_col = 1")
    assert len(sess.execute("SELECT * FROM mv_scoped").collect()) == 25
    sess.execute("DROP MATERIALIZED VIEW mv_scoped")
    spark.sql("DROP TABLE t_mv_base")
