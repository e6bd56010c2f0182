"""DELETE / UPDATE / MERGE as an oracle-checked registry entry.

Runs the full mutation lifecycle (CTAS snapshot -> DELETE -> UPDATE ->
MERGE) through ``sensql_presto_spark.mutation.WritableTable`` and returns
the final table state; the DuckDB oracle recomputes the same end state
with pure SQL set algebra over the source tables. This is the
DeleteOperator.java / MERGE parity gate (round-1 "what's missing" #4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensql_presto_spark import catalog
from sensql_presto_spark.mutation import WritableTable
from sensql_presto_spark.queries.registry import register

_TABLE_DIR = os.path.join("spark-warehouse", "mutable_orders_demo")


@register(
    "mutation_delete_merge",
    oracle="""
    WITH t0 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey < 500
    ),
    t1 AS (  -- DELETE WHERE o_totalprice < 50000
        SELECT * FROM t0 WHERE NOT (o_totalprice < 50000)
    ),
    t2 AS (  -- UPDATE SET o_custkey = o_custkey + 100000 WHERE status = 'O'
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O' THEN o_custkey + 100000
                    ELSE o_custkey END AS o_custkey,
               o_orderstatus, o_totalprice
        FROM t1
    ),
    s AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey >= 250 AND o_orderkey < 750
    ),
    kept AS (  -- MERGE matched -> status 'M', price += 1
        SELECT t2.o_orderkey, t2.o_custkey,
               CASE WHEN s.o_orderkey IS NOT NULL THEN 'M'
                    ELSE t2.o_orderstatus END AS o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice + 1
                    ELSE t2.o_totalprice END AS o_totalprice
        FROM t2 LEFT JOIN s ON t2.o_orderkey = s.o_orderkey
    ),
    inserted AS (  -- MERGE not matched -> INSERT as status 'N'
        SELECT s.o_orderkey, s.o_custkey, 'N' AS o_orderstatus, s.o_totalprice
        FROM s LEFT JOIN t2 ON s.o_orderkey = t2.o_orderkey
        WHERE t2.o_orderkey IS NULL
    )
    SELECT * FROM kept
    UNION ALL
    SELECT * FROM inserted
    ORDER BY o_orderkey
    """,
    tags=("mutation", "ddl"),
    doc="Copy-on-write DELETE + UPDATE + MERGE end-state vs SQL set-algebra oracle.",
)
def mutation_delete_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = catalog.table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    t = WritableTable.create(
        spark, _TABLE_DIR, orders.filter(F.col("o_orderkey") < 500)
    )
    t.delete(F.col("o_totalprice") < 50000)
    t.update(
        {"o_custkey": F.col("o_custkey") + 100000},
        F.col("o_orderstatus") == "O",
    )
    source = orders.filter(
        (F.col("o_orderkey") >= 250) & (F.col("o_orderkey") < 750)
    ).select("o_orderkey", "o_custkey", "o_totalprice")
    t.merge(
        source,
        on=["o_orderkey"],
        when_matched_update={
            "o_orderstatus": F.lit("M"),
            "o_totalprice": F.col("s_o_totalprice") + 1,
        },
        when_not_matched_insert={
            "o_orderkey": F.col("o_orderkey"),
            "o_custkey": F.col("s_o_custkey"),
            "o_orderstatus": F.lit("N"),
            "o_totalprice": F.col("s_o_totalprice"),
        },
    )
    assert t.version == 3  # CTAS + three committed mutations
    return t.read().orderBy("o_orderkey")


_WRITE_DIR = os.path.join("spark-warehouse", "ctas_insert_demo")


@register(
    "ddl_ctas_insert",
    oracle="""
    WITH ctas AS (
        SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey < 3
    ),
    after_insert AS (
        SELECT * FROM ctas
        UNION ALL
        SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey >= 3
    )
    -- INSERT OVERWRITE replaces contents with the high-key half
    SELECT n_nationkey, n_name, n_regionkey
    FROM after_insert WHERE n_nationkey >= 10
    ORDER BY n_nationkey
    """,
    tags=("ddl", "mutation"),
    doc="TableWriter lifecycle (SURVEY §2.1 #5): CTAS -> INSERT INTO append "
    "-> INSERT OVERWRITE, each a committed snapshot version; end state vs "
    "SQL set-algebra oracle (TableWriterOperator.java).",
)
def ddl_ctas_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = catalog.table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = WritableTable.create(spark, _WRITE_DIR, nation.filter(F.col("n_regionkey") < 3))
    t.insert_into(nation.filter(F.col("n_regionkey") >= 3))
    t.insert_overwrite(t.read().filter(F.col("n_nationkey") >= 10))
    assert t.version == 2  # CTAS (v0) + two committed writes
    return t.read().orderBy("n_nationkey")


@register(
    "ddl_materialized_view",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(cast(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("ddl", "matview"),
    doc="Materialized-view lifecycle (SURVEY §3.4; CreateMaterializedViewTask"
    ".java + refresh path): CREATE MV -> query reads the storage snapshot, "
    "REFRESH commits v=1; end state vs the defining query's oracle.",
)
def ddl_materialized_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sensql_presto_spark.statements import StatementSession

    sess = StatementSession(spark, sf_dir)
    defn = (
        "SELECT o_orderpriority, count(*) AS n_orders, "
        "CAST(sum(cast(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total "
        "FROM orders GROUP BY o_orderpriority"
    )
    sess.execute(f"CREATE OR REPLACE MATERIALIZED VIEW mv_prio_totals AS {defn}")
    sess.execute("REFRESH MATERIALIZED VIEW mv_prio_totals")
    # Query via the registered view name: scans the v=1 parquet snapshot,
    # not the defining aggregation.
    return sess.execute("SELECT * FROM mv_prio_totals ORDER BY o_orderpriority")


_TT_DIR = os.path.join("spark-warehouse", "time_travel_demo")


@register(
    "mutation_time_travel",
    oracle="""
    WITH v0 AS (
        SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 2
    ),
    v1 AS (
        SELECT n_nationkey, n_name FROM v0 WHERE n_nationkey >= 5
    )
    SELECT COALESCE(a.n_nationkey, b.n_nationkey) AS n_nationkey,
           (a.n_nationkey IS NOT NULL) AS in_v0,
           (b.n_nationkey IS NOT NULL) AS in_v1
    FROM v0 a FULL OUTER JOIN v1 b ON a.n_nationkey = b.n_nationkey
    ORDER BY n_nationkey
    """,
    tags=("ddl", "mutation", "time-travel"),
    doc="Snapshot time travel (Delta/Iceberg VERSION AS OF): v0 stays "
    "readable after a DELETE commits v1; the oracle replays both versions "
    "with set algebra and checks row membership per version.",
)
def mutation_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = catalog.table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    t = WritableTable.create(spark, _TT_DIR, nation.filter(F.col("n_regionkey") < 2))
    t.delete(F.col("n_nationkey") < 5)
    v0 = t.read_version(0).select("n_nationkey").withColumn("__v0", F.lit(1))
    v1 = t.read_version(1).select("n_nationkey").withColumn("__v1", F.lit(1))
    return (
        v0.join(v1, "n_nationkey", "full_outer")
        .select(
            "n_nationkey",
            F.col("__v0").isNotNull().alias("in_v0"),
            F.col("__v1").isNotNull().alias("in_v1"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "ddl_create_function",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(CASE WHEN o_totalprice * 0.9 > 150000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_big_discounted
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("ddl", "function"),
    doc="CREATE FUNCTION DDL (SqlBase.g4:72-79 createFunction; executed by "
    "the reference's function-namespace managers): a Presto-syntax scalar "
    "SQL function with routine characteristics is routed to a Spark SQL "
    "temporary function by statements.StatementSession, then used inside "
    "an aggregation; the oracle inlines the expression body. The created "
    "function inlines into Catalyst codegen — zero UDF overhead.",
)
def ddl_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sensql_presto_spark.statements import StatementSession

    sess = StatementSession(spark, sf_dir)
    sess.execute(
        "CREATE OR REPLACE FUNCTION discounted(price double) RETURNS double "
        "COMMENT '10 pct off' LANGUAGE SQL DETERMINISTIC "
        "RETURN price * 0.9"
    )
    return sess.execute(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               CAST(sum(CASE WHEN discounted(o_totalprice) > 150000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_big_discounted
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "ddl_create_type",
    oracle="""
    SELECT o_orderstatus AS status, count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("ddl", "type", "enum"),
    doc="CREATE TYPE … AS ENUM (SqlBase.g4:61-63; BigintEnumType.java / "
    "VarcharEnumType.java): enum emulation as base type + membership check "
    "constraint. The constructor function validates every o_orderstatus "
    "value (all members, so the column passes through unchanged); a "
    "non-member value raises — the INVALID_CAST_ARGUMENT contract "
    "(EnumCasts.java) — covered by tests/test_statements.py.",
)
def ddl_create_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sensql_presto_spark.statements import StatementSession

    sess = StatementSession(spark, sf_dir)
    sess.execute("CREATE TYPE orderstatus_t AS ENUM ('F', 'O', 'P')")
    return sess.execute(
        """
        SELECT orderstatus_t(o_orderstatus) AS status, count(*) AS n
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@register(
    "ddl_alter_table",
    oracle="""
    SELECT n_nationkey, n_name,
           CAST(n_regionkey * 10 AS BIGINT) AS region_decade
    FROM nation WHERE n_regionkey < 3
    ORDER BY n_nationkey
    """,
    tags=("ddl", "mutation", "alter"),
    doc="ALTER TABLE lifecycle (SqlBase.g4 alterTable): ADD COLUMN with a "
    "value expression -> RENAME COLUMN -> DROP COLUMN, each a committed "
    "copy-on-write snapshot; prior versions keep the pre-evolution schema "
    "(time-travel asserted in the builder).",
)
def ddl_alter_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    nation = catalog.table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    # normpath is load-bearing (r13): with the ".." left unresolved,
    # os.path.isdir() in WritableTable.create returns False whenever the
    # sibling ctas_insert_demo dir is absent (POSIX resolves ".." through
    # REAL components), so the stale-table cleanup is skipped — while
    # Hadoop normalizes the path LEXICALLY and then hits the stale
    # alter_demo dir with PATH_ALREADY_EXISTS.  This was the transient
    # "plan-build error" the r12 retry-once patch absorbed: it reproduces
    # exactly when an interrupted earlier run leaves alter_demo behind
    # without ctas_insert_demo.
    path = os.path.normpath(os.path.join(_WRITE_DIR, "..", "alter_demo"))
    t = WritableTable.create(spark, path, nation.filter(F.col("n_regionkey") < 3))
    t.add_column("bal_class", (F.col("n_regionkey") * 10).cast("long"))
    t.rename_column("bal_class", "region_decade")
    t.drop_column("n_regionkey")
    assert t.version == 3  # CTAS v0 + three schema-evolution snapshots
    # prior snapshots keep their schema (time travel across evolution)
    assert t.read_version(0).columns == ["n_nationkey", "n_name", "n_regionkey"]
    assert "region_decade" in t.read_version(2).columns
    return t.read().orderBy("n_nationkey")


@register(
    "ddl_access_control",
    oracle="""
    SELECT * FROM (VALUES
        ('alice', 'USER', 'SELECT', 'nation', FALSE),
        ('readers', 'ROLE', 'SELECT', 'region', TRUE))
        AS t(grantee, grantee_type, privilege_type, table_name, is_grantable)
    ORDER BY grantee, table_name
    """,
    tags=("ddl", "access"),
    doc="Access-control statement surface (SqlBase.g4:97-117; "
    "AccessControlManager.java): CREATE ROLE, table GRANT to user and "
    "role (WITH GRANT OPTION), role membership, enforcement allow/deny "
    "round-trip asserted in the builder; returns SHOW GRANTS in the "
    "information_schema.table_privileges shape.",
)
def ddl_access_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sensql_presto_spark.access import AccessControl, AccessDeniedError
    from sensql_presto_spark.statements import StatementSession

    store = AccessControl()
    admin = StatementSession(spark, sf_dir, user="admin", access=store)
    alice = StatementSession(
        spark, sf_dir, user="alice", access=store, enforce_access=True
    )
    try:
        alice.execute("SELECT count(*) FROM nation")
        raise AssertionError("expected Access Denied before any grant")
    except AccessDeniedError:
        pass
    admin.execute("CREATE ROLE readers")
    admin.execute("GRANT SELECT ON nation TO USER alice")
    admin.execute("GRANT SELECT ON region TO ROLE readers WITH GRANT OPTION")
    admin.execute("GRANT readers TO USER alice")
    assert alice.execute("SELECT count(*) AS n FROM nation").collect()[0].n > 0
    assert alice.execute("SELECT count(*) AS n FROM region").collect()[0].n > 0
    return alice.execute("SHOW GRANTS").orderBy("grantee", "table_name")


@register(
    "mutation_sql_dml",
    oracle="""
    WITH base AS (SELECT n_nationkey, n_name, n_regionkey FROM nation),
    after_delete AS (SELECT * FROM base WHERE NOT (n_nationkey >= 20)),
    after_update AS (
        SELECT n_nationkey,
               CASE WHEN n_regionkey = 0 THEN n_name || '!' ELSE n_name END AS n_name,
               n_regionkey
        FROM after_delete
    ),
    src AS (SELECT n_nationkey AS k, upper(n_name) || '?' AS nm
            FROM nation WHERE n_nationkey BETWEEN 18 AND 22),
    merged AS (
        SELECT u.n_nationkey,
               CASE WHEN s.k IS NOT NULL THEN s.nm ELSE u.n_name END AS n_name,
               u.n_regionkey
        FROM after_update u LEFT JOIN src s ON u.n_nationkey = s.k
        UNION ALL
        SELECT s.k, s.nm, CAST(NULL AS BIGINT)
        FROM src s WHERE s.k NOT IN (SELECT n_nationkey FROM after_update)
    )
    SELECT n_nationkey, n_name, n_regionkey FROM merged ORDER BY n_nationkey
    """,
    tags=("mutation", "dml", "statements"),
    doc="SQL-statement DML surface (SqlBase.g4 delete/update/merge; "
    "DeleteExecute/UpdateExecute/MergeOperator): CTAS a managed table, "
    "then DELETE, UPDATE and a two-clause MERGE as plain SQL statements — "
    "each a copy-on-write table replace; end state vs the set-algebra "
    "oracle, affected-row counts asserted in the builder.",
)
def mutation_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from urllib.parse import urlparse

    from sensql_presto_spark.statements import StatementSession

    t = "__dml_demo"
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    sess = StatementSession(spark, sf_dir)
    sess.execute(f"CREATE TABLE {t} AS SELECT n_nationkey, n_name, n_regionkey FROM nation")
    assert sess.execute(f"DELETE FROM {t} WHERE n_nationkey >= 20").collect()[0].rows == 5
    assert (
        sess.execute(
            f"UPDATE {t} SET n_name = concat(n_name, '!') WHERE n_regionkey = 0"
        ).collect()[0].rows
        == 4
    )
    r = sess.execute(
        f"MERGE INTO {t} t USING (SELECT n_nationkey AS k, concat(upper(n_name), '?') AS nm "
        "FROM nation WHERE n_nationkey BETWEEN 18 AND 22) s "
        "ON t.n_nationkey = s.k "
        "WHEN MATCHED THEN UPDATE SET n_name = s.nm "
        "WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name) VALUES (s.k, s.nm)"
    ).collect()
    assert r[0].rows == 5  # 2 matched + 3 inserted
    out = spark.table(t).select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey")
    return out.localCheckpoint(eager=True)
