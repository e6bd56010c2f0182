"""User-facing Engine facade — the presto-client / StatementClient role.

The reference's clients (``presto-cli``, ``presto-jdbc``, both over
``presto-client``'s StatementClient) give a user one object that accepts
any statement and returns rows.  This is the PySpark-native equivalent
(SURVEY.md §3.3: "a thin ``engine.sql(query) -> DataFrame`` Python API"):

    from sensql_presto_spark import Engine

    with Engine(sf_dir="/root/testdata/sf0.01") as eng:
        df = eng.sql("SELECT count(*) FROM lineitem")       # any statement
        eng.sql("PREPARE q FROM SELECT * FROM nation WHERE n_regionkey = ?")
        eng.sql("EXECUTE q USING 2").show()
        eng.query("tpch_q01").show()                        # registry access
        print(eng.explain("SELECT * FROM orders WHERE o_orderkey = 1"))

``sql`` routes through the full statement layer (DDL, PREPARE/EXECUTE,
SHOW/DESCRIBE, SET SESSION, transactions, views, types, functions) — the
same dispatch the CLI and the HTTP server use — so every statement the
engine supports is reachable from Python with no extra ceremony.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class Engine:
    """One connection-like object over a tuned SparkSession + catalog +
    function registry + statement session."""

    def __init__(
        self,
        sf_dir: str = "/root/testdata/sf0.01",
        spark: SparkSession | None = None,
    ):
        from sensql_presto_spark.functions import register_all
        from sensql_presto_spark.session import get_spark
        from sensql_presto_spark.statements import StatementSession

        self._owns_spark = spark is None
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        register_all(self.spark)
        self._stmts = StatementSession(self.spark, sf_dir)

    # -- statements ---------------------------------------------------------
    def sql(self, text: str) -> DataFrame:
        """Execute any SQL statement (query, DDL, session statement)."""
        return self._stmts.execute(text)

    def query(self, name: str) -> DataFrame:
        """Run a registered query from the engine's declared surface."""
        from sensql_presto_spark.queries import get

        return get(name).build(self.spark, self.sf_dir)

    def explain(self, text: str, analyze: bool = False) -> DataFrame | str:
        """Formatted physical plan for a statement; with ``analyze=True``,
        the runtime-stats EXPLAIN ANALYZE relation (one row per operator)."""
        df = self.sql(text)
        if analyze:
            from sensql_presto_spark.explain import explain_analyze

            return explain_analyze(self.spark, df)
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    # -- lifecycle ----------------------------------------------------------
    def close(self) -> None:
        if self._owns_spark:
            self.spark.stop()

    def __enter__(self) -> "Engine":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
