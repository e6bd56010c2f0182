"""Driver contract for the spark-graft builder (PySpark target).

Everything is derived from the query registry
(``sensql_presto_spark.queries.registry``): each registered QuerySpec
supplies both the Spark builder for ``queries()`` and, when deterministic
and SQL-expressible, the DuckDB oracle for ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sensql_presto_spark.queries import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from sensql_presto_spark.queries import get

    return get("tpch_q01").build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in sorted(all_specs().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every deterministic query."""
    return {
        name: spec.oracle
        for name, spec in sorted(all_specs().items())
        if spec.oracle is not None
    }
