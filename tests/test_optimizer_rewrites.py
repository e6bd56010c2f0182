"""Optimizer-rewrite parity (SURVEY.md §4.1): the reference implements
these as hand-written rules (presto-main/.../sql/planner/optimizations/);
Catalyst performs each one on our declarative plans — asserted here so a
regression in plan shape (e.g. a rewrite defeated by a new expression)
fails loudly.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from sensql_presto_spark.queries import registry

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str, mode: str = "formatted") -> str:
    df = registry.get(name).build(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _sql_plan(spark, sql: str) -> str:
    from sensql_presto_spark import catalog

    df = catalog.sql(spark, SF, sql)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_exists_becomes_semi_join(spark):
    """TransformExistsApplyToLateralNode + semi-join planning
    (reference: TransformCorrelatedInPredicateToJoin.java)."""
    plan = _plan(spark, "tpch_q04")
    assert "LeftSemi" in plan


def test_not_exists_becomes_anti_join(spark):
    plan = _plan(spark, "tpch_q21")
    assert "LeftAnti" in plan


def test_correlated_scalar_subquery_decorrelates(spark):
    """No per-row subquery execution survives planning
    (reference: TransformCorrelatedScalarAggregationToJoin.java)."""
    plan = _plan(spark, "tpch_q17")
    # the correlated avg() must appear as an aggregation joined back, not a
    # per-row subquery node
    assert "HashAggregate" in plan
    assert "Join" in plan


def test_constant_folding_eliminates_tautology(spark):
    """ExpressionInterpreter/SimplifyExpressions parity: WHERE 1 = 1 AND
    2 > 1 leaves no Filter operator."""
    plan = _sql_plan(spark, "SELECT n_name FROM nation WHERE 1 = 1 AND 2 > 1")
    assert "Filter" not in plan


def test_contradiction_becomes_empty_relation(spark):
    """WHERE 1 = 0 prunes the scan entirely (reference:
    RemoveUnsupportedDynamicFilters/EmptyDelete pruning family)."""
    plan = _sql_plan(spark, "SELECT n_name FROM nation WHERE 1 = 0")
    assert "LocalTableScan" in plan or "EmptyRelation" in plan
    assert "FileScan" not in plan


def test_predicate_inference_through_join(spark):
    """A filter on one join side is inferred onto the equi-joined column of
    the other side (reference: PredicatePushDown.java inference)."""
    plan = _sql_plan(
        spark,
        """
        SELECT c.c_name FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_nationkey = 7
        """,
    )
    # pushed to BOTH scans: nation's key filter and customer's inferred one
    assert plan.count("7") >= 2
    assert "PushedFilters: [" in plan


def test_projection_pushdown_prunes_unused_columns(spark):
    """ColumnPruning (reference: PruneUnreferencedOutputs.java)."""
    plan = _sql_plan(spark, "SELECT l_orderkey FROM lineitem WHERE l_quantity > 10")
    schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schema_lines and "l_extendedprice" not in schema_lines[0]


def test_limit_pushes_into_sort(spark):
    """TopN fusion (reference: MergeLimitWithSort.java): ORDER BY + LIMIT
    plans as TakeOrderedAndProject, not a global sort."""
    plan = _sql_plan(
        spark, "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 5"
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan
