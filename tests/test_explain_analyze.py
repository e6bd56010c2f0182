"""EXPLAIN ANALYZE runtime-stats parity (ExplainAnalyzeOperator.java)."""

from __future__ import annotations

from sensql_presto_spark.explain import explain_analyze
from sensql_presto_spark.queries import registry

SF = "/root/testdata/sf0.01"


def test_explain_analyze_reports_runtime_metrics(spark):
    df = registry.get("tpch_q06").build(spark, SF)
    stats = explain_analyze(spark, df).toPandas()
    assert len(stats) > 0
    # runtime row counts are present and the scan actually read rows
    out_rows = stats[stats.metric == "number of output rows"]
    assert not out_rows.empty and out_rows.value.max() > 0
    ops = set(stats.operator)
    assert any("Scan" in o for o in ops)
    assert any("Aggregate" in o or "HashAggregate" in o for o in ops)


def test_explain_analyze_sees_shuffle_metrics(spark):
    df = registry.get("agg_basic").build(spark, SF)
    stats = explain_analyze(spark, df).toPandas()
    assert any("Exchange" in o or "ShuffleQueryStage" in o for o in set(stats.operator)) or (
        stats.metric.str.contains("shuffle").any()
    )
