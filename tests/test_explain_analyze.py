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


def test_explain_distributed_fragments(spark):
    """EXPLAIN (TYPE DISTRIBUTED): fragments split at exchange boundaries
    (PlanPrinter.textDistributedPlan analog)."""
    from sensql_presto_spark.statements import StatementSession

    sess = StatementSession(spark, "/root/testdata/sf0.001")
    rows = sess.execute(
        "EXPLAIN (TYPE DISTRIBUTED) "
        "SELECT c_nationkey, count(*) AS n FROM customer GROUP BY c_nationkey"
    ).collect()
    frags = {r.fragment for r in rows}
    assert 0 in frags and len(frags) >= 2, "group-by must introduce a shuffle fragment"
    exchanges = [r for r in rows if "Exchange" in r.operator]
    assert exchanges and all("hashpartitioning" in r.partitioning for r in exchanges)
    # root fragment has no parent; exchange-created fragments point at parents
    assert all(r.parent_fragment is None for r in rows if r.fragment == 0)

    # broadcast join renders a REPLICATE fragment
    rows = sess.execute(
        "EXPLAIN (TYPE DISTRIBUTED) "
        "SELECT n.n_name, r.r_name FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"
    ).collect()
    assert any("REPLICATE" in r.partitioning for r in rows if "Exchange" in r.operator)
