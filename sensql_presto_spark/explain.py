"""EXPLAIN ANALYZE with runtime statistics (reference:
``presto-main/.../operator/ExplainAnalyzeOperator.java`` — executes the
query and renders the plan annotated with per-operator metrics).

Spark's ``df.explain()`` prints the static plan only; the runtime numbers
live on the executed plan's SQLMetrics after an action. ``explain_analyze``
runs the plan through the noop sink (full execution, no driver
materialization — DevNullOperator's role) and walks the executed SparkPlan
via py4j collecting each operator's metrics (rows produced, shuffle bytes,
spill, time), returned as a DataFrame so it composes like any other query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def explain_analyze(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Execute `df` and return (operator_id, operator, metric, value) rows."""
    plan = df._jdf.queryExecution().executedPlan()
    # Execute THIS plan instance — a df.write/count action would build a new
    # QueryExecution and accumulate its metrics on a different plan tree.
    # execute() materializes every partition distributed-side; the driver
    # only sees the count (DevNullOperator's contract).
    plan.execute().count()
    rows: list[tuple[int, str, str, int]] = []

    def walk(node, idx: int = 0) -> int:
        name = node.nodeName()
        metrics = node.metrics()
        it = metrics.iterator()
        while it.hasNext():
            entry = it.next()
            metric = entry._2()
            rows.append((idx, name, str(metric.name().get()), int(metric.value())))
        children = node.children()
        my_idx = idx
        cit = children.iterator()
        while cit.hasNext():
            idx = walk(cit.next(), idx + 1)
        # AQE wrappers: the real operators hang off executedPlan()/plan(),
        # not children() (Spark 4: ResultQueryStage / ShuffleQueryStage /
        # BroadcastQueryStage each wrap a materialized stage).
        if name == "AdaptiveSparkPlan":
            idx = walk(node.executedPlan(), idx + 1)
        elif name.endswith("QueryStage"):
            idx = walk(node.plan(), idx + 1)
        return max(idx, my_idx)

    walk(plan)
    return spark.createDataFrame(
        rows, "operator_id INT, operator STRING, metric STRING, value BIGINT"
    )
