"""Global-window reduction guard (r10 VERDICT next-round #4).

A window with NO partition spec moves every input row to one task —
fine over a pre-reduced relation (a grouped aggregate, a distinct set,
a top-N), catastrophic over a row-level relation at 100 TB.  Every
partition-less Window in every registry plan must therefore sit above a
reduction in its input subtree (Aggregate / Deduplicate / GlobalLimit),
or be whitelisted here with a stated NDV bound — the same contract
style as the hot-key caps.  This is the blanket guard the
CartesianProduct bench test established, extended to the WHOLE registry
(385 entries), so a future edit cannot silently put a final-ranking
``OVER (ORDER BY ...)`` on row-level data.

CONTRIBUTING — whitelist rules (r11 VERDICT next-round #6): an entry
whose reduction happens inside a Python stage (mapInPandas /
applyInPandas) is invisible to the logical-plan walker and MUST be
whitelisted.  Every whitelist value is a contract string that MUST name
the NUMERIC capacity constant the bound relies on (e.g. "<= 256 rows
(SpaceSaving capacity)") and the implementation file must document
where that constant caps the window's input.  A vague bound ("small",
"bounded") does not pass ``test_whitelist_bounds_are_numeric`` — the
point is that a whitelist entry rots loudly when someone changes the
capacity without updating the contract.
"""

from __future__ import annotations

from sensql_presto_spark.queries import all_specs

SF = "/root/testdata/sf0.001"  # plan SHAPE is scale-independent; smallest data

# entry -> documented bound for a partition-less window whose input
# subtree carries no Aggregate/Deduplicate/GlobalLimit node.  Each bound
# must explain why the window's input row count is small at ANY scale.
WHITELIST: dict = {
    # the final row_number ranks the MERGED SpaceSaving summary, whose
    # reduction happens inside python stages the logical plan can't
    # show as Aggregate: the mapInPandas partials emit <= capacity(256)
    # rows per partition, and spacesaving_merge prunes the union back
    # to <= 256 rows before the window — O(capacity) rows at ANY scale
    # (sketches_suite.py documents the 256 x n_partitions merge-input
    # bound).
    "agg_approx_most_frequent": "<= 256 rows (SpaceSaving capacity)",
}

_REDUCTIONS = {
    "Aggregate",      # groupBy / distinct / grouping sets
    "Deduplicate",    # dropDuplicates
    "GlobalLimit",    # LIMIT n — output bounded by a constant
}


def _subtree_has_reduction(node) -> bool:
    stack = [node]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() in _REDUCTIONS:
            return True
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return False


def _violations(df) -> "list[str]":
    """Partition-less Window nodes with no reduction below them."""
    bad: list[str] = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        n = stack.pop()
        if (
            n.getClass().getSimpleName() == "Window"
            and n.partitionSpec().isEmpty()
            and n.children().size()
            and not _subtree_has_reduction(n.children().apply(0))
        ):
            bad.append(n.simpleString(120))
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        sub = n.subqueries()
        for i in range(sub.size()):
            stack.append(sub.apply(i))
    return bad


def test_no_unbounded_global_window_in_any_registry_plan(spark):
    offenders: dict = {}
    errors: dict = {}
    for name, spec in sorted(all_specs().items()):
        if name in WHITELIST:
            continue
        try:
            df = spec.build(spark, SF)
        except Exception as exc:  # a build failure is its own loud signal
            errors[name] = repr(exc)[:200]
            continue
        bad = _violations(df)
        if bad:
            offenders[name] = bad
    assert not errors, f"registry builds failed under the window guard: {errors}"
    assert not offenders, (
        "partition-less Window over an unreduced input (add a reduction "
        f"or whitelist with a stated NDV bound): {offenders}"
    )


def test_whitelist_bounds_are_numeric():
    """Every whitelist value must state the numeric capacity constant its
    bound relies on (see the module docstring's CONTRIBUTING note) — a
    bound without a number cannot be checked against the implementation
    and rots silently when the capacity changes."""
    import re

    for name, bound in WHITELIST.items():
        assert re.search(r"\d", bound), (
            f"window-guard whitelist entry {name!r} has a non-numeric "
            f"bound {bound!r}: state the capacity constant (e.g. "
            "'<= 256 rows (SpaceSaving capacity)')"
        )
        assert re.search(r"<=?\s*\d|\d+\s*rows?", bound), (
            f"whitelist bound for {name!r} must read as a row bound, "
            f"got {bound!r}"
        )


def test_guard_actually_detects_a_violation(spark):
    """Self-test: the walker must flag a global rank over row-level data
    and pass it once an aggregation sits below."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = spark.range(100).withColumn("k", F.col("id") % 7)
    w = Window.orderBy(F.col("id"))
    assert _violations(rows.withColumn("r", F.row_number().over(w)))

    agg = rows.groupBy("k").agg(F.count("*").alias("n"))
    w2 = Window.orderBy(F.col("n"))
    assert not _violations(agg.withColumn("r", F.row_number().over(w2)))

    # partitioned windows are out of scope for this guard
    wp = Window.partitionBy("k").orderBy("id")
    assert not _violations(rows.withColumn("r", F.row_number().over(wp)))
