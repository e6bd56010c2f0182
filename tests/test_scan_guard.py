"""Registry-wide parquet-rescan guard (r12).

Catalyst INLINES every CTE reference, so a query whose rounds/branches
re-reference a derived relation multiplies the underlying file scans in
the optimized logical plan — the repo's most-recurring perf hazard
(minhash r2, BM25/jaccard r9, and found again by the r12 scan audit:
graph_hits's mutually-recursive rounds had expanded to 1268 scans of
orders, graph_personalized_pagerank to 320, graph_pagerank to 220,
sim_pca_project to 125 — all four reworked onto the staged
localCheckpoint-per-round shape this guard now enforces).

The guard walks every registry entry's OPTIMIZED logical plan and
counts LogicalRelation occurrences per distinct relation (checkpointed
stages are LogicalRDD and intentionally do NOT count — the guard
measures file rescans, which is exactly what the staging discipline is
supposed to eliminate).  The ceiling is MAX_SCANS_PER_RELATION = 32:
the largest legitimate count in the registry is tpcds_q95 at 31
(standard TPC-DS text referencing web_sales from correlated
EXISTS/NOT EXISTS subqueries — one query's inherent multi-reference,
not iterative blowup).  Anything above the ceiling is either a CTE
re-expansion bug or needs a whitelist entry here with a stated NUMERIC
bound, same contract style as tests/test_window_guard.py.

CONTRIBUTING — whitelist rules: a whitelist value must name the numeric
scan bound and why the plan legitimately needs it; vague bounds fail
test_scan_whitelist_bounds_are_numeric.
"""

from __future__ import annotations

import collections

from sensql_presto_spark.queries import all_specs

SF = "/root/testdata/sf0.001"  # plan SHAPE is scale-independent; smallest data

# The largest legitimate same-relation scan count in the registry is 31
# (tpcds_q95's web_sales, inherent to the benchmark text).
MAX_SCANS_PER_RELATION = 32

# r13: the r12 guard only counted FILE relations, so six iterative plans
# whose rounds re-referenced a CHECKPOINTED stage slipped it entirely —
# cluster_dbscan_grid re-scanned its checkpointed pair relation 888x
# (2.7 MB plan), cluster_snn_knn 381x, cluster_kmeans_parallel_init
# 146x, graph_modularity 69x, graph_khop_distances 32x,
# graph_label_propagation 22x.  All six were restaged (checkpoint per
# round); this second ceiling keeps the hazard closed for RDD-backed
# stages too.  Largest legitimate count after the fixes: 10
# (graph_triangle_count / text_perplexity_bucket — one plan's inherent
# multi-reference of a bounded staged relation, not iterative blowup).
MAX_SCANS_PER_RDD = 16

# entry -> stated numeric bound for plans that legitimately exceed the
# ceiling.  Empty today — the four auditors-found offenders were fixed,
# not whitelisted.
WHITELIST: dict = {}


def _relation_scan_counts(df) -> "collections.Counter":
    """Count LogicalRelation occurrences per distinct relation signature
    in the optimized logical plan (subqueries included)."""
    counts: collections.Counter = collections.Counter()
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() == "LogicalRelation":
            # identity = truncated simpleString (output columns + format);
            # stable for "same table scanned twice", distinct across tables
            counts[n.simpleString(200).split("[")[0][:160]] += 1
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        sub = n.subqueries()
        for i in range(sub.size()):
            stack.append(sub.apply(i))
    return counts


def _rdd_scan_counts(df) -> "collections.Counter":
    """Count LogicalRDD occurrences per distinct underlying RDD (the
    checkpointed-stage analogue of _relation_scan_counts; identity is
    the RDD id, so two references to ONE checkpoint count together while
    distinct checkpoints stay separate)."""
    counts: collections.Counter = collections.Counter()
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() == "LogicalRDD":
            counts[n.rdd().id()] += 1
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        sub = n.subqueries()
        for i in range(sub.size()):
            stack.append(sub.apply(i))
    return counts


def test_no_relation_scanned_past_the_ceiling_in_any_registry_plan(spark):
    offenders: dict = {}
    rdd_offenders: dict = {}
    errors: dict = {}
    for name, spec in sorted(all_specs().items()):
        if name in WHITELIST:
            continue
        try:
            df = spec.build(spark, SF)
        except Exception as exc:  # a build failure is its own loud signal
            errors[name] = repr(exc)[:200]
            continue
        counts = _relation_scan_counts(df)
        mx = max(counts.values(), default=0)
        if mx > MAX_SCANS_PER_RELATION:
            offenders[name] = mx
        rdd_mx = max(_rdd_scan_counts(df).values(), default=0)
        if rdd_mx > MAX_SCANS_PER_RDD:
            rdd_offenders[name] = rdd_mx
    assert not errors, f"registry builds failed under the scan guard: {errors}"
    assert not offenders, (
        "relation re-scanned past the ceiling (CTE re-expansion — stage "
        "the multi-referenced relation via localCheckpoint, or whitelist "
        f"with a stated numeric bound): {offenders}"
    )
    assert not rdd_offenders, (
        "checkpointed stage re-scanned past the RDD ceiling (CTE "
        "re-expansion of an iterate — stage each round, or whitelist "
        f"with a stated numeric bound): {rdd_offenders}"
    )


def test_scan_whitelist_bounds_are_numeric():
    import re

    for name, bound in WHITELIST.items():
        assert re.search(r"\d", str(bound)), (
            f"scan-guard whitelist entry {name!r} has a non-numeric "
            f"bound {bound!r}: state the scan count and why"
        )


def test_scan_guard_actually_detects_a_violation(spark):
    """Self-test: a plan that unions one parquet relation 64 times must
    trip the counter; a checkpointed relation must NOT count (it is a
    LogicalRDD, not a LogicalRelation — exactly the staging cure)."""
    from sensql_presto_spark import catalog

    base = catalog.table(spark, SF, "region")
    df = base
    for _ in range(6):  # 2^6 = 64 scans of the same relation
        df = df.union(df)
    assert max(_relation_scan_counts(df).values()) == 64

    staged = base.localCheckpoint(eager=True)
    df2 = staged
    for _ in range(6):
        df2 = df2.union(df2)
    assert max(_relation_scan_counts(df2).values(), default=0) == 0
    # ...and the RDD counter catches exactly that staged-relation blowup
    # (the r13 gap: dbscan/snn re-scanned checkpoints 888x/381x unseen)
    assert max(_rdd_scan_counts(df2).values()) == 64
    assert max(_rdd_scan_counts(staged).values()) == 1
