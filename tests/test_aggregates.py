"""Accuracy gates for the approximate aggregate family.

The oracle harness can't hash-compare sketch outputs (sketch internals are
engine-specific), so these tests assert the estimates against exact values
computed in the same query.
"""

from __future__ import annotations

from sensql_presto_spark.queries import registry

SF_DIR = "/root/testdata/sf0.01"


def test_hll_rollup_estimates_close_to_exact(spark):
    rows = registry.get("agg_hll_sketch_rollup").build(spark, SF_DIR).collect()
    assert len(rows) == 5  # five regions
    for r in rows:
        assert abs(r.approx_customers - r.exact_customers) <= max(3, 0.05 * r.exact_customers)


def test_approx_sketches_close_to_exact(spark):
    rows = registry.get("agg_approx_sketches").build(spark, SF_DIR).collect()
    exact = {
        r.l_returnflag: r
        for r in registry.get("agg_basic").build(spark, SF_DIR).collect()
    }
    for r in rows:
        e = exact[r.l_returnflag]
        assert abs(r.approx_parts - e.n_parts) <= 0.1 * e.n_parts
        # tighter rsd=0.01 variant
        assert abs(r.approx_supps - e.n_parts) <= e.n_parts  # sanity bound only
        assert r.approx_p50 > 0
