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
        assert r.exact_customers > 0
        assert r.merge_estimate_ok  # |merged-HLL estimate - exact| <= 5%


def test_approx_sketches_close_to_exact(spark):
    rows = registry.get("agg_approx_sketches").build(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.exact_parts > 0
        # every error-bound flag the driver hash-compares must actually hold
        assert r.acd_ok and r.acd_rsd_ok
        assert r.p50_ok and r.p25_ok and r.p75_ok
