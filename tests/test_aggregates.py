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


def test_countmin_never_underestimates_and_is_mergeable(spark):
    """Count-min contract: every point estimate >= the true count (with
    real collisions at w=8 over the 31-term vocabulary, so the sketch is
    genuinely exercised, not trivially exact), and cells built over two
    disjoint corpus halves ADD to the full-corpus cells — the mergeable /
    cross-shard property the 100 TB posture depends on."""
    from sensql_presto_spark import catalog
    from sensql_presto_spark.queries import registry

    sf = "/root/testdata/sf0.01"
    out = registry.get("agg_countmin_freq").build(spark, sf).toPandas()
    assert len(out) == 5
    assert (out["overcount"] >= 0).all()
    assert (out["overcount"] > 0).any(), "w=8 should collide on this vocab"
    assert (out["cms_estimate"] == out["true_count"] + out["overcount"]).all()

    cells_sql = """
        WITH tf AS (
            SELECT term, count(*) AS c
            FROM (SELECT explode(split(text, ' ')) AS term FROM documents
                  {WHERE})
            GROUP BY term
        ),
        hashed AS (
            SELECT term, c,
                   aggregate(split(term, ''), 7L,
                             (acc, ch) -> (acc * 31 + ascii(ch)) % 1000000007) AS h0
            FROM tf
        )
        SELECT r, ((h0 * (CASE r WHEN 0 THEN 31 WHEN 1 THEN 131
                               WHEN 2 THEN 1031 ELSE 8191 END)
                    + r * 97 + 1) % 1000000007) % 8 AS b,
               sum(c) AS cell
        FROM hashed CROSS JOIN (SELECT explode(sequence(0, 3)) AS r)
        GROUP BY 1, 2
    """
    full = {
        (r.r, r.b): r.cell
        for r in catalog.sql(spark, sf, cells_sql.format(WHERE="")).collect()
    }
    lo = {
        (r.r, r.b): r.cell
        for r in catalog.sql(
            spark, sf, cells_sql.format(WHERE="WHERE doc_id % 2 = 0")
        ).collect()
    }
    hi = {
        (r.r, r.b): r.cell
        for r in catalog.sql(
            spark, sf, cells_sql.format(WHERE="WHERE doc_id % 2 = 1")
        ).collect()
    }
    for key, v in full.items():
        assert lo.get(key, 0) + hi.get(key, 0) == v
