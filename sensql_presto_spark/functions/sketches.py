"""Quantile-sketch surface: qdigest/tdigest as mergeable values, Spark-first.

Reference: ``presto-main/src/main/java/com/facebook/presto/operator/scalar/
QuantileDigestFunctions.java`` and ``TDigestFunctions.java`` (value_at_quantile,
quantile_at_value, values_at_quantiles, merge), plus the ``qdigest_agg`` /
``tdigest_agg`` aggregations (``operator/aggregation/``).

Presto models digests as first-class binary values that flow through
queries and merge associatively. The Spark-native translation used here:

- The *aggregate -> quantile* path is Spark's built-in ``percentile_approx``
  (JVM-side Greenwald-Khanna summaries with partial/final merge — the same
  mergeable-sketch execution Presto gets from qdigest_agg).
- The *sketch-as-value* path represents a digest as
  ``struct(n BIGINT, cuts ARRAY<DOUBLE>)`` — ``cuts`` holding K+1 equi-depth
  cut points (a compressed CDF, exactly a fixed-size t-digest centroid set).
  Scalar probes (value_at_quantile / quantile_at_value) are pure
  higher-order-function expressions; merging a *set* of digests re-quantiles
  the union of cut points weighted by each digest's row count — the same
  weighted-centroid merge t-digest performs, expressed as
  explode -> window cumulative weight -> pick-first-at-quantile, which is
  shuffle-bounded by the number of digests x K (not the raw data) and so
  holds at 100 TB: raw rows are only touched once, in the partial
  aggregation that builds the leaf digests.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

K = 16  # cut points per digest (K+1 values: q = 0/K, 1/K, ... K/K)

_QS = ", ".join(f"{i}D / {K}" for i in range(K + 1))

_SKETCH_FUNCTIONS = (
    # value_at_quantile(digest_cuts, q): linear interpolation between the
    # surrounding cut points (QuantileDigestFunctions.java:valueAtQuantile).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION value_at_quantile(
            cuts ARRAY<DOUBLE>, q DOUBLE) RETURNS DOUBLE RETURN
        element_at(cuts, cast(floor(q * (size(cuts) - 1)) AS INT) + 1)
        + (q * (size(cuts) - 1) - floor(q * (size(cuts) - 1)))
          * (element_at(cuts, least(cast(floor(q * (size(cuts) - 1)) AS INT) + 2,
                                    size(cuts)))
             - element_at(cuts, cast(floor(q * (size(cuts) - 1)) AS INT) + 1))""",
    # quantile_at_value(digest_cuts, v): inverse CDF probe — the fraction of
    # cut points at or below v (QuantileDigestFunctions.java:quantileAtValue).
    """CREATE OR REPLACE TEMPORARY FUNCTION quantile_at_value(
           cuts ARRAY<DOUBLE>, v DOUBLE) RETURNS DOUBLE RETURN
       CAST(size(filter(cuts, c -> c <= v)) AS DOUBLE) / size(cuts)""",
    # values_at_quantiles: vectorized probe (maps over the quantile array).
    """CREATE OR REPLACE TEMPORARY FUNCTION values_at_quantiles(
           cuts ARRAY<DOUBLE>, qs ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE> RETURN
       transform(qs, q ->
           element_at(cuts, cast(floor(q * (size(cuts) - 1)) AS INT) + 1))""",
    # quantiles_at_values: the vectorized inverse probe
    # (QuantileDigestFunctions.java quantilesAtValues).
    """CREATE OR REPLACE TEMPORARY FUNCTION quantiles_at_values(
           cuts ARRAY<DOUBLE>, vs ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE> RETURN
       transform(vs, v -> CAST(size(filter(cuts, c -> c <= v)) AS DOUBLE) / size(cuts))""",
    # scale_qdigest / scale_tdigest (QuantileDigestFunctions.scaleQDigest,
    # TDigestFunctions.scaleTDigest): uniform weight scaling changes counts
    # but preserves every quantile, and this representation stores only the
    # quantile cut points — so scaling is the identity on the value (the
    # count side lives in the digest struct's n, which callers scale
    # directly). Registered so the reference names resolve; contract
    # documented in PRESTO_EQUIVALENTS.
    """CREATE OR REPLACE TEMPORARY FUNCTION scale_qdigest(
           cuts ARRAY<DOUBLE>, factor DOUBLE) RETURNS ARRAY<DOUBLE> RETURN
       CASE WHEN factor <= 0 THEN cast(raise_error(
                'scale factor must be positive') AS ARRAY<DOUBLE>)
            ELSE cuts END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION scale_tdigest(
           cuts ARRAY<DOUBLE>, factor DOUBLE) RETURNS ARRAY<DOUBLE> RETURN
       CASE WHEN factor <= 0 THEN cast(raise_error(
                'scale factor must be positive') AS ARRAY<DOUBLE>)
            ELSE cuts END""",
    # -- setdigest scalar names over the KMV representation used by
    #    agg_setdigest_jaccard (SetDigestFunctions.java). A digest value is
    #    the sorted array of the k=64 smallest element hashes; merge is
    #    union + re-slice, jaccard compares membership on the union's k
    #    smallest (the standard KMV estimator).
    """CREATE OR REPLACE TEMPORARY FUNCTION merge_set_digest(
           a ARRAY<BIGINT>, b ARRAY<BIGINT>) RETURNS ARRAY<BIGINT> RETURN
       slice(array_sort(array_union(a, b)), 1, 64)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION jaccard_index(
           a ARRAY<BIGINT>, b ARRAY<BIGINT>) RETURNS DOUBLE RETURN
       CAST(size(array_intersect(slice(array_sort(array_union(a, b)), 1, 64),
                                 array_intersect(a, b))) AS DOUBLE)
           / size(slice(array_sort(array_union(a, b)), 1, 64))""",
    # intersection_cardinality: exact when the digests are unsaturated
    # (< 64 hashes — every element's hash is present); the reference's
    # estimator role (jaccard x union cardinality) reduces to the same
    # count in that regime.
    """CREATE OR REPLACE TEMPORARY FUNCTION intersection_cardinality(
           a ARRAY<BIGINT>, b ARRAY<BIGINT>) RETURNS BIGINT RETURN
       cast(size(array_intersect(a, b)) AS BIGINT)""",
)


def qdigest_agg_sql(col: str) -> str:
    """SQL fragment: build a digest's cut-point array over `col`."""
    return f"percentile_approx({col}, array({_QS}), 10000)"


def merge_digests_sql(leaf_view: str, group_col: str) -> str:
    """SQL: merge per-leaf digests in `leaf_view(group, n, cuts)` up to
    `group_col`, producing (group, merged cuts).

    Each cut point carries weight n/(K+1); the merged digest re-quantiles
    the weighted union via a cumulative-weight window — digests x (K+1)
    rows cross the shuffle, never raw data.
    """
    return f"""
    WITH points AS (
        SELECT {group_col}, cut, n / CAST(size(cuts) AS DOUBLE) AS w
        FROM {leaf_view} LATERAL VIEW explode(cuts) AS cut
    ),
    ranked AS (
        SELECT {group_col}, cut,
               sum(w) OVER (PARTITION BY {group_col} ORDER BY cut
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               sum(w) OVER (PARTITION BY {group_col}) AS tw
        FROM points
    ),
    targets AS (SELECT explode(array({_QS})) AS q)
    SELECT {group_col}, array_sort(collect_list(mc)) AS cuts
    FROM (
        SELECT {group_col}, t.q, min(r.cut) AS mc
        FROM ranked r CROSS JOIN targets t
        WHERE r.cw / r.tw >= t.q - 1e-9
        GROUP BY {group_col}, t.q
    )
    GROUP BY {group_col}
    """


def register_sketch_functions(spark: SparkSession) -> None:
    for ddl in _SKETCH_FUNCTIONS:
        spark.sql(ddl)
