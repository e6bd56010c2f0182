"""Same-session interleaved A/B harness for round-14 optimization work.

Usage: python tools/ab_harness.py <experiment> [sf_dir]

Each experiment registers an 'old' and 'new' DataFrame builder; the harness
first verifies both produce IDENTICAL results (sorted collect), then times
them alternately (noop sink, median over N runs, two passes) in one
SparkSession so host-speed drift cancels.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sensql_presto_spark import catalog
from sensql_presto_spark.session import get_spark


def timeit(df_builder, spark, runs=5):
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df_builder().write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def run_ab(spark, sf_dir, builders, runs=5, passes=2, skip_verify=False):
    """builders: dict name -> zero-arg callable returning a DataFrame."""
    names = list(builders)
    if not skip_verify:
        rows = {}
        for n in names:
            df = builders[n]()
            rows[n] = sorted(map(tuple, df.collect()))
        base = rows[names[0]]
        for n in names[1:]:
            assert rows[n] == base, f"RESULT MISMATCH between {names[0]} and {n}"
        print(f"  results identical across {names} ({len(base)} rows)")
    # prewarm each
    for n in names:
        builders[n]().write.format("noop").mode("overwrite").save()
    for p in range(passes):
        meds = {}
        for n in names:
            meds[n] = timeit(builders[n], spark, runs)
        rel = " ".join(f"{n}={meds[n]:.3f}s" for n in names)
        base = meds[names[0]]
        ratios = " ".join(f"{n}:{base / meds[n]:.2f}x" for n in names[1:])
        print(f"  pass {p + 1}: {rel}   speedup vs {names[0]}: {ratios}")


# ---------------------------------------------------------------------------
# experiment: agg_exact_quantiles — window-n consolidation (VERDICT r13 #2)
# ---------------------------------------------------------------------------

QUANT_OLD = """
    WITH m1h AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS val,
                        count(*) AS cnt
                 FROM orders GROUP BY 1),
    m2h AS (SELECT CAST(l_quantity AS BIGINT) AS val, count(*) AS cnt
            FROM lineitem GROUP BY 1),
    hist AS (SELECT 'orders.o_totalprice_cents' AS measure, val, cnt FROM m1h
             UNION ALL
             SELECT 'lineitem.l_quantity' AS measure, val, cnt FROM m2h),
    cum AS (
        SELECT measure, val, cnt,
               sum(cnt) OVER (PARTITION BY measure ORDER BY val) AS cum_cnt
        FROM hist
    ),
    tot AS (SELECT measure, sum(cnt) AS n FROM hist GROUP BY measure),
    qs AS (SELECT explode(array(500, 900, 990)) AS q_milli),
    pick AS (
        SELECT c.measure, q.q_milli, t.n,
               min(c.val) AS quantile_value
        FROM cum c JOIN tot t ON t.measure = c.measure
        JOIN qs q
          ON c.cum_cnt * 1000 >= q.q_milli * t.n
        GROUP BY c.measure, q.q_milli, t.n
    )
    SELECT measure, CAST(q_milli AS BIGINT) AS q_milli, CAST(n AS BIGINT) AS n,
           CAST(quantile_value AS BIGINT) AS quantile_value
    FROM pick ORDER BY measure, q_milli
    """

QUANT_NEW = """
    WITH m1h AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS val,
                        count(*) AS cnt
                 FROM orders GROUP BY 1),
    m2h AS (SELECT CAST(l_quantity AS BIGINT) AS val, count(*) AS cnt
            FROM lineitem GROUP BY 1),
    hist AS (SELECT 'orders.o_totalprice_cents' AS measure, val, cnt FROM m1h
             UNION ALL
             SELECT 'lineitem.l_quantity' AS measure, val, cnt FROM m2h),
    cum AS (
        SELECT measure, val, cnt,
               sum(cnt) OVER (PARTITION BY measure ORDER BY val) AS cum_cnt,
               sum(cnt) OVER (PARTITION BY measure) AS n
        FROM hist
    ),
    qs AS (SELECT explode(array(500, 900, 990)) AS q_milli),
    pick AS (
        SELECT c.measure, q.q_milli, c.n,
               min(c.val) AS quantile_value
        FROM cum c JOIN qs q
          ON c.cum_cnt * 1000 >= q.q_milli * c.n
        GROUP BY c.measure, q.q_milli, c.n
    )
    SELECT measure, CAST(q_milli AS BIGINT) AS q_milli, CAST(n AS BIGINT) AS n,
           CAST(quantile_value AS BIGINT) AS quantile_value
    FROM pick ORDER BY measure, q_milli
    """


def exp_quantiles(spark, sf_dir):
    run_ab(
        spark,
        sf_dir,
        {
            "old": lambda: catalog.sql(spark, sf_dir, QUANT_OLD),
            "new": lambda: catalog.sql(spark, sf_dir, QUANT_NEW),
        },
    )


EXPERIMENTS = {
    "quantiles": exp_quantiles,
}


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"ab_{name}")
    print(f"experiment {name} @ {sf_dir}")
    EXPERIMENTS[name](spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
