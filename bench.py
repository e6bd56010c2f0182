"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Mirrors the reference's benchto protocol (BASELINE.md: runs=6, prewarm=2,
CBO/AQE on) scaled down: per query, `prewarm` untimed runs then `runs` timed
runs; the reported figure is the median. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # runs=6: matches the benchto protocol (tpch.yaml runs=6); round-2
    # showed sub-second queries moving ~2x between rounds on n<=3 samples —
    # medians over 6 pin per-query deltas to real plan changes, not timer
    # noise.
    runs = int(os.environ.get("BENCH_RUNS", "6"))
    # 2 untimed runs (the benchto protocol's prewarm): the first execution
    # of a query pays JIT + whole-stage-codegen compilation, which belongs
    # to neither engine's steady-state throughput.
    prewarm = int(os.environ.get("BENCH_PREWARM", "2"))

    from sensql_presto_spark.queries import all_specs
    from sensql_presto_spark.session import get_spark

    spark = get_spark(app_name="sensql_bench")

    # Host-speed calibration: a fixed, data-independent Spark job. The
    # host's effective speed shifts between runs (measured 2.6x within an
    # hour on 2026-08-14 with identical plans — co-tenant contention), so
    # absolute seconds are only comparable after dividing by this number.
    def calibrate() -> float:
        spark.range(50_000_000).selectExpr("sum(id * 3 + 1)").collect()  # warm
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id * 3 + 1)").collect()
        return round(time.perf_counter() - t0, 4)

    calib = calibrate()

    specs = {n: s for n, s in all_specs().items() if s.bench}
    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        for _ in range(prewarm):
            spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            # build INSIDE the timed region: builders may do eager work
            # (e.g. dedup_minhash_lsh's localCheckpoint), which must count.
            t0 = time.perf_counter()
            # noop sink executes the full plan without driver materialization
            # (the reference's DevNullOperator, SURVEY §2.1).
            spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "tpch_like_median_total",
                "value": total,
                "unit": "sec",
                "calibration_sec": calib,
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
