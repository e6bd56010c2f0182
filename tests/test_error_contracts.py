"""Error contracts mirrored from the reference (INVALID_FUNCTION_ARGUMENT
paths and NULL-vs-throw semantics noted in PRESTO_EQUIVALENTS)."""

from __future__ import annotations

import pytest

from sensql_presto_spark.functions import register_all


def test_hamming_distance_length_mismatch_raises(spark):
    """StringFunctions.java hammingDistance throws on length mismatch —
    the shim mirrors that instead of counting NULL-padded positions
    (round-1 advisor finding)."""
    register_all(spark)
    assert spark.sql("SELECT hamming_distance('abc', 'abd') AS h").collect()[0].h == 1
    with pytest.raises(Exception, match="same length"):
        spark.sql("SELECT hamming_distance('abc', 'abcd') AS h").collect()


def test_map_missing_key_null_via_try_element_at(spark):
    """Presto map subscript throws on a missing key; Spark ANSI element_at
    does too, and try_element_at is the documented NULL-returning path."""
    row = spark.sql(
        "SELECT try_element_at(map('a', 1), 'b') AS missing, "
        "try_element_at(map('a', 1), 'a') AS hit"
    ).collect()[0]
    assert row.missing is None and row.hit == 1


def test_division_by_zero_ansi_vs_try(spark):
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|Division by zero"):
        spark.sql("SELECT 1 / 0 AS x").collect()
    assert spark.sql("SELECT try_divide(1, 0) AS x").collect()[0].x is None


def test_registry_names_in_coverage_doc_exist():
    """Drift guard: every registry-shaped name cited in COVERAGE.md must
    actually exist in the registry."""
    import re

    from sensql_presto_spark.queries import all_specs

    specs = all_specs()
    prefixes = (
        "tpch_", "tpcds_", "fn_", "agg_", "dedup_", "sim_", "text_", "mm_",
        "events_", "sensql_", "geo_", "setop_", "window_", "scale_",
        "source_", "mutation_", "ddl_", "pipeline_", "prepared_",
    )
    cited = set()
    for m in re.finditer(r"`([a-z0-9_]+)`", open("COVERAGE.md").read()):
        name = m.group(1)
        if name.startswith(prefixes):
            cited.add(name)
    missing = sorted(n for n in cited if n not in specs)
    assert not missing, f"COVERAGE.md cites unknown registry entries: {missing}"


def test_combinations_full_reference_range_and_error(spark):
    """ArrayCombinationsFunction.java supports n in [0, 5] and raises above
    — previously n=4/5 silently returned empty (round-2 advisor finding)."""
    import math

    register_all(spark)
    for n in range(6):
        got = spark.sql(
            f"SELECT size(combinations(array('a','b','c','d','e','f'), {n})) AS s"
        ).collect()[0].s
        assert got == math.comb(6, n), (n, got)
    with pytest.raises(Exception, match="combinations argument n"):
        spark.sql("SELECT combinations(array('a'), 6) AS c").collect()


def test_ip_prefix_host_bits_masked(spark):
    """IpPrefixOperators.castFromVarcharToIpPrefix masks host bits — a
    prefix like 1.2.3.4/24 is valid input, not an error (round-2 advisor
    finding: strict=True raised inside the task)."""
    from sensql_presto_spark.functions.ip import register_ip_functions

    register_ip_functions(spark)
    row = spark.sql(
        "SELECT ip_subnet_min('1.2.3.4/24') AS lo, ip_subnet_max('1.2.3.4/24') AS hi, "
        "is_subnet_of('10.0.0.0/8', '10.1.2.3/16') AS sub"
    ).collect()[0]
    assert (row.lo, row.hi, row.sub) == ("1.2.3.0", "1.2.3.255", True)


def test_combinations_matches_itertools_in_bulk(spark):
    """combinations(a, n) must agree with itertools.combinations for every
    n in the reference's supported range [0, 5], checked for 60 random
    (array, n) cases in ONE Spark job (SQL-literal batch, no per-example
    session round trips)."""
    import itertools
    import random

    register_all(spark)
    rng = random.Random(20260814)
    cases = []
    for i in range(60):
        size = rng.randint(0, 8)
        arr = [f"e{rng.randint(0, 9)}_{j}" for j in range(size)]
        n = rng.randint(0, 5)
        cases.append((i, arr, n))
    selects = " UNION ALL ".join(
        f"SELECT {i} AS case_id, combinations(array({', '.join(repr(x) for x in arr)}), {n}) AS c"
        if arr
        else f"SELECT {i} AS case_id, combinations(cast(array() AS ARRAY<STRING>), {n}) AS c"
        for i, arr, n in cases
    )
    got = {r.case_id: r.c for r in spark.sql(selects).collect()}
    for i, arr, n in cases:
        expected = [list(c) for c in itertools.combinations(arr, n)] if n <= len(arr) else []
        if n == 0:
            expected = [[]]
        assert got[i] == expected, (i, arr, n, got[i], expected)
