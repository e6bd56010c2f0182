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


def test_fail_scalar_raises_user_error(spark):
    """FailureFunction.java fail(message) — explicit user-raised error."""
    register_all(spark)
    with pytest.raises(Exception, match="boom"):
        spark.sql("SELECT fail('boom')").collect()


def test_split_to_map_duplicate_keys_raise(spark):
    """StringFunctions.java splitToMap raises 'Duplicate keys' — Spark's
    map_from_entries has the same contract under the default
    spark.sql.mapKeyDedupPolicy=EXCEPTION."""
    register_all(spark)
    with pytest.raises(Exception, match="[Dd]uplicate"):
        spark.sql("SELECT split_to_map('a=1,a=2', ',', '=')").collect()


def test_split_to_map_missing_delimiter_raises(spark):
    """StringFunctions.java splitToMap: an entry without the key-value
    delimiter (or with more than one) raises INVALID_FUNCTION_ARGUMENT
    ('Key-value delimiter must appear exactly once in each entry'), never
    maps the entry to key->NULL."""
    register_all(spark)
    with pytest.raises(Exception, match="exactly once"):
        spark.sql("SELECT split_to_map('a=1,b', ',', '=')").collect()
    with pytest.raises(Exception, match="exactly once"):
        spark.sql("SELECT split_to_map('a=1=2', ',', '=')").collect()


def test_split_to_map_regex_metachar_delimiters_are_literal(spark):
    """Presto delimiters are literal strings; the shim \\Q-quotes them so
    regex metacharacters like '|' and '.' split literally."""
    register_all(spark)
    row = spark.sql(
        "SELECT split_to_map('a.b=1|c=2', '|', '=') AS m"
    ).collect()[0]
    assert row.m == {"a.b": "1", "c": "2"}


def test_array_duplicates_multi_null_contract(spark):
    """ArraySqlFunctions.java:82 — more than one NULL contributes a single
    NULL entry; a single NULL does not."""
    register_all(spark)
    row = spark.sql(
        "SELECT array_duplicates(array('a', NULL, NULL, 'a', 'b')) AS two_nulls, "
        "array_duplicates(array('a', NULL, 'b')) AS one_null"
    ).collect()[0]
    assert row.two_nulls == [None, "a"] and row.one_null == []


def test_iso_date_parts_match_reference_semantics(spark):
    """day_of_week is ISO Mon=1..Sun=7; year_of_week is the ISO
    week-numbering year (2021-01-01 belongs to 2020-W53)."""
    register_all(spark)
    row = spark.sql(
        "SELECT day_of_week(DATE'2026-08-16') AS sunday, "
        "day_of_week(DATE'2026-08-10') AS monday, "
        "week(DATE'2021-01-01') AS w, year_of_week(DATE'2021-01-01') AS yw, "
        "week(DATE'2020-12-31') AS w2, year_of_week(DATE'2020-12-31') AS yw2"
    ).collect()[0]
    assert (row.sunday, row.monday) == (7, 1)
    assert (row.w, row.yw) == (53, 2020)
    assert (row.w2, row.yw2) == (53, 2020)


def test_at_timezone_preserves_instant(spark):
    """at_timezone re-renders the same instant: converting the shifted
    wall-clock back from the target zone recovers the original."""
    register_all(spark)
    row = spark.sql(
        "SELECT to_utc_timestamp(at_timezone(TIMESTAMP'2026-01-01 12:00:00', "
        "'Asia/Kolkata'), 'Asia/Kolkata') AS back, "
        "to_utc_timestamp(TIMESTAMP'2026-01-01 12:00:00', current_timezone()) AS orig"
    ).collect()[0]
    assert row.back == row.orig


def test_secure_random_range_contract(spark):
    """MathFunctions.java secure_random(lower, upper): values land in
    [lower, upper); nondeterministic so never oracle-checked."""
    register_all(spark)
    rows = spark.sql(
        "SELECT secure_random(5.0, 6.0) AS r FROM range(100)"
    ).collect()
    vals = [r.r for r in rows]
    assert all(5.0 <= v < 6.0 for v in vals)
    assert len(set(vals)) > 1
