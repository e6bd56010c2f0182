"""TPC-DS adaptation suite: every query must return rows (an empty-vs-empty
oracle match is vacuous — this guards the year/predicate calibration) and
match its DuckDB oracle (covered by test_registry_oracle)."""

from __future__ import annotations

import pytest

from sensql_presto_spark.queries import all_specs

TPCDS = sorted(n for n in all_specs() if n.startswith("tpcds_"))


def test_tranche_size():
    assert len(TPCDS) >= 30


@pytest.mark.parametrize("name", TPCDS)
def test_tpcds_nonempty(name, spark, oracle_dir):
    df = all_specs()[name].build(spark, oracle_dir)
    assert df.count() > 0
