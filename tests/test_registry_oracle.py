"""Differential oracle over the whole query registry (SURVEY.md §5.2 pattern).

Every registered query with an oracle is executed on Spark and on DuckDB at
sf0.01 and compared (order-insensitive, float-tolerant) — the same check the
driver's CORRECTNESS gate performs. Oracle-less queries get a smoke run.
"""

from __future__ import annotations

import pytest

from sensql_presto_spark.queries import all_specs
from sensql_presto_spark.testing import check_query_against_oracle

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, oracle_dir):
    spec = SPECS[name]
    df = spec.build(spark, oracle_dir)
    if spec.oracle is None:
        # rows-only smoke: plan executes, schema is stable
        assert df.count() >= 0
        assert df.schema is not None
    else:
        check_query_against_oracle(df, spec.oracle, oracle_dir)
