from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from sensql_presto_spark.session import get_spark

    spark = get_spark(app_name="sensql_tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def oracle_dir() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def smoke_dir() -> str:
    return SF_SMOKE
