"""Smoke tests for the driver contract in __spark_entry__.py."""

from __future__ import annotations

import importlib.util
import sys


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 10


def test_queries_and_oracles_consistent():
    mod = _load_entry()
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
