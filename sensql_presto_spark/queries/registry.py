"""Query registry — the single source of truth for the engine's surface.

Every operator/function/capability from SURVEY.md §2 that this engine
supports is declared here as a named query with (a) a Spark builder
``(spark, sf_dir) -> DataFrame`` and (b), where the semantics are
deterministic and SQL-expressible, an equivalent ANSI-SQL oracle string for
DuckDB. ``__spark_entry__.py``, the pytest suite, and ``bench.py`` all
derive from this registry, so the driver contract and the tests can't
drift apart.

This mirrors the reference's differential-oracle test strategy
(SURVEY.md §5.2: ``QueryAssertions.assertQuery`` against H2) with DuckDB
playing H2's role.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}

# Submodules that populate the registry on import.
_QUERY_MODULES = (
    "sensql_presto_spark.queries.tpch",
    "sensql_presto_spark.queries.tpcds",
    "sensql_presto_spark.queries.tpcds2",
    "sensql_presto_spark.queries.tpcds3",
    "sensql_presto_spark.queries.relational",
    "sensql_presto_spark.queries.functions_suite",
    "sensql_presto_spark.queries.aggregates_suite",
    "sensql_presto_spark.queries.sketches_suite",
    "sensql_presto_spark.queries.pipeline",
    "sensql_presto_spark.queries.events_suite",
    "sensql_presto_spark.queries.sensql_suite",
    "sensql_presto_spark.queries.mutation_suite",
    "sensql_presto_spark.queries.sources_suite",
)

_loaded = False


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""), bench=bench
        )
        return fn

    return deco


def _load() -> None:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]


def names(tag: str | None = None) -> list[str]:
    _load()
    if tag is None:
        return sorted(_REGISTRY)
    return sorted(n for n, s in _REGISTRY.items() if tag in s.tags)
