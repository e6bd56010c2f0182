"""sensql_presto_spark — a PySpark-native analytics engine.

A from-scratch engine with the query capabilities of the reference
``matthew-sanchez/sensql-presto`` (a PrestoDB fork with a SenSQL sensor-data
federation layer; see SURVEY.md). Spark SQL + Catalyst supply the
parser/optimizer/executor; this package supplies:

- session bootstrap tuned for OLAP (``session``),
- table catalog over the parquet testdata (``catalog``),
- the query registry that ties every supported operator to a
  DuckDB-oracle-checkable query (``queries``),
- the Presto function-surface compatibility layer (``functions``),
- large-scale data-pipeline operators: dedup, similarity search, text
  analysis, multimodal plumbing (``operators``),
- the SenSQL federation rewrite (``sensql``),
- Structured Streaming extensions over the events table (``streaming``).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy so `import sensql_presto_spark` stays free of a Spark dependency
    if name == "Engine":
        from sensql_presto_spark.engine import Engine

        return Engine
    raise AttributeError(name)
