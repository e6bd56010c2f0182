from sensql_presto_spark.queries.registry import QuerySpec, all_specs, get, names, register

__all__ = ["QuerySpec", "all_specs", "get", "names", "register"]
