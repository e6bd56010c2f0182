"""Source/sink format coverage beyond parquet (SURVEY.md §2.1 — the
reference's connector SPI reads ORC/CSV/JSON/RCFile via presto-hive and
presto-orc; this engine covers the same formats through Spark's built-in
datasources).

Each query writes a slice of the catalog to the format under
``spark-warehouse/`` (repo-local, snapshot-overwritten per run) and reads
it back; the oracle recomputes the same slice from the original parquet —
so a lossy or misconfigured writer/reader breaks the value hash. CSV
exercises the header/schema-inference path, JSON the schemaless line
format, ORC the columnar path with predicate pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensql_presto_spark import catalog
from sensql_presto_spark.queries.registry import register

_DIR = "spark-warehouse"

_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM customer WHERE c_custkey < 200
ORDER BY c_custkey
"""


def _slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog.table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        .filter(F.col("c_custkey") < 200)
    )


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, **read_opts) -> DataFrame:
    path = os.path.join(_DIR, f"source_{fmt}_demo")
    df = _slice(spark, sf_dir)
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    reader = spark.read.format(fmt)
    for k, v in read_opts.items():
        reader = reader.option(k, v)
    out = reader.load(path)
    # CSV/JSON types surface as read: cast back to the catalog schema so
    # the comparison checks values, not inference artifacts.
    out = out.select(
        F.col("c_custkey").cast("long"),
        F.col("c_name").cast("string"),
        F.col("c_nationkey").cast("int"),
        F.col("c_acctbal").cast("double"),
    )
    return out.orderBy("c_custkey")


@register(
    "source_csv_roundtrip",
    oracle=_ORACLE,
    tags=("sources", "csv"),
    doc="CSV sink+source with header + schema inference (presto-hive CSV "
    "serde parity); values must survive the text round trip.",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "csv", header="true", inferSchema="true")


@register(
    "source_json_roundtrip",
    oracle=_ORACLE,
    tags=("sources", "json"),
    doc="JSON-lines sink+source (presto-hive JSON serde parity).",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "json")


@register(
    "source_orc_roundtrip",
    oracle=_ORACLE,
    tags=("sources", "orc"),
    doc="ORC sink+source (presto-orc parity: columnar, predicate pushdown).",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "orc")
