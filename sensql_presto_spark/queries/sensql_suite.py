"""SenSQL federated queries as oracle-checked registry entries.

The fixture mirrors FIXTURES.md §4: four sensor nodes with square service
regions on a 40×10 grid, two named district shapes, and per-node
measurement catalogs sliced from the ``events`` table (user_id % 4 → node).
The geometry is chosen so the resolved node sets are knowable by
construction — 'downtown' spans nodes n0,n1 and 'uptown' spans n2,n3 —
which lets plain SQL over ``events`` serve as the DuckDB oracle for the
full federated path (rewrite → metadata resolution → UNION ALL fan-out →
residual query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensql_presto_spark import catalog
from sensql_presto_spark.queries.registry import register
from sensql_presto_spark.sensql import FederatedEngine, MetadataDB

NODES = [
    ("node_a", "POLYGON ((0 0, 10 0, 10 10, 0 10))"),
    ("node_b", "POLYGON ((10 0, 20 0, 20 10, 10 10))"),
    ("node_c", "POLYGON ((20 0, 30 0, 30 10, 20 10))"),
    ("node_d", "POLYGON ((30 0, 40 0, 40 10, 30 10))"),
]
SHAPES = [
    (1, "POLYGON ((5 5, 15 5, 15 8, 5 8))"),  # spans node_a, node_b
    (2, "POLYGON ((25 2, 38 2, 38 6, 25 6))"),  # spans node_c, node_d
    (3, "POLYGON ((21 1, 24 1, 24 4, 21 4))"),  # inside node_c only
]
FEATURES = [
    (1, "downtown", "district"),
    (2, "uptown", "district"),
    (3, "market", "poi"),
]

_NODE_INDEX = {name: i for i, (name, _) in enumerate(NODES)}


def build_engine(spark: SparkSession, sf_dir: str) -> FederatedEngine:
    """Federated engine over fixture metadata + event-derived node slices."""
    metadata = MetadataDB(NODES, SHAPES, FEATURES)

    def node_slice(name: str):
        def build() -> DataFrame:
            ev = catalog.table(spark, sf_dir, "events")
            return ev.where(F.col("user_id") % 4 == _NODE_INDEX[name]).select(
                F.lit(name).alias("node_id"),
                "ts",
                F.col("event_type").alias("sensor"),
                "value",
            )

        return build

    return FederatedEngine(spark, metadata, {name: node_slice(name) for name, _ in NODES})


@register(
    "sensql_federated_agg",
    oracle="""
    SELECT event_type AS sensor, count(*) AS n, round(sum(value), 4) AS sum_val
    FROM events
    WHERE user_id % 4 IN (0, 1) AND value > 50
    GROUP BY 1 ORDER BY sensor
    """,
    tags=("sensql", "federation"),
    doc="Full federated path: spatial metadata resolution -> 2-node UNION ALL -> residual agg.",
)
def sensql_federated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'downtown' resolves to node_a+node_b == user_id%4 IN (0,1) by fixture design."""
    engine = build_engine(spark, sf_dir)
    return engine.sql(
        """
        SELECT sensor, count(*) AS n, round(sum(value), 4) AS sum_val
        FROM measurements, feature, shape
        WHERE st_intersects(shape.geometries, nodes.service_region)
          AND shape.id = feature.shape
          AND feature.name = 'downtown'
          AND measurements.value > 50
        GROUP BY sensor ORDER BY sensor
        """
    )


@register(
    "sensql_federated_single_node",
    oracle="""
    SELECT count(*) AS n, round(avg(value), 4) AS avg_val
    FROM events
    WHERE user_id % 4 = 2
    """,
    tags=("sensql", "federation"),
    doc="Single-catalog resolution ('market' poi lies inside node_c only); WHERE fully consumed.",
)
def sensql_federated_single_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    engine = build_engine(spark, sf_dir)
    return engine.sql(
        """
        SELECT count(*) AS n, round(avg(value), 4) AS avg_val
        FROM measurements, feature, shape
        WHERE st_intersects(shape.geometries, nodes.service_region)
          AND shape.id = feature.shape
          AND feature.name = 'market'
        """
    )


@register(
    "sensql_spatial_filter",
    oracle="""
    SELECT c_mktsegment, count(*) AS n
    FROM customer
    WHERE (c_custkey % 40) >= 5 AND (c_custkey % 40) <= 15
      AND (c_nationkey % 10) >= 5 AND (c_nationkey % 10) <= 8
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("sensql", "geospatial"),
    doc="In-Spark ST_* predicate surface (GeoFunctions.java parity names); "
    "oracle reduces st_contains on the rectangular fixture polygon to "
    "coordinate range checks.",
)
def sensql_spatial_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_contains/st_point as Spark SQL functions over synthesized coords.

    Points are derived deterministically from customer keys; the 'downtown'
    fixture shape is the containment region. Python-UDF slow path by
    design (metadata-scale geometry; SURVEY.md §2.3 spatial-join note).
    """
    from sensql_presto_spark.functions.udfs import register_geo_udfs

    register_geo_udfs(spark)
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer
        WHERE st_contains('POLYGON ((5 5, 15 5, 15 8, 5 8))',
                          st_point(cast(c_custkey % 40 AS double), cast(c_nationkey % 10 AS double)))
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )
