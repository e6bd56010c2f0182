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
    fixture shape is the containment region. st_point is a codegen'd SQL
    temp function; st_contains is an Arrow-batched pandas UDF
    (functions/geospatial.py) — no row-at-a-time Python in the plan
    (asserted by tests/test_plans.py).
    """
    from sensql_presto_spark.functions.geospatial import register_geospatial

    register_geospatial(spark)
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


@register(
    "geo_st_functions",
    oracle="""
    WITH g AS (
        SELECT c_custkey,
               (c_custkey % 20)::DOUBLE AS x0, (c_nationkey % 10)::DOUBLE AS y0,
               (3 + c_custkey % 5)::DOUBLE AS w, (2 + c_nationkey % 3)::DOUBLE AS h,
               ((c_custkey % 120) - 60 + 0.5)::DOUBLE AS lat,
               ((c_custkey % 360) - 180 + 0.5)::DOUBLE AS lon
        FROM customer WHERE c_custkey < 100
    )
    SELECT c_custkey,
           w * h AS area,
           2 * (w + h) AS perimeter,
           x0 + w / 2 AS centroid_x,
           y0 + h / 2 AS centroid_y,
           4 AS n_points,
           TRUE AS contains_inner,
           TRUE AS envelope_is_self,
           round(sqrt(w * w + h * h), 6) AS diag_dist,
           least(CAST(pow(2, 10) AS BIGINT) - 1,
                 greatest(0, CAST(floor((lon + 180.0) / 360.0 * pow(2, 10)) AS BIGINT))) AS tile_x,
           least(CAST(pow(2, 10) AS BIGINT) - 1,
                 greatest(0, CAST(floor(
                     (0.5 - ln((1.0 + sin(radians(lat))) / (1.0 - sin(radians(lat))))
                      / (4.0 * pi())) * pow(2, 10)) AS BIGINT))) AS tile_y,
           10 AS quadkey_len
    FROM g
    ORDER BY c_custkey
    """,
    tags=("sensql", "geospatial"),
    doc="ST_* surface (area/perimeter/centroid/envelope/contains/distance/"
    "num_points + Bing tiles): pandas-UDF geometry vs closed-form oracle on "
    "synthesized rectangles.",
)
def geo_st_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the widened in-engine geospatial surface end-to-end.

    Rectangles are synthesized from customer keys, so every ST_ output has
    a closed arithmetic form the DuckDB oracle computes without any
    geometry library — the containment/envelope outputs reduce to TRUE and
    the centroid/area/perimeter to key arithmetic.
    """
    from sensql_presto_spark.functions.geospatial import register_geospatial

    register_geospatial(spark)
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH g AS (
            SELECT c_custkey,
                   cast(c_custkey % 20 AS DOUBLE) AS x0,
                   cast(c_nationkey % 10 AS DOUBLE) AS y0,
                   cast(3 + c_custkey % 5 AS DOUBLE) AS w,
                   cast(2 + c_nationkey % 3 AS DOUBLE) AS h,
                   cast((c_custkey % 120) - 60 + 0.5 AS DOUBLE) AS lat,
                   cast((c_custkey % 360) - 180 + 0.5 AS DOUBLE) AS lon
            FROM customer WHERE c_custkey < 100
        ),
        p AS (
            SELECT c_custkey, x0, y0, w, h, lat, lon,
                   concat('POLYGON ((', x0, ' ', y0, ', ', x0 + w, ' ', y0, ', ',
                          x0 + w, ' ', y0 + h, ', ', x0, ' ', y0 + h, '))') AS poly
            FROM g
        )
        SELECT c_custkey,
               st_area(poly) AS area,
               st_perimeter(poly) AS perimeter,
               st_x(st_centroid(poly)) AS centroid_x,
               st_y(st_centroid(poly)) AS centroid_y,
               st_num_points(poly) AS n_points,
               st_contains(poly, st_point(x0 + 1.0, y0 + 1.0)) AS contains_inner,
               (st_area(st_envelope(poly)) = st_area(poly)) AS envelope_is_self,
               round(st_distance(st_point(x0, y0), st_point(x0 + w, y0 + h)), 6) AS diag_dist,
               bing_tile_x_at(lon, 10) AS tile_x,
               bing_tile_y_at(lat, 10) AS tile_y,
               length(bing_tile_quadkey(bing_tile_x_at(lon, 10), bing_tile_y_at(lat, 10), 10)) AS quadkey_len
        FROM p
        ORDER BY c_custkey
        """
    )


@register(
    "geo_st_surface2",
    oracle="""
    WITH g AS (
        SELECT c_custkey,
               (c_custkey % 20)::DOUBLE AS x0, (c_nationkey % 10)::DOUBLE AS y0,
               (3 + c_custkey % 5)::DOUBLE AS w, (2 + c_nationkey % 3)::DOUBLE AS h,
               ((c_custkey % 120) - 60 + 0.5)::DOUBLE AS lat,
               ((c_custkey % 360) - 180 + 0.5)::DOUBLE AS lon
        FROM customer WHERE c_custkey < 100
    )
    SELECT c_custkey,
           x0 AS xmin, x0 + w AS xmax, y0 AS ymin, y0 + h AS ymax,
           'ST_Polygon' AS gtype, 2 AS gdim, FALSE AS gempty,
           round(w, 6) AS seg_len, FALSE AS seg_closed,
           round(2 * 6371.01 * asin(sqrt(
               pow(sin(radians(0.0) / 2), 2)
               + cos(radians(lat)) * cos(radians(lat))
                 * pow(sin(radians(1.0) / 2), 2))), 6) AS gc_km,
           TRUE AS quadkey_roundtrip,
           TRUE AS tile_poly_ok,
           TRUE AS hull_ok,
           TRUE AS buffer_ok,
           TRUE AS from_text_ok,
           TRUE AS disjoint_far
    FROM g
    ORDER BY c_custkey
    """,
    tags=("sensql", "geospatial"),
    doc="Second geospatial tranche (GeoFunctions.java accessors/predicates, "
    "SphericalGeoFunctions.java great-circle, BingTileFunctions.java "
    "quadkey inverse + tile polygon, ST_ConvexHull/ST_Buffer): closed-form "
    "oracle on synthesized rectangles; approximation families gated by "
    "error-bound booleans.",
)
def geo_st_surface2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercise the second geospatial tranche end-to-end."""
    from sensql_presto_spark.functions.geospatial import register_geospatial

    register_geospatial(spark)
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH g AS (
            SELECT c_custkey,
                   cast(c_custkey % 20 AS DOUBLE) AS x0,
                   cast(c_nationkey % 10 AS DOUBLE) AS y0,
                   cast(3 + c_custkey % 5 AS DOUBLE) AS w,
                   cast(2 + c_nationkey % 3 AS DOUBLE) AS h,
                   cast((c_custkey % 120) - 60 + 0.5 AS DOUBLE) AS lat,
                   cast((c_custkey % 360) - 180 + 0.5 AS DOUBLE) AS lon
            FROM customer WHERE c_custkey < 100
        ),
        p AS (
            SELECT c_custkey, x0, y0, w, h, lat, lon,
                   concat('POLYGON ((', x0, ' ', y0, ', ', x0 + w, ' ', y0, ', ',
                          x0 + w, ' ', y0 + h, ', ', x0, ' ', y0 + h, '))') AS poly,
                   concat('LINESTRING (', x0, ' ', y0, ', ', x0 + w, ' ', y0, ')') AS seg
            FROM g
        )
        SELECT c_custkey,
               st_xmin(poly) AS xmin, st_xmax(poly) AS xmax,
               st_ymin(poly) AS ymin, st_ymax(poly) AS ymax,
               st_geometry_type(poly) AS gtype,
               st_dimension(poly) AS gdim,
               st_is_empty(poly) AS gempty,
               round(st_length(seg), 6) AS seg_len,
               st_is_closed(seg) AS seg_closed,
               round(great_circle_distance(lat, lon, lat, lon + 1.0), 6) AS gc_km,
               bing_tile_x_from_quadkey(
                   bing_tile_quadkey(bing_tile_x_at(lon, 10), bing_tile_y_at(lat, 10), 10))
                   = bing_tile_x_at(lon, 10)
               AND bing_tile_y_from_quadkey(
                   bing_tile_quadkey(bing_tile_x_at(lon, 10), bing_tile_y_at(lat, 10), 10))
                   = bing_tile_y_at(lat, 10)
               AND bing_tile_zoom_level(
                   bing_tile_quadkey(bing_tile_x_at(lon, 10), bing_tile_y_at(lat, 10), 10)) = 10
                   AS quadkey_roundtrip,
               abs(st_xmin(bing_tile_polygon(bing_tile_x_at(lon, 10), bing_tile_y_at(lat, 10), 10))
                   - (bing_tile_x_at(lon, 10) / power(2, 10) * 360.0 - 180.0)) < 1e-9
                   AS tile_poly_ok,
               abs(st_area(st_convex_hull(poly)) - st_area(poly)) < 1e-9 AS hull_ok,
               abs(st_area(st_buffer(st_point(x0, y0), 2.0)) - pi() * 4.0) / (pi() * 4.0) < 0.03
                   AS buffer_ok,
               st_equals(poly, st_geometry_from_text(lower(poly))) AS from_text_ok,
               st_disjoint(poly, st_point(x0 + w + 100.0, y0)) AS disjoint_far
        FROM p
        ORDER BY c_custkey
        """
    )


@register(
    "geo_st_accessors",
    oracle="""
    WITH g AS (
        SELECT c_custkey,
               (c_custkey % 20)::DOUBLE AS x0, (c_nationkey % 10)::DOUBLE AS y0,
               (3 + c_custkey % 5)::DOUBLE AS w
        FROM customer WHERE c_custkey < 60
    )
    SELECT c_custkey,
           'POINT (' || x0 || ' ' || y0 || ')' AS start_pt,
           'POINT (' || (x0 + w) || ' ' || (y0 + 1.0) || ')' AS end_pt,
           'POINT (' || (x0 + w) || ' ' || y0 || ')' AS second_pt,
           TRUE AS line_ctor_ok, TRUE AS poly_ctor_rejects, TRUE AS boundary_ok,
           1 AS n_geoms, 3 AS n_multi,
           TRUE AS ext_ring_ok, 0 AS n_int_ring,
           TRUE AS valid_ok, TRUE AS simple_ok, FALSE AS open_line_is_ring,
           'MULTIPOINT (' || x0 || ' ' || y0 || ', ' || (x0 + w) || ' ' || y0
               || ', ' || (x0 + w) || ' ' || (y0 + 1.0) || ')' AS pts,
           TRUE AS geom_n_ok, 9 AS tiles_around_n, TRUE AS g2bt_ok
    FROM g ORDER BY c_custkey
    """,
    tags=("sensql", "geospatial"),
    doc="Vertex accessors + typed constructors + boundary (GeoFunctions.java "
    "ST_StartPoint/ST_EndPoint/ST_PointN/ST_LineFromText/ST_Polygon/"
    "ST_Boundary/ST_NumGeometries) with closed-form oracle.",
)
def geo_st_accessors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sensql_presto_spark.functions.geospatial import register_geospatial

    register_geospatial(spark)
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH g AS (
            SELECT c_custkey,
                   cast(c_custkey % 20 AS DOUBLE) AS x0,
                   cast(c_nationkey % 10 AS DOUBLE) AS y0,
                   cast(3 + c_custkey % 5 AS DOUBLE) AS w
            FROM customer WHERE c_custkey < 60
        ),
        p AS (
            SELECT c_custkey, x0, y0, w,
                   concat('LINESTRING (', x0, ' ', y0, ', ', x0 + w, ' ', y0, ', ',
                          x0 + w, ' ', y0 + 1.0, ')') AS line
            FROM g
        )
        SELECT c_custkey,
               st_start_point(line) AS start_pt,
               st_end_point(line) AS end_pt,
               st_point_n(line, 2) AS second_pt,
               st_line_from_text(line) = line AS line_ctor_ok,
               st_polygon(line) IS NULL AS poly_ctor_rejects,
               st_boundary(concat('POLYGON ((', x0, ' ', y0, ', ', x0 + w, ' ', y0, ', ',
                                  x0, ' ', y0 + 1.0, '))'))
                   = concat('LINESTRING (', x0, ' ', y0, ', ', x0 + w, ' ', y0, ', ',
                            x0, ' ', y0 + 1.0, ')') AS boundary_ok,
               st_num_geometries(line) AS n_geoms,
               st_num_geometries(concat('MULTIPOINT (1 2, 3 4, 5 6)')) AS n_multi,
               st_exterior_ring(concat('POLYGON ((', x0, ' ', y0, ', ', x0 + w, ' ', y0, ', ',
                                       x0, ' ', y0 + 1.0, '))'))
                   = concat('LINESTRING (', x0, ' ', y0, ', ', x0 + w, ' ', y0, ', ',
                            x0, ' ', y0 + 1.0, ')') AS ext_ring_ok,
               st_num_interior_ring(concat('POLYGON ((', x0, ' ', y0, ', ', x0 + w, ' ', y0, ', ',
                                           x0, ' ', y0 + 1.0, '))')) AS n_int_ring,
               st_is_valid(line) AS valid_ok,
               st_is_simple(line) AS simple_ok,
               st_is_ring(line) AS open_line_is_ring,
               st_points(line) AS pts,
               st_geometry_n(line, 1) = line AS geom_n_ok,
               size(bing_tiles_around(45.3, 7.7, 10)) AS tiles_around_n,
               size(geometry_to_bing_tiles(
                   concat('POLYGON ((', x0, ' ', y0, ', ', x0 + w, ' ', y0, ', ',
                          x0 + w, ' ', y0 + 1.0, ', ', x0, ' ', y0 + 1.0, '))'), 8))
                   BETWEEN 1 AND 64 AS g2bt_ok
        FROM p
        ORDER BY c_custkey
        """
    )
