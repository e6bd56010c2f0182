"""Geospatial function surface (reference: presto-geospatial/.../GeoFunctions.java,
69 @ScalarFunction entries, and BingTileFunctions.java).

Two tiers, matching how each function family can actually run fast on
Spark:

1. **Pure-SQL temp functions** (Catalyst-inlined, whole-stage codegen —
   zero Python): constructors and coordinate math with closed forms —
   ``st_point`` (GeoFunctions.java ST_Point:180), point distance
   (ST_Distance:939 for the point case), and the Bing tile family
   (BingTileFunctions.java: longitude/latitude -> tile x/y at a zoom,
   quadkey via bit interleave — all arithmetic, so it belongs JVM-side).

2. **Arrow-vectorized pandas UDFs** for WKT geometry operations that need
   real parsing (ST_Area:— shoelace, ST_Centroid, ST_Envelope,
   ST_Contains:1044, ST_Intersects:1101, ST_Within, perimeter, point
   count). Batch transfer via Arrow; the per-geometry work reuses
   ``sensql.geometry``'s pure-Python kernels. This replaces round-1's
   row-at-a-time ``spark.udf.register`` lambdas (the classic scale-killer
   the round-1 advisor flagged): same semantics, Arrow-batched transport.
   A shapely-backed fast path would slot in here unchanged (gated import —
   shapely is not in this container).

The metadata-plane DuckDB UDFs in ``sensql.geometry`` are unchanged —
row-Python is the right cost for the (small) node catalog; THIS module is
the in-engine surface for queries over fact tables.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sensql_presto_spark.sensql import geometry as G

# --- tier 1: codegen'd SQL temp functions -----------------------------------

_GEO_SQL_FUNCTIONS: tuple[str, ...] = (
    # ST_Point constructor as WKT (GeoFunctions.java:180). String-typed WKT
    # is the engine's geometry interchange format (SenSQL metadata plane
    # speaks the same).
    """CREATE OR REPLACE TEMPORARY FUNCTION st_point(x DOUBLE, y DOUBLE)
       RETURNS STRING RETURN concat('POINT (', cast(x AS STRING), ' ', cast(y AS STRING), ')')""",
    # Point-point euclidean distance on raw coordinates (the fast path —
    # no WKT round trip when coordinates are already columns).
    """CREATE OR REPLACE TEMPORARY FUNCTION st_distance_points(
           x1 DOUBLE, y1 DOUBLE, x2 DOUBLE, y2 DOUBLE)
       RETURNS DOUBLE RETURN sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))""",
    # Bing tile x at (longitude, zoom): floor((lon+180)/360 * 2^zoom),
    # clamped to the tile range (BingTileFunctions.java longitudeToTileX).
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_x_at(lon DOUBLE, zoom INT)
       RETURNS BIGINT RETURN
       least(cast(power(2, zoom) AS BIGINT) - 1,
             greatest(0L, cast(floor((lon + 180.0) / 360.0 * power(2, zoom)) AS BIGINT)))""",
    # Bing tile y at (latitude, zoom): Web-Mercator projection.
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_y_at(lat DOUBLE, zoom INT)
       RETURNS BIGINT RETURN
       least(cast(power(2, zoom) AS BIGINT) - 1,
             greatest(0L, cast(floor(
                 (0.5 - ln((1.0 + sin(radians(lat))) / (1.0 - sin(radians(lat))))
                  / (4.0 * pi())) * power(2, zoom)) AS BIGINT)))""",
    # Quadkey: zoom base-4 digits, MSB first — digit i is the interleave of
    # tile-x and tile-y bits (BingTileFunctions.java toQuadKey). Expressed
    # as transform over a sequence: pure Catalyst, no UDF.
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_quadkey(x BIGINT, y BIGINT, zoom INT)
       RETURNS STRING RETURN
       concat_ws('', transform(sequence(zoom, 1, -1),
           i -> cast((shiftright(x, i - 1) & 1) + 2 * (shiftright(y, i - 1) & 1) AS STRING)))""",
    # Inverse quadkey -> tile x / tile y / zoom (BingTileFunctions.java
    # fromQuadKey): fold the base-4 digits; bit 0 is x, bit 1 is y.
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_x_from_quadkey(qk STRING)
       RETURNS BIGINT RETURN
       aggregate(sequence(1, length(qk)), 0L,
           (acc, i) -> acc * 2 + cast(substring(qk, i, 1) AS BIGINT) % 2)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_y_from_quadkey(qk STRING)
       RETURNS BIGINT RETURN
       aggregate(sequence(1, length(qk)), 0L,
           (acc, i) -> acc * 2 + cast(cast(substring(qk, i, 1) AS BIGINT) / 2 AS BIGINT))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_zoom_level(qk STRING)
       RETURNS INT RETURN length(qk)""",
    # Tile -> WKT envelope (BingTileFunctions.java tileToEnvelope): inverse
    # Web-Mercator. Pure math, codegen'd.
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_polygon(x BIGINT, y BIGINT, zoom INT)
       RETURNS STRING RETURN
       concat('POLYGON ((',
           cast(x / power(2, zoom) * 360.0 - 180.0 AS STRING), ' ',
           cast(degrees(atan(sinh(pi() * (1 - 2 * (y + 1) / power(2, zoom))))) AS STRING), ', ',
           cast((x + 1) / power(2, zoom) * 360.0 - 180.0 AS STRING), ' ',
           cast(degrees(atan(sinh(pi() * (1 - 2 * (y + 1) / power(2, zoom))))) AS STRING), ', ',
           cast((x + 1) / power(2, zoom) * 360.0 - 180.0 AS STRING), ' ',
           cast(degrees(atan(sinh(pi() * (1 - 2 * y / power(2, zoom))))) AS STRING), ', ',
           cast(x / power(2, zoom) * 360.0 - 180.0 AS STRING), ' ',
           cast(degrees(atan(sinh(pi() * (1 - 2 * y / power(2, zoom))))) AS STRING), '))')""",
    # Great-circle distance in km (SphericalGeoFunctions.java:
    # ST_Distance on SphericalGeography), haversine form.
    """CREATE OR REPLACE TEMPORARY FUNCTION great_circle_distance(
           lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE)
       RETURNS DOUBLE RETURN
       2 * 6371.01 * asin(sqrt(
           power(sin(radians(lat2 - lat1) / 2), 2)
           + cos(radians(lat1)) * cos(radians(lat2))
             * power(sin(radians(lon2 - lon1) / 2), 2)))""",
    # WKT coordinate accessors as pure SQL: extract the numeric pairs with
    # regexp_extract_all, fold with HOFs — whole-stage codegen, no Python.
    """CREATE OR REPLACE TEMPORARY FUNCTION st_xs(wkt STRING)
       RETURNS ARRAY<DOUBLE> RETURN
       transform(regexp_extract_all(wkt, '(-?[0-9]+\\\\.?[0-9]*) -?[0-9]+\\\\.?[0-9]*', 1),
                 v -> cast(v AS DOUBLE))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_ys(wkt STRING)
       RETURNS ARRAY<DOUBLE> RETURN
       transform(regexp_extract_all(wkt, '-?[0-9]+\\\\.?[0-9]* (-?[0-9]+\\\\.?[0-9]*)', 1),
                 v -> cast(v AS DOUBLE))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_xmin(wkt STRING)
       RETURNS DOUBLE RETURN array_min(st_xs(wkt))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_xmax(wkt STRING)
       RETURNS DOUBLE RETURN array_max(st_xs(wkt))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_ymin(wkt STRING)
       RETURNS DOUBLE RETURN array_min(st_ys(wkt))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_ymax(wkt STRING)
       RETURNS DOUBLE RETURN array_max(st_ys(wkt))""",
    # Type/dimension probes (GeoFunctions.java ST_GeometryType,
    # ST_Dimension, ST_CoordDim, ST_IsEmpty, ST_IsClosed).
    """CREATE OR REPLACE TEMPORARY FUNCTION st_geometry_type(wkt STRING)
       RETURNS STRING RETURN
       CASE WHEN wkt LIKE 'POINT%' THEN 'ST_Point'
            WHEN wkt LIKE 'LINESTRING%' THEN 'ST_LineString'
            WHEN wkt LIKE 'POLYGON%' THEN 'ST_Polygon'
            WHEN wkt LIKE 'MULTIPOINT%' THEN 'ST_MultiPoint'
            ELSE 'ST_Geometry' END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_dimension(wkt STRING)
       RETURNS INT RETURN
       CASE WHEN wkt LIKE 'POINT%' OR wkt LIKE 'MULTIPOINT%' THEN 0
            WHEN wkt LIKE 'LINESTRING%' THEN 1
            WHEN wkt LIKE 'POLYGON%' THEN 2 END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_coorddim(wkt STRING)
       RETURNS INT RETURN 2""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_is_empty(wkt STRING)
       RETURNS BOOLEAN RETURN wkt LIKE '%EMPTY%' OR size(st_xs(wkt)) = 0""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_is_closed(wkt STRING)
       RETURNS BOOLEAN RETURN
       size(st_xs(wkt)) > 1
       AND element_at(st_xs(wkt), 1) = element_at(st_xs(wkt), -1)
       AND element_at(st_ys(wkt), 1) = element_at(st_ys(wkt), -1)""",
    # Linestring length: fold consecutive-point distances (ST_Length:—).
    """CREATE OR REPLACE TEMPORARY FUNCTION st_length(wkt STRING)
       RETURNS DOUBLE RETURN
       CASE WHEN wkt LIKE 'LINESTRING%' THEN
           aggregate(sequence(1, size(st_xs(wkt)) - 1), cast(0 AS DOUBLE),
               (acc, i) -> acc + sqrt(
                   power(element_at(st_xs(wkt), i + 1) - element_at(st_xs(wkt), i), 2)
                   + power(element_at(st_ys(wkt), i + 1) - element_at(st_ys(wkt), i), 2)))
           ELSE 0.0 END""",
    # Disjoint / equals as compositions (ST_Disjoint, ST_Equals).
    """CREATE OR REPLACE TEMPORARY FUNCTION st_equals(a STRING, b STRING)
       RETURNS BOOLEAN RETURN
       regexp_replace(upper(a), '\\\\s+', ' ') = regexp_replace(upper(b), '\\\\s+', ' ')""",
    # WKT normalization in/out (ST_GeometryFromText, ST_AsText): the engine's
    # interchange format IS WKT, so these normalize casing/whitespace.
    """CREATE OR REPLACE TEMPORARY FUNCTION st_geometry_from_text(wkt STRING)
       RETURNS STRING RETURN regexp_replace(upper(trim(wkt)), '\\\\s+', ' ')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_astext(g STRING)
       RETURNS STRING RETURN g""",
    # Vertex accessors (GeoFunctions.java ST_StartPoint, ST_EndPoint,
    # ST_PointN, ST_InteriorRingN-free subset): n is 1-based like Presto.
    """CREATE OR REPLACE TEMPORARY FUNCTION st_point_n(wkt STRING, n INT)
       RETURNS STRING RETURN
       CASE WHEN n BETWEEN 1 AND size(st_xs(wkt))
            THEN concat('POINT (', cast(element_at(st_xs(wkt), n) AS STRING), ' ',
                        cast(element_at(st_ys(wkt), n) AS STRING), ')') END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_start_point(wkt STRING)
       RETURNS STRING RETURN st_point_n(wkt, 1)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_end_point(wkt STRING)
       RETURNS STRING RETURN st_point_n(wkt, size(st_xs(wkt)))""",
    # Typed constructors = validated normalization (ST_LineFromText,
    # ST_Polygon): reject mismatched WKT kinds with NULL, Presto-style cast
    # semantics under TRY.
    """CREATE OR REPLACE TEMPORARY FUNCTION st_line_from_text(wkt STRING)
       RETURNS STRING RETURN
       CASE WHEN upper(trim(wkt)) LIKE 'LINESTRING%'
            THEN regexp_replace(upper(trim(wkt)), '\\\\s+', ' ') END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_polygon(wkt STRING)
       RETURNS STRING RETURN
       CASE WHEN upper(trim(wkt)) LIKE 'POLYGON%'
            THEN regexp_replace(upper(trim(wkt)), '\\\\s+', ' ') END""",
    # ST_Boundary of a polygon ring = its exterior LINESTRING.
    """CREATE OR REPLACE TEMPORARY FUNCTION st_boundary(wkt STRING)
       RETURNS STRING RETURN
       CASE WHEN wkt LIKE 'POLYGON%'
            THEN concat('LINESTRING (', regexp_extract(wkt, '\\\\(\\\\((.*)\\\\)\\\\)', 1), ')')
            WHEN wkt LIKE 'LINESTRING%' THEN
                concat('MULTIPOINT (', cast(element_at(st_xs(wkt), 1) AS STRING), ' ',
                       cast(element_at(st_ys(wkt), 1) AS STRING), ', ',
                       cast(element_at(st_xs(wkt), -1) AS STRING), ' ',
                       cast(element_at(st_ys(wkt), -1) AS STRING), ')') END""",
    # ST_NumGeometries: 1 for simple kinds, member count for MULTIPOINT.
    """CREATE OR REPLACE TEMPORARY FUNCTION st_num_geometries(wkt STRING)
       RETURNS INT RETURN
       CASE WHEN wkt LIKE 'MULTIPOINT%' THEN size(st_xs(wkt))
            WHEN wkt LIKE '%EMPTY%' THEN 0 ELSE 1 END""",
    # Ring accessors for single-ring polygons (the engine's polygon model;
    # GeoFunctions.java ST_ExteriorRing, ST_NumInteriorRing).
    """CREATE OR REPLACE TEMPORARY FUNCTION st_exterior_ring(wkt STRING)
       RETURNS STRING RETURN
       CASE WHEN wkt LIKE 'POLYGON%'
            THEN concat('LINESTRING (', regexp_extract(wkt, '\\\\(\\\\((.*)\\\\)\\\\)', 1), ')') END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_num_interior_ring(wkt STRING)
       RETURNS INT RETURN CASE WHEN wkt LIKE 'POLYGON%' THEN 0 END""",
    # Validity/simplicity for the supported WKT kinds: parseable, paired
    # coordinates, non-empty (ST_IsValid, ST_IsSimple, ST_IsRing).
    """CREATE OR REPLACE TEMPORARY FUNCTION st_is_valid(wkt STRING)
       RETURNS BOOLEAN RETURN
       size(st_xs(wkt)) = size(st_ys(wkt)) AND size(st_xs(wkt)) > 0""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_is_simple(wkt STRING)
       RETURNS BOOLEAN RETURN
       st_is_valid(wkt) AND (NOT wkt LIKE 'LINESTRING%'
           OR size(array_distinct(arrays_zip(st_xs(wkt), st_ys(wkt))))
              >= size(st_xs(wkt)) - 1)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION st_is_ring(wkt STRING)
       RETURNS BOOLEAN RETURN st_is_closed(wkt) AND st_is_simple(wkt)""",
    # ST_Points: the vertex set as MULTIPOINT.
    """CREATE OR REPLACE TEMPORARY FUNCTION st_points(wkt STRING)
       RETURNS STRING RETURN
       concat('MULTIPOINT (',
              concat_ws(', ', transform(sequence(1, size(st_xs(wkt))),
                  i -> concat(cast(element_at(st_xs(wkt), i) AS STRING), ' ',
                              cast(element_at(st_ys(wkt), i) AS STRING)))), ')')""",
    # ST_GeometryN (1-based; MULTIPOINT members, else the geometry itself).
    """CREATE OR REPLACE TEMPORARY FUNCTION st_geometry_n(wkt STRING, n INT)
       RETURNS STRING RETURN
       CASE WHEN wkt LIKE 'MULTIPOINT%' THEN st_point_n(wkt, n)
            WHEN n = 1 THEN wkt END""",
    # bing_tiles_around: quadkeys of the 3x3 neighborhood, range-clamped
    # (BingTileFunctions.java bingTilesAround).
    # Helper: range-clamped quadkey (SQL-function inlining cannot pass a
    # LAMBDA variable into another SQL function, so the 3x3 neighborhood is
    # nine explicit calls — parameters and constants only).
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tile_quadkey_clamped(
           x BIGINT, y BIGINT, zoom INT) RETURNS STRING RETURN
       bing_tile_quadkey(
           least(cast(power(2, zoom) AS BIGINT) - 1, greatest(0L, x)),
           least(cast(power(2, zoom) AS BIGINT) - 1, greatest(0L, y)), zoom)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION bing_tiles_around(
           lat DOUBLE, lon DOUBLE, zoom INT) RETURNS ARRAY<STRING> RETURN
       array_distinct(array(
           bing_tile_quadkey_clamped(bing_tile_x_at(lon, zoom) - 1, bing_tile_y_at(lat, zoom) - 1, zoom),
           bing_tile_quadkey_clamped(bing_tile_x_at(lon, zoom),     bing_tile_y_at(lat, zoom) - 1, zoom),
           bing_tile_quadkey_clamped(bing_tile_x_at(lon, zoom) + 1, bing_tile_y_at(lat, zoom) - 1, zoom),
           bing_tile_quadkey_clamped(bing_tile_x_at(lon, zoom) - 1, bing_tile_y_at(lat, zoom),     zoom),
           bing_tile_quadkey_clamped(bing_tile_x_at(lon, zoom),     bing_tile_y_at(lat, zoom),     zoom),
           bing_tile_quadkey_clamped(bing_tile_x_at(lon, zoom) + 1, bing_tile_y_at(lat, zoom),     zoom),
           bing_tile_quadkey_clamped(bing_tile_x_at(lon, zoom) - 1, bing_tile_y_at(lat, zoom) + 1, zoom),
           bing_tile_quadkey_clamped(bing_tile_x_at(lon, zoom),     bing_tile_y_at(lat, zoom) + 1, zoom),
           bing_tile_quadkey_clamped(bing_tile_x_at(lon, zoom) + 1, bing_tile_y_at(lat, zoom) + 1, zoom)))""",
    # geometry_to_bing_tiles: tiles covering the geometry's envelope
    # (BingTileFunctions.java geometryToBingTiles; tile count is bounded by
    # the caller's zoom choice, exactly as in the reference).
    # Envelope tile cover: the quadkey bit-interleave is inlined in the
    # lambda body (a lambda variable cannot cross into a SQL function, but
    # plain nested-lambda capture is fine).
    """CREATE OR REPLACE TEMPORARY FUNCTION geometry_to_bing_tiles(
           wkt STRING, zoom INT) RETURNS ARRAY<STRING> RETURN
       transform(
           sequence(0,
               cast((bing_tile_x_at(st_xmax(wkt), zoom) - bing_tile_x_at(st_xmin(wkt), zoom) + 1)
                    * (bing_tile_y_at(st_ymin(wkt), zoom) - bing_tile_y_at(st_ymax(wkt), zoom) + 1)
                    AS INT) - 1),
           i -> concat_ws('', transform(sequence(zoom, 1, -1),
               j -> cast(
                   (shiftright(bing_tile_x_at(st_xmin(wkt), zoom)
                               + cast(i / cast(bing_tile_y_at(st_ymin(wkt), zoom)
                                               - bing_tile_y_at(st_ymax(wkt), zoom) + 1 AS INT)
                                      AS INT), j - 1) & 1)
                   + 2 * (shiftright(bing_tile_y_at(st_ymax(wkt), zoom)
                                     + i % cast(bing_tile_y_at(st_ymin(wkt), zoom)
                                                - bing_tile_y_at(st_ymax(wkt), zoom) + 1 AS INT),
                                     j - 1) & 1)
                   AS STRING))))""",
)


# --- tier 2: Arrow-vectorized WKT geometry UDFs ------------------------------


def _series(fn, *cols: pd.Series) -> pd.Series:
    return pd.Series([
        None if any(v is None for v in vals) else fn(*vals)
        for vals in zip(*cols)
    ])


def _area(wkt: str) -> float:
    kind, coords = G.parse_wkt(wkt)
    if kind != "POLYGON":
        return 0.0
    s = 0.0
    n = len(coords)
    for i in range(n):
        (x1, y1), (x2, y2) = coords[i], coords[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def _perimeter(wkt: str) -> float:
    kind, coords = G.parse_wkt(wkt)
    if kind != "POLYGON":
        return 0.0
    n = len(coords)
    return sum(math.dist(coords[i], coords[(i + 1) % n]) for i in range(n))


def _centroid(wkt: str) -> str:
    kind, coords = G.parse_wkt(wkt)
    if kind == "POINT":
        return wkt
    # area-weighted polygon centroid (shoelace form)
    a = cx = cy = 0.0
    n = len(coords)
    for i in range(n):
        (x1, y1), (x2, y2) = coords[i], coords[(i + 1) % n]
        cross = x1 * y2 - x2 * y1
        a += cross
        cx += (x1 + x2) * cross
        cy += (y1 + y2) * cross
    a /= 2.0
    if a == 0:
        cx, cy = coords[0]
        return f"POINT ({cx} {cy})"
    return f"POINT ({cx / (6 * a)} {cy / (6 * a)})"


def _envelope(wkt: str) -> str:
    _, coords = G.parse_wkt(wkt)
    xs, ys = [p[0] for p in coords], [p[1] for p in coords]
    x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
    return f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}))"


def _x(wkt: str) -> float:
    kind, coords = G.parse_wkt(wkt)
    return coords[0][0] if kind == "POINT" else None


def _y(wkt: str) -> float:
    kind, coords = G.parse_wkt(wkt)
    return coords[0][1] if kind == "POINT" else None


def _num_points(wkt: str) -> int:
    return len(G.parse_wkt(wkt)[1])


@F.pandas_udf(T.DoubleType())
def st_area(wkt: pd.Series) -> pd.Series:
    return _series(_area, wkt)


@F.pandas_udf(T.DoubleType())
def st_perimeter(wkt: pd.Series) -> pd.Series:
    return _series(_perimeter, wkt)


@F.pandas_udf(T.StringType())
def st_centroid(wkt: pd.Series) -> pd.Series:
    return _series(_centroid, wkt)


@F.pandas_udf(T.StringType())
def st_envelope(wkt: pd.Series) -> pd.Series:
    return _series(_envelope, wkt)


@F.pandas_udf(T.DoubleType())
def st_x(wkt: pd.Series) -> pd.Series:
    return _series(_x, wkt)


@F.pandas_udf(T.DoubleType())
def st_y(wkt: pd.Series) -> pd.Series:
    return _series(_y, wkt)


@F.pandas_udf(T.IntegerType())
def st_num_points(wkt: pd.Series) -> pd.Series:
    return _series(_num_points, wkt)


@F.pandas_udf(T.BooleanType())
def st_contains(outer: pd.Series, inner: pd.Series) -> pd.Series:
    return _series(G.st_contains, outer, inner)


@F.pandas_udf(T.BooleanType())
def st_within(inner: pd.Series, outer: pd.Series) -> pd.Series:
    return _series(lambda a, b: G.st_contains(b, a), inner, outer)


@F.pandas_udf(T.BooleanType())
def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
    return _series(G.st_intersects, a, b)


@F.pandas_udf(T.DoubleType())
def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    return _series(G.st_distance, a, b)


def _convex_hull(wkt: str) -> str:
    """Andrew monotone chain over the geometry's vertices (ST_ConvexHull)."""
    _, coords = G.parse_wkt(wkt)
    pts = sorted(set(coords))
    if len(pts) <= 2:
        return wkt

    def half(points):
        chain: list[tuple[float, float]] = []
        for p in points:
            while len(chain) >= 2 and (
                (chain[-1][0] - chain[-2][0]) * (p[1] - chain[-2][1])
                - (chain[-1][1] - chain[-2][1]) * (p[0] - chain[-2][0])
            ) <= 0:
                chain.pop()
            chain.append(p)
        return chain

    hull = half(pts)[:-1] + half(pts[::-1])[:-1]
    body = ", ".join(f"{x} {y}" for x, y in hull)
    return f"POLYGON (({body}))"


@F.pandas_udf(T.StringType())
def st_convex_hull(wkt: pd.Series) -> pd.Series:
    return _series(_convex_hull, wkt)


def _st_buffer(wkt: str, dist: float) -> str:
    """Point buffer as a 32-gon approximation (GeoFunctions.java ST_Buffer
    — full polygon buffering needs a geometry kernel; the point case covers
    the SenSQL radius-query pattern)."""
    kind, coords = G.parse_wkt(wkt)
    if kind != "POINT":
        raise NotImplementedError("st_buffer: only POINT geometries without shapely")
    dist = float(dist)  # DECIMAL literals arrive as decimal.Decimal
    x, y = coords[0]
    pts = ", ".join(
        f"{x + dist * math.cos(2 * math.pi * i / 32)} {y + dist * math.sin(2 * math.pi * i / 32)}"
        for i in range(33)
    )
    return f"POLYGON (({pts}))"


@F.pandas_udf(T.StringType())
def st_buffer(wkt: pd.Series, dist: pd.Series) -> pd.Series:
    return _series(_st_buffer, wkt, dist)


def register_geospatial(spark: SparkSession) -> None:
    """Install the full ST_*/bing surface (idempotent)."""
    for ddl in _GEO_SQL_FUNCTIONS:
        spark.sql(ddl)
    spark.udf.register("st_area", st_area)
    spark.udf.register("st_perimeter", st_perimeter)
    spark.udf.register("st_centroid", st_centroid)
    spark.udf.register("st_envelope", st_envelope)
    spark.udf.register("st_x", st_x)
    spark.udf.register("st_y", st_y)
    spark.udf.register("st_num_points", st_num_points)
    spark.udf.register("st_contains", st_contains)
    spark.udf.register("st_within", st_within)
    spark.udf.register("st_intersects", st_intersects)
    spark.udf.register("st_distance", st_distance)
    spark.udf.register("st_convex_hull", st_convex_hull)
    spark.udf.register("st_buffer", st_buffer)
    # st_disjoint composes on the SQL side AFTER the UDF registration so it
    # can reference st_intersects.
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION st_disjoint(a STRING, b STRING)
           RETURNS BOOLEAN RETURN NOT st_intersects(a, b)"""
    )
