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
