"""Minimal WKT geometry for SenSQL metadata resolution.

The reference resolves spatial metadata predicates in PostGIS
(``SenSQLModule.java:134-146`` sends ``st_intersects(shape.geometries,
nodes.service_region)`` to the metadata DB); our metadata DB is DuckDB with
these pure-Python functions registered as UDFs. Only the surface SenSQL
metadata queries need: POINT / POLYGON WKT, intersects / contains /
distance. This is metadata-plane code — it runs over the (small) node
catalog, never over measurement data, so pure Python is the right cost.
"""

from __future__ import annotations

import math
import re

Point = tuple[float, float]
Polygon = list[Point]

_WKT_RE = re.compile(r"\s*(POINT|POLYGON)\s*\(+(.*?)\)+\s*$", re.IGNORECASE | re.DOTALL)


def parse_wkt(wkt: str) -> tuple[str, Polygon]:
    """Parse 'POINT (x y)' / 'POLYGON ((x y, x y, ...))' → (kind, coords)."""
    m = _WKT_RE.match(wkt)
    if not m:
        raise ValueError(f"unsupported WKT: {wkt!r}")
    kind = m.group(1).upper()
    coords: Polygon = []
    for pair in m.group(2).split(","):
        x, y = pair.split()
        coords.append((float(x), float(y)))
    return kind, coords


def _point_in_polygon(p: Point, poly: Polygon) -> bool:
    """Ray casting; boundary points count as inside (closed regions)."""
    x, y = p
    inside = False
    n = len(poly)
    for i in range(n):
        (x1, y1), (x2, y2) = poly[i], poly[(i + 1) % n]
        if min(x1, x2) <= x <= max(x1, x2) and min(y1, y2) <= y <= max(y1, y2):
            cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
            if abs(cross) < 1e-12:
                return True  # on the edge
        if (y1 > y) != (y2 > y):
            x_int = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            if x_int > x:
                inside = not inside
    return inside


def _segments_intersect(a: Point, b: Point, c: Point, d: Point) -> bool:
    def orient(p: Point, q: Point, r: Point) -> float:
        return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])

    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    if ((o1 > 0) != (o2 > 0)) and ((o3 > 0) != (o4 > 0)):
        return True
    return False


def st_intersects(wkt_a: str, wkt_b: str) -> bool:
    """True when the two geometries share any point."""
    (ka, ca), (kb, cb) = parse_wkt(wkt_a), parse_wkt(wkt_b)
    if ka == "POINT" and kb == "POINT":
        return ca[0] == cb[0]
    if ka == "POINT":
        return _point_in_polygon(ca[0], cb)
    if kb == "POINT":
        return _point_in_polygon(cb[0], ca)
    # polygon-polygon: any vertex containment or any edge crossing
    if any(_point_in_polygon(p, cb) for p in ca):
        return True
    if any(_point_in_polygon(p, ca) for p in cb):
        return True
    na, nb = len(ca), len(cb)
    for i in range(na):
        for j in range(nb):
            if _segments_intersect(ca[i], ca[(i + 1) % na], cb[j], cb[(j + 1) % nb]):
                return True
    return False


def st_contains(wkt_outer: str, wkt_inner: str) -> bool:
    """True when every vertex of inner lies inside outer (convex-safe)."""
    (ko, co), (ki, ci) = parse_wkt(wkt_outer), parse_wkt(wkt_inner)
    if ko != "POLYGON":
        return False
    return all(_point_in_polygon(p, co) for p in ci)


def _point_segment_distance(p: Point, a: Point, b: Point) -> float:
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    seg_len2 = dx * dx + dy * dy
    if seg_len2 == 0:
        return math.dist(p, a)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / seg_len2))
    return math.dist(p, (ax + t * dx, ay + t * dy))


def st_distance(wkt_a: str, wkt_b: str) -> float:
    """Euclidean distance: POINT↔POINT, and POINT↔POLYGON (0 when the
    point is inside — the KNN-node resolution case)."""
    (ka, ca), (kb, cb) = parse_wkt(wkt_a), parse_wkt(wkt_b)
    if ka == "POINT" and kb == "POINT":
        return math.dist(ca[0], cb[0])
    if ka == "POLYGON" and kb == "POINT":
        (ka, ca), (kb, cb) = (kb, cb), (ka, ca)
    if ka == "POINT" and kb == "POLYGON":
        p = ca[0]
        ring = cb if cb[0] == cb[-1] else [*cb, cb[0]]
        if _point_in_polygon(p, cb):
            return 0.0
        return min(
            _point_segment_distance(p, ring[i], ring[i + 1])
            for i in range(len(ring) - 1)
        )
    raise ValueError("st_distance supports POINT and POINT/POLYGON geometries")
