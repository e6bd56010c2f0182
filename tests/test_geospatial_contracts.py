"""Error-contract tests for the geospatial kernels (the value surface is
oracle-checked by the geo_* registry entries; these pin the loud-failure
contracts the reference enforces — GeoFunctions.java:285-294 for
ST_Buffer's distance validation — plus the r7 tail kernels' edges."""

from __future__ import annotations

import math

import pytest

from sensql_presto_spark.functions.geospatial import (
    _expand_envelope,
    _flatten_collections,
    _st_buffer,
)


def test_buffer_rejects_nan_and_negative_distance():
    with pytest.raises(ValueError, match="NaN"):
        _st_buffer("POINT (1 2)", float("nan"))
    for wkt in ("POINT (1 2)", "LINESTRING (0 0, 3 0)", "POLYGON ((0 0, 2 0, 0 2))"):
        with pytest.raises(ValueError, match="negative"):
            _st_buffer(wkt, -2.0)


def test_buffer_zero_distance_returns_input():
    for wkt in ("POINT (1 2)", "LINESTRING (0 0, 3 0)"):
        assert _st_buffer(wkt, 0.0) == wkt


def test_buffer_convex_polygon_minkowski_area():
    # buffer(convex polygon, d) = A + P*d + (32-gon area); the 32-gon
    # area is 0.5 * 32 * d^2 * sin(2*pi/32)
    from sensql_presto_spark.functions.geospatial import _area, _perimeter

    tri = "POLYGON ((0 0, 4 0, 0 3))"
    buf = _st_buffer(tri, 2.0)
    # Minkowski mixed term is sum over edges of |e| * support_32gon(n_e),
    # where the 32-gon's support in any direction lies in
    # [d*cos(pi/32), d] — so the area is bounded tightly on both sides.
    disc_area = 0.5 * 32 * 4.0 * math.sin(math.pi / 16)
    a, p = _area(tri), _perimeter(tri)
    got = _area(buf)
    assert a + p * 2.0 * math.cos(math.pi / 32) + disc_area - 1e-9 <= got
    assert got <= a + p * 2.0 + disc_area + 1e-9


def test_expand_envelope_rectangle():
    assert (
        _expand_envelope("LINESTRING (1 2, 5 4)", 2.0)
        == "POLYGON ((-1 0, 7 0, 7 6, -1 6))"
    )


def test_flatten_collections_nested_and_empty():
    got = _flatten_collections(
        "GEOMETRYCOLLECTION (POINT (1 2), GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1), "
        "POINT (3 4)), POLYGON ((0 0, 1 0, 0 1)))"
    )
    assert got == [
        "POINT (1 2)",
        "LINESTRING (0 0, 1 1)",
        "POINT (3 4)",
        "POLYGON ((0 0, 1 0, 0 1))",
    ]
    assert _flatten_collections("GEOMETRYCOLLECTION EMPTY") == []
    assert _flatten_collections("POINT (1 2)") == ["POINT (1 2)"]
