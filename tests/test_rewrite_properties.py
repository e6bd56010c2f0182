"""Property-based tests for the SenSQL WHERE parser (hypothesis)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sensql_presto_spark.sensql import rewrite

leaves = st.sampled_from(
    [
        "value > 10",
        "measurements.value <= 3.5",
        "feature.name = 'downtown'",
        "shape.id = feature.shape",
        "st_intersects(shape.geometries, nodes.service_region)",
        "sensor IN ('a', 'b')",
        "value BETWEEN 1 AND 5",
        "ts >= TIMESTAMP '2024-01-01 00:00:00'",
    ]
)


def trees(depth: int = 3):
    return st.recursive(
        leaves.map(rewrite.Leaf),
        lambda kids: st.tuples(st.sampled_from(["AND", "OR"]), kids, kids).map(
            lambda t: rewrite.BoolOp(*t)
        ),
        max_leaves=8,
    )


@given(trees())
@settings(max_examples=200, deadline=None)
def test_render_parse_roundtrip(tree):
    text = rewrite.render(tree)
    reparsed = rewrite.parse_where(text)
    assert rewrite.render(reparsed) == text


@given(trees())
@settings(max_examples=200, deadline=None)
def test_residual_never_contains_metadata_tokens(tree):
    text = rewrite.render(tree)
    residual = rewrite.build_residual_where(text)
    if residual is not None:
        for leaf in ("feature.", "shape.", "nodes."):
            assert leaf not in residual


@given(trees())
@settings(max_examples=200, deadline=None)
def test_forward_query_never_contains_measurement_predicates(tree):
    fwd = rewrite.build_forward_query(rewrite.render(tree))
    assert "measurements." not in fwd
    assert fwd.startswith(rewrite.FORWARD_PREFIX)
