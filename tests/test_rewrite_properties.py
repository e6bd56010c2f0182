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


def test_not_over_uniform_metadata_conjunction_is_consumed():
    from sensql_presto_spark.sensql.rewrite import (
        check_cond,
        parse_where,
        process_where,
        render,
    )

    tree = parse_where("NOT (feature.name = 'x' AND feature.id > 3) AND value > 10")
    out = render(process_where(tree, check_cond))
    assert out == "value > 10"


def test_not_over_mixed_conjunction_rejected():
    import pytest

    from sensql_presto_spark.sensql.rewrite import (
        check_cond,
        parse_where,
        process_where,
    )

    tree = parse_where("NOT (feature.name = 'x' AND value > 10)")
    with pytest.raises(ValueError, match="cannot split NOT"):
        process_where(tree, check_cond)
