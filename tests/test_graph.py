"""operators/graph.pagerank: hand-checked ranks on a tiny graph."""

import pytest

from ranger_spark.operators.graph import pagerank


def _ranks(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["src", "dst", "w"])
    out = pagerank(df, "src", "dst", weight="w", **kw)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_two_node_symmetric(spark):
    # a<->b with equal weight: stationary by symmetry, rank 0.5 each
    r = _ranks(spark, [("a", "b", 1.0), ("b", "a", 1.0)], iterations=3)
    assert r["a"] == pytest.approx(0.5)
    assert r["b"] == pytest.approx(0.5)


def test_one_iteration_hand_computed(spark):
    # a->b, a->c (equal), b->a, c->a; 1 iteration from uniform 1/3:
    # r(a) = .15/3 + .85*(r(b)+r(c)) = .05 + .85*(2/3)
    # r(b) = r(c) = .05 + .85*(1/3 * 1/2)
    r = _ranks(
        spark,
        [("a", "b", 1.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        iterations=1,
    )
    assert r["a"] == pytest.approx(0.05 + 0.85 * (2 / 3))
    assert r["b"] == pytest.approx(0.05 + 0.85 * (1 / 6))
    assert r["c"] == pytest.approx(r["b"])
    assert sum(r.values()) == pytest.approx(1.0)  # no dangling → conserved


def test_weighted_split(spark):
    # a splits 3:1 between b and c; b,c return all mass to a.
    r = _ranks(
        spark,
        [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        iterations=1,
    )
    assert r["b"] == pytest.approx(0.05 + 0.85 * (1 / 3) * 0.75)
    assert r["c"] == pytest.approx(0.05 + 0.85 * (1 / 3) * 0.25)


def test_dangling_leaks_mass(spark):
    # b has no out-edges: total mass < 1 (documented simplification)
    r = _ranks(spark, [("a", "b", 1.0)], iterations=2)
    assert sum(r.values()) < 1.0
