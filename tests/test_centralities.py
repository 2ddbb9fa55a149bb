"""Centralities on hand-computed graphs (networkx conventions)."""

from __future__ import annotations

import pytest

from aml_feature_store_spark.operators.graph import global_centralities


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_path_graph(spark):
    # a(0) - b(1) - c(2)
    out = {r["node"]: r for r in global_centralities(_pairs(spark, [(0, 1), (1, 2)])).collect()}
    assert out[1]["betweenness_centrality"] == pytest.approx(1.0)
    assert out[0]["betweenness_centrality"] == 0.0
    assert out[1]["closeness_centrality"] == pytest.approx(1.0)
    assert out[0]["closeness_centrality"] == pytest.approx(2 / 3, abs=1e-6)


def test_complete_graph_uniform(spark):
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out = global_centralities(_pairs(spark, pairs)).collect()
    for r in out:
        assert r["closeness_centrality"] == pytest.approx(1.0)
        assert r["betweenness_centrality"] == 0.0


def test_star_graph_center(spark):
    pairs = [(0, i) for i in range(1, 6)]  # hub 0, 5 leaves
    out = {r["node"]: r for r in global_centralities(_pairs(spark, pairs)).collect()}
    assert out[0]["betweenness_centrality"] == pytest.approx(1.0)
    assert out[0]["closeness_centrality"] == pytest.approx(1.0)
    # leaf: dists = 1 + 4*2 = 9 → (5/9)*(5/5) = 0.5556
    assert out[1]["closeness_centrality"] == pytest.approx(5 / 9, abs=1e-6)


def test_max_nodes_guard(spark):
    with pytest.raises(Exception):
        global_centralities(
            _pairs(spark, [(0, 1), (1, 2), (2, 3)]), max_nodes=2
        ).collect()
