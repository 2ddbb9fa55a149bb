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


def test_two_components_match_single_group(spark):
    # two disjoint graphs: path 0-1-2 and star 10-{11,12,13}; the
    # per-component run must equal the single-group run EXACTLY (shortest
    # paths never cross components; normalization keeps global N)
    pairs = [(0, 1), (1, 2), (10, 11), (10, 12), (10, 13)]
    split = {
        r["node"]: r
        for r in global_centralities(_pairs(spark, pairs)).collect()
    }
    single = {
        r["node"]: r
        for r in global_centralities(
            _pairs(spark, pairs), per_component=False
        ).collect()
    }
    assert set(split) == set(single)
    for node in single:
        assert split[node]["closeness_centrality"] == single[node]["closeness_centrality"]
        assert split[node]["betweenness_centrality"] == single[node]["betweenness_centrality"]


def test_connected_components_labels(spark):
    from aml_feature_store_spark.operators.graph import connected_components

    pairs = [(5, 6), (6, 7), (1, 2), (9, 9)]
    labels = {
        r["node"]: r["comp"]
        for r in connected_components(_pairs(spark, pairs)).collect()
    }
    assert labels == {5: 5, 6: 5, 7: 5, 1: 1, 2: 1, 9: 9}
