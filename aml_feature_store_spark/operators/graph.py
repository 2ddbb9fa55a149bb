"""Graph feature operators on an edge-list DataFrame (SURVEY §2.4 A27/A28,
§2.3 J5).

The reference builds a networkx customer–merchant/IP graph row by row
(reference: feature_engineering/advanced_features.py:23-105) and keeps
streaming edge weights in unbounded MapState (flink_job/
real_time_processor.py:270-332). Spark-first: the graph IS a DataFrame
``(src, dst, weight, n_txn)`` produced by one groupBy — degrees and
centralities are aggregations over it; 2-hop metrics are edge self-joins.

Scale notes: degree/weighted-degree is one shuffle. Triangle counting via
self-join explodes on hub nodes — cap or sample high-degree nodes at
production scale (documented approximation; betweenness/closeness are
inherently global and stay out of engine scope per SURVEY §4.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEC = "decimal(25,2)"


def edge_list(
    df: DataFrame,
    src_col: str = "user_id",
    dst_col: str = "prop_k",
    amount_col: str = "value",
) -> DataFrame:
    """Weighted bipartite edge list: (src, dst) → Σamount, count (J5).

    Reference: advanced_features.py:30-50 (G.add_edge(customer, merchant,
    weight=amount_sum)); one hash aggregation here.
    """
    return df.groupBy(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).agg(
        F.sum(F.col(amount_col).cast(DEC)).cast("double").alias("weight"),
        F.count(F.lit(1)).alias("n_txn"),
    )


def node_degrees(edges: DataFrame, side: str = "src") -> DataFrame:
    """Degree / weighted degree / degree centrality per node (A27/A28).

    Degree centrality = degree / (N − 1) with N = total node count of the
    bipartite graph (networkx convention the reference relies on,
    advanced_features.py:64-69).
    """
    # bipartite: node universe = distinct src ∪ distinct dst (disjoint types)
    n_nodes = (
        edges.select("src").distinct().count()
        + edges.select("dst").distinct().count()
    )
    return edges.groupBy(F.col(side).alias("node")).agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum(F.col("weight").cast(DEC)).cast("double").alias("weighted_degree"),
        F.sum("n_txn").alias("total_txns"),
        (F.count(F.lit(1)).cast("double") / F.lit(float(n_nodes - 1))).alias(
            "degree_centrality"
        ),
    )


def shared_neighbor_pairs(edges: DataFrame) -> DataFrame:
    """Unipartite projection: (src_a, src_b) pairs sharing ≥1 dst, with the
    shared-neighbor count — the 2-hop self-join primitive behind
    clustering/triangle metrics (A28)."""
    a = edges.select(F.col("src").alias("u"), "dst")
    b = edges.select(F.col("src").alias("v"), "dst")
    return (
        a.join(b, "dst")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("shared_dsts"))
    )
