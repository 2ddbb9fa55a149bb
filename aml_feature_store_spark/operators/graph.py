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
    # bipartite: node universe = distinct src ∪ distinct dst (disjoint
    # types). The count folds in as a broadcast 1-row join, so the whole
    # operator is ONE lazy plan — no driver action, no persisted edge list
    # to leak; Catalyst's exchange reuse shares the edge aggregation
    # between the two subtrees.
    n = edges.agg(
        (F.countDistinct("src") + F.countDistinct("dst")).alias("_n_nodes")
    )
    deg = edges.groupBy(F.col(side).alias("node")).agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum(F.col("weight").cast(DEC)).cast("double").alias("weighted_degree"),
        F.sum("n_txn").alias("total_txns"),
    )
    centrality = F.when(
        F.col("_n_nodes") > 1,
        F.col("degree").cast("double") / (F.col("_n_nodes") - 1).cast("double"),
    ).otherwise(F.lit(0.0))  # networkx convention for a single-node graph
    return deg.join(F.broadcast(n)).select(
        "node",
        "degree",
        "weighted_degree",
        "total_txns",
        centrality.alias("degree_centrality"),
    )


CENTRALITY_SCHEMA = "node long, closeness_centrality double, betweenness_centrality double"


def global_centralities(
    pairs: DataFrame,
    max_nodes: int = 20_000,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Closeness + betweenness centrality on an undirected pair list
    (A28's inherently-global metrics; reference advanced_features.py:59-72
    networkx calls).

    These do NOT decompose into relational operators — this is the
    documented applyInPandas escape hatch: the pair list collects into a
    single group (guarded by ``max_nodes``) and Brandes' algorithm (2001,
    O(V·E)) runs in numpy. At 100 TB run per connected component or on a
    degree-capped subgraph; the engine refuses silently-unbounded inputs.

    Conventions match networkx: closeness = (n_reachable−1)/Σdist scaled
    by (n_reachable−1)/(N−1); betweenness normalized by 2/((N−1)(N−2)).
    """
    import numpy as np
    import pandas as pd

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(pd.concat([pdf["u"], pdf["v"]], ignore_index=True))
        n = len(nodes)
        if n > max_nodes:
            raise ValueError(
                f"graph has {n} nodes > max_nodes={max_nodes}; run per "
                "component or cap degrees first"
            )
        idx = {x: i for i, x in enumerate(nodes)}
        adj: list[list[int]] = [[] for _ in range(n)]
        for a, b in zip(pdf["u"], pdf["v"]):
            ia, ib = idx[a], idx[b]
            adj[ia].append(ib)
            adj[ib].append(ia)
        closeness = np.zeros(n)
        betweenness = np.zeros(n)
        for s in range(n):
            # Brandes single-source shortest-path accumulation
            dist = np.full(n, -1, dtype=np.int64)
            sigma = np.zeros(n)
            dist[s] = 0
            sigma[s] = 1.0
            order: list[int] = []
            preds: list[list[int]] = [[] for _ in range(n)]
            queue = [s]
            while queue:
                nxt: list[int] = []
                for x in queue:
                    order.append(x)
                    for y in adj[x]:
                        if dist[y] == -1:
                            dist[y] = dist[x] + 1
                            nxt.append(y)
                        if dist[y] == dist[x] + 1:
                            sigma[y] += sigma[x]
                            preds[y].append(x)
                queue = nxt
            reach = dist >= 0
            nr = int(reach.sum())
            if nr > 1:
                total = float(dist[reach].sum())
                closeness[s] = ((nr - 1) / total) * ((nr - 1) / (n - 1))
            delta = np.zeros(n)
            for w in reversed(order):
                for p in preds[w]:
                    delta[p] += (sigma[p] / sigma[w]) * (1.0 + delta[w])
                if w != s:
                    betweenness[w] += delta[w]
        if n > 2:
            betweenness = betweenness / ((n - 1) * (n - 2))  # undirected: /2 ×2 paths
        return pd.DataFrame(
            {
                "node": nodes.astype("int64"),
                "closeness_centrality": np.round(closeness, 6),
                "betweenness_centrality": np.round(betweenness, 6),
            }
        )

    from pyspark.sql import functions as FF

    prepared = pairs.select(
        FF.col(u_col).alias("u"), FF.col(v_col).alias("v"), FF.lit(0).alias("_g")
    )
    return prepared.groupBy("_g").applyInPandas(
        lambda pdf: compute(pdf), schema=CENTRALITY_SCHEMA
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
