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


def connected_components(
    pairs: DataFrame, u_col: str = "u", v_col: str = "v", max_iter: int = 50
) -> DataFrame:
    """Connected components by distributed min-label propagation with
    pointer jumping: every node starts labeled with its own id; each round
    takes the min of its own and its neighbors' labels (one join + one
    aggregation), then compresses label chains by one hop
    (comp ← comp[comp], one more join) — the pointer-jumping step turns
    the O(diameter) GraphX-style propagation into O(log diameter) rounds,
    so a path graph of 10⁶ nodes converges in ~20 rounds, not 10⁶.
    Returns (node, comp) with comp = min node id of the component.

    Raises RuntimeError if the fixpoint is not reached within max_iter —
    partially-propagated labels would silently split one component into
    several (and e.g. give global_centralities wrong per-group closeness),
    so non-convergence is an error, never a fallthrough.

    The returned DataFrame is localCheckpoint-materialized: iteration
    caches are unpersisted before returning, lineage is truncated (no
    2·max_iter-join plan for the consumer), and its block storage is
    released by the ContextCleaner when the result is unreferenced —
    callers don't manage persistence.
    """
    e = pairs.select(F.col(u_col).alias("a"), F.col(v_col).alias("b"))
    und = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = und.persist()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    checksum = labels.agg(F.sum("comp")).collect()[0][0]
    converged = False
    for _ in range(max_iter):
        nbr = (
            und.join(
                labels.select(
                    F.col("node").alias("b"), F.col("comp").alias("_nc")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("_nc").alias("_min_nbr"))
        )
        stepped = labels.join(
            nbr.withColumnRenamed("a", "node"), "node", "left"
        ).select(
            "node",
            F.least(
                F.col("comp"), F.coalesce("_min_nbr", F.col("comp"))
            ).alias("comp"),
        )
        # pointer jumping: a label is always an existing node id, so follow
        # it one hop (comp <- comp's comp); labels only ever decrease
        new = (
            stepped.alias("l")
            .join(
                stepped.select(
                    F.col("node").alias("comp"), F.col("comp").alias("_cc")
                ).alias("p"),
                "comp",
                "left",
            )
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("_cc", F.col("comp"))).alias(
                    "comp"
                ),
            )
            .persist()
        )
        new_sum = new.agg(F.sum("comp")).collect()[0][0]
        labels.unpersist()
        labels = new
        if new_sum == checksum:  # labels only ever decrease
            converged = True
            break
        checksum = new_sum
    und.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed ~ log2(graph diameter) with "
            "pointer jumping)"
        )
    final = labels.localCheckpoint(eager=True)
    labels.unpersist()
    return final


def multi_source_bfs(
    edges: DataFrame, sources: DataFrame, max_depth: int = 8
) -> DataFrame:
    """Distributed multi-source BFS: exact shortest-path distance from
    each source ("landmark") node to every node within ``max_depth`` hops.
    ``edges`` is a directed (src, dst) list — pass both directions for an
    undirected graph; ``sources`` has one ``node`` column.

    This is the Pregel / GraphFrames aggregateMessages shape expressed in
    DataFrames: each round joins the current frontier to the edge list,
    anti-joins out already-visited (root, node) pairs, and checkpoints to
    cut lineage. Rounds = min(graph diameter, max_depth) Spark jobs;
    distributed state is K·V (root, node, dist) rows — never a
    driver-side adjacency structure. The frontier-empty check is one
    bounded driver action per round, same budget as connected_components.

    At 100 TB this is the published landmark/pivot pattern (Eppstein-
    Wang): K landmarks give exact per-landmark closeness and a 2-approx
    all-pairs distance bound at K·V state instead of V² — the only BFS
    shape that survives V in the billions.

    Returns (root, node, dist) with dist = exact BFS distance ≤ max_depth.
    """
    from functools import reduce

    frames = [
        sources.select(
            F.col("node").alias("root"), F.col("node"), F.lit(0).alias("dist")
        ).localCheckpoint(eager=True)
    ]
    frontier = frames[0]
    # materialize the edge list ONCE — every round joins against it, and
    # without this the upstream lineage (scan + parse + distinct) re-runs
    # per round; at cluster scale this is the standard Pregel edge persist
    e = edges.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    ).localCheckpoint(eager=True)
    for d in range(1, max_depth + 1):
        # visited = union of already-materialized frontier frames — never
        # re-checkpointed, so each round costs ONE materialization (the
        # new frontier), not a rewrite of the whole distance set
        visited = reduce(
            DataFrame.union, (f.select("root", "node") for f in frames)
        )
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select("root", F.col("_d").alias("node"))
            .distinct()
            .join(visited, ["root", "node"], "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        frames.append(nxt)
        frontier = nxt
    return reduce(DataFrame.union, frames)


def multi_source_bfs_masked(
    edges: DataFrame, sources: DataFrame, max_depth: int = 8
) -> DataFrame:
    """Bitmask variant of :func:`multi_source_bfs` for SMALL source sets
    (K ≤ 62, r10): the K BFS waves share ONE per-node int64 bitmask
    instead of K·V (root, node) rows. Per round the frontier is at most V
    (node, mask) rows — small enough to BROADCAST, so the edge list never
    shuffles — and the row-BFS's ``distinct`` over up-to-K·|edges| joined
    rows becomes a ``bit_or`` aggregate over |edges| rows; the
    visited-set anti-join becomes one V-row full-outer mask merge. Same
    exact (root, node, dist) output (BFS distances are integers — any
    correct frontier expansion yields identical rows), pinned equal to
    the row variant in tests/test_centralities.py. Falls back to the row
    variant when K > 62. The ``sources`` collect is K bounded rows — the
    same driver budget as the per-round isEmpty check."""
    from functools import reduce

    spark = edges.sparkSession
    roots = sorted(int(r["node"]) for r in sources.select("node").collect())
    if len(roots) > 62:
        return multi_source_bfs(edges, sources, max_depth=max_depth)
    if not roots:
        return spark.createDataFrame([], "root bigint, node bigint, dist int")
    e = edges.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    ).localCheckpoint(eager=True)
    init = spark.createDataFrame(
        [(n, 1 << j) for j, n in enumerate(roots)], "node bigint, mask bigint"
    ).localCheckpoint(eager=True)
    frames = [init.withColumn("dist", F.lit(0))]
    visited = init.withColumnRenamed("mask", "vmask")
    frontier = init
    for d in range(1, max_depth + 1):
        msgs = (
            e.join(F.broadcast(frontier), e["_s"] == frontier["node"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.bit_or("mask").alias("_m"))
        )
        merged = (
            visited.join(msgs, "node", "full_outer")
            .select(
                "node",
                F.coalesce("vmask", F.lit(0)).alias("_v"),
                F.coalesce("_m", F.lit(0)).alias("_mm"),
            )
            .select(
                "node",
                F.col("_v").bitwiseOR(F.col("_mm")).alias("vmask"),
                F.col("_mm")
                .bitwiseAND(F.col("_v").bitwiseXOR(F.lit(-1)))
                .alias("new"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.filter(F.col("new") != 0).select(
            "node", F.col("new").alias("mask")
        )
        if frontier.isEmpty():
            break
        visited = merged.select("node", "vmask")
        frames.append(frontier.withColumn("dist", F.lit(d)))
    allm = reduce(DataFrame.union, frames)
    return reduce(
        DataFrame.union,
        (
            allm.filter(
                F.col("mask").bitwiseAND(F.lit(1 << j)) != 0
            ).select(F.lit(n).cast("bigint").alias("root"), "node", "dist")
            for j, n in enumerate(roots)
        ),
    )


def landmark_closeness(
    edges: DataFrame, k_landmarks: int = 4, max_depth: int = 8
) -> DataFrame:
    """Exact closeness centrality (networkx convention, reachable-set
    scaled) for the K highest-degree nodes with src ≥ 0, via distributed
    multi-source BFS. Distances are capped at ``max_depth`` hops — the
    oracle applies the identical cap, so results stay engine-portable on
    graphs deeper than the cap (a documented bounded-radius closeness).

    Reference semantic: explainability-grade closeness from
    advanced_features.py's networkx closeness_centrality, restricted to
    landmark nodes so the computation is K·V, not V² (A28 at scale).

    r10: the edge list is materialized ONCE here — deg, n_nodes, and the
    BFS previously each re-ran the caller's upstream lineage (a
    10M-event parse + distinct at the 100× anchor, three times over) —
    and the BFS runs the bitmask variant (K ≤ 62 always holds here)."""
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    deg = (
        edges.filter(F.col("src") >= 0)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .orderBy(F.col("_deg").desc(), F.col("src").asc())
        .limit(k_landmarks)
        .select(F.col("src").alias("node"))
    )
    nn = edges.select("src").distinct().agg(F.count(F.lit(1)).alias("n_nodes"))
    dist = multi_source_bfs_masked(edges, deg, max_depth=max_depth)
    cnt = F.count(F.lit(1)).cast("double")
    sd = F.sum("dist").cast("double")
    return (
        dist.groupBy("root")
        .agg(
            (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("n_reached"),
            F.sum("dist").cast("long").alias("total_dist"),
            ((cnt - 1.0) / sd).alias("_inv"),
            (cnt - 1.0).alias("_nr"),
        )
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("root").alias("node"),
            "n_reached",
            "total_dist",
            F.round(
                F.when(
                    F.col("total_dist") > 0,
                    F.col("_inv")
                    * (F.col("_nr") / (F.col("n_nodes").cast("double") - 1.0)),
                ).otherwise(0.0),
                6,
            ).alias("closeness"),
        )
    )


def bounded_exact_centralities(
    edges: DataFrame, max_depth: int = 8
) -> DataFrame:
    """Exact closeness AND betweenness centrality on a BOUNDED graph,
    computed entirely with relational operators (r7) — the oracle-checkable
    counterpart of :func:`global_centralities`'s numpy Brandes kernel.

    Decomposition (all joins/aggregations, no driver-side graph):
      1. all-sources BFS (:func:`multi_source_bfs` from every node) →
         exact distances d(s,v) capped at ``max_depth`` (bounded-radius
         semantics, mirrored by the oracle's identical cap);
      2. shortest-path counts σ(s,v) by level-synchronous counting:
         σ at level d = Σ σ of level-(d−1) in-neighbors, restricted to
         true level-d nodes — one join + aggregation per level;
      3. betweenness by Brandes' pair-dependency identity
         bet(v) = Σ_{s≠v≠t} [d(s,v)+d(v,t)=d(s,t)] · σ_sv·σ_vt/σ_st over
         ORDERED (s,t) pairs, normalized by (n−1)(n−2) — algebraically
         what Brandes' backward accumulation computes (Brandes 2001, eq. 6),
         but expressed as a three-way self-join + aggregation;
      4. closeness from the distance table (networkx reachable-set
         convention, same formula as :func:`landmark_closeness`).

    Determinism: each dependency term is snapped to the 1e-9 lattice and
    summed in DECIMAL(38,12) — exact, order-independent, mirrored by the
    DuckDB oracle. σ products stay in int64 (exact while σ_sv·σ_vt <
    2^53, far beyond any bounded slice this runs on).

    Scale contract: state is O(V²) distance/count rows and the dependency
    join is O(paths) — this is for BOUNDED subgraphs (deterministic
    slices, ego nets); the V-scalable paths are landmark_closeness (K·V)
    and the per-component Brandes kernel. Cross-checked against the numpy
    Brandes implementation in tests/test_centralities.py.
    """
    from functools import reduce

    e = edges.select("src", "dst").localCheckpoint(eager=True)
    # node set = union of BOTH endpoints: on a directed (non-symmetrized)
    # edge list a src-only derivation silently drops pure-sink nodes from
    # the output and from the n_nodes normalization (networkx includes
    # every endpoint). The symmetrized callers see the identical set, so
    # certified results are unchanged.
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    dist = multi_source_bfs(e, nodes, max_depth=max_depth).localCheckpoint(
        eager=True
    )
    cur = nodes.select(
        F.col("node").alias("root"), "node", F.lit(1).cast("long").alias("sigma")
    ).localCheckpoint(eager=True)
    frames = [cur.withColumn("dist", F.lit(0))]
    for d in range(1, max_depth + 1):
        lvl = dist.filter(F.col("dist") == d).select("root", "node")
        nxt = (
            cur.join(e, cur["node"] == e["src"])
            .select("root", F.col("dst").alias("node"), "sigma")
            .join(lvl, ["root", "node"])
            .groupBy("root", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        frames.append(nxt.withColumn("dist", F.lit(d)))
        cur = nxt
    sig = reduce(DataFrame.union, frames).localCheckpoint(eager=True)

    sv = sig.select(
        F.col("root").alias("s"),
        F.col("node").alias("v"),
        F.col("dist").alias("d1"),
        F.col("sigma").alias("g1"),
    )
    vt = sig.select(
        F.col("root").alias("v"),
        F.col("node").alias("t"),
        F.col("dist").alias("d2"),
        F.col("sigma").alias("g2"),
    )
    st = sig.select(
        F.col("root").alias("s"),
        F.col("node").alias("t"),
        F.col("dist").alias("d3"),
        F.col("sigma").alias("g3"),
    )
    term = F.round(
        (F.col("g1") * F.col("g2")).cast("double") / F.col("g3").cast("double"),
        9,
    )
    bet = (
        sv.filter(F.col("v") != F.col("s"))
        .join(vt.filter(F.col("v") != F.col("t")), "v")
        .filter(F.col("s") != F.col("t"))
        .join(st, ["s", "t"])
        .filter(F.col("d3") == F.col("d1") + F.col("d2"))
        .groupBy("v")
        .agg(
            F.sum(term.cast("decimal(38,12)")).cast("double").alias("_bsum")
        )
    )
    cnt = F.count(F.lit(1)).cast("double")
    clo = dist.groupBy("root").agg(
        # guard inside the agg, not just downstream: a root that reaches
        # only itself (directed pure sink) has Σdist = 0, and under ANSI
        # the unguarded quotient raises before the outer WHEN can mask it
        F.when(
            F.sum("dist") > 0, (cnt - 1.0) / F.sum("dist").cast("double")
        ).otherwise(F.lit(0.0)).alias("_inv"),
        (cnt - 1.0).alias("_nr"),
        F.sum("dist").cast("long").alias("_td"),
    )
    nd = F.col("n_nodes").cast("double")
    return (
        clo.crossJoin(F.broadcast(n_total))
        .join(bet.withColumnRenamed("v", "root"), "root", "left")
        .select(
            F.col("root").alias("node"),
            F.round(
                F.when(
                    F.col("_td") > 0,
                    F.col("_inv") * (F.col("_nr") / (nd - 1.0)),
                ).otherwise(0.0),
                6,
            ).alias("closeness_centrality"),
            F.round(
                F.when(
                    F.col("n_nodes") > 2,
                    F.coalesce(F.col("_bsum"), F.lit(0.0))
                    / ((nd - 1.0) * (nd - 2.0)),
                ).otherwise(0.0),
                6,
            ).alias("betweenness_centrality"),
        )
    )


def global_centralities(
    pairs: DataFrame,
    max_nodes: int = 20_000,
    u_col: str = "u",
    v_col: str = "v",
    per_component: bool = True,
) -> DataFrame:
    """Closeness + betweenness centrality on an undirected pair list
    (A28's inherently-global metrics; reference advanced_features.py:59-72
    networkx calls).

    At unbounded V these metrics do not decompose economically into
    relational operators (the exact relational form,
    :func:`bounded_exact_centralities`, carries O(V²) distance state and
    is reserved for bounded slices) — this is the documented
    applyInPandas escape hatch running Brandes' algorithm (2001,
    O(V·E)) in numpy, pinned equal to the relational derivation in
    tests/test_centralities.py. Shortest paths never cross components, so by
    default the graph is first split with distributed
    :func:`connected_components` and Brandes runs per component IN
    PARALLEL — ``max_nodes`` then guards the largest component, not the
    whole graph, and the output is identical to the single-group run
    (normalization deliberately keeps the GLOBAL node count, carried into
    each group, matching networkx on the full graph). The engine refuses
    silently-unbounded inputs.

    Conventions match networkx: closeness = (n_reachable−1)/Σdist scaled
    by (n_reachable−1)/(N−1); betweenness normalized by 2/((N−1)(N−2)).
    """
    import numpy as np
    import pandas as pd

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(pd.concat([pdf["u"], pdf["v"]], ignore_index=True))
        n_local = len(nodes)
        n = int(pdf["_n_total"].iloc[0])  # GLOBAL node count (networkx N)
        if n_local > max_nodes:
            raise ValueError(
                f"component has {n_local} nodes > max_nodes={max_nodes}; "
                "cap degrees first"
            )
        idx = {x: i for i, x in enumerate(nodes)}
        adj: list[list[int]] = [[] for _ in range(n_local)]
        for a, b in zip(pdf["u"], pdf["v"]):
            ia, ib = idx[a], idx[b]
            adj[ia].append(ib)
            adj[ib].append(ia)
        closeness = np.zeros(n_local)
        betweenness = np.zeros(n_local)
        for s in range(n_local):
            # Brandes single-source shortest-path accumulation
            dist = np.full(n_local, -1, dtype=np.int64)
            sigma = np.zeros(n_local)
            dist[s] = 0
            sigma[s] = 1.0
            order: list[int] = []
            preds: list[list[int]] = [[] for _ in range(n_local)]
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
            delta = np.zeros(n_local)
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

    prepared = pairs.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    if per_component:
        comps = connected_components(prepared)
        grouped = prepared.join(
            comps.select(F.col("node").alias("u"), F.col("comp").alias("_g")),
            "u",
        )
        n_total = comps.agg(F.count(F.lit(1)).alias("_n_total"))
    else:
        grouped = prepared.withColumn("_g", F.lit(0))
        n_total = (
            prepared.select(F.col("u").alias("x"))
            .union(prepared.select(F.col("v").alias("x")))
            .agg(F.countDistinct("x").alias("_n_total"))
        )
    return (
        grouped.join(F.broadcast(n_total))
        .groupBy("_g")
        .applyInPandas(lambda pdf: compute(pdf), schema=CENTRALITY_SCHEMA)
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


def pagerank(
    edges: DataFrame,
    n_iters: int = 8,
    damping: float = 0.85,
    checkpoint_every: int = 2,
) -> DataFrame:
    """PageRank by fixed-round power iteration over a directed edge list
    (`src`, `dst` columns; pass a symmetrized list for undirected
    semantics — then every node has outdeg ≥ 1 and no dangling-mass
    term is needed).

    Determinism contract (mirrors the unrolled-CTE DuckDB oracle): every
    iteration's rank is rounded to 12 dp, resynchronizing Spark's and the
    oracle's float summation orders; the final output rounds to 9 dp.

    Scale shape: per iteration, one src-keyed broadcast-free join + one
    dst-keyed hash aggregation — the canonical distributed PageRank. The
    rank/outdeg/node frames are `localCheckpoint`-materialized (every
    `checkpoint_every` rounds — measured ~25% faster than per-round at
    the sf0.1 anchor, while keeping lineage depth bounded) so the
    plan stays O(1) deep across iterations instead of O(iters), and the
    edge list is scanned once per iteration (never re-derived from the
    source scan). A 1000-executor run partitions edges by src and
    reuses that layout every round.
    """
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    outdeg = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ).localCheckpoint(eager=True)
    # outdeg never changes across iterations — join it into the edge list
    # ONCE (r7: saves one src-keyed shuffle join per iteration; the r6
    # code re-joined outdeg in all 8 rounds). Same values, so the oracle
    # (which joins outdeg per unrolled CTE) is unaffected.
    edges_w = edges.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(n_iters):
        # per-edge contributions are snapped to the 1e-12 lattice as
        # SCALED INT64 and summed as longs (r7; replaces the r6
        # DECIMAL(38,15) sum, which was bit-exact but several× slower on
        # the hottest join ×8 iterations): floor(x*1e12 + 0.5) is the
        # nearest lattice integer to x (|fp error of x*1e12| ≲ 1e-4 ≪ 0.5
        # for x ≤ 1), computed from bit-identical doubles in both engines,
        # so the per-edge integer — and therefore the order-independent
        # long sum — cannot differ between Spark and the oracle. Per-dst
        # sums are ≤ Σranks·1e12 ≈ 1e12, far inside int64.
        contrib = (
            edges_w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(
                (
                    F.sum(
                        F.floor(
                            F.col("rank") / F.col("outdeg") * F.lit(1e12)
                            + F.lit(0.5)
                        )
                    ).cast("double")
                    / F.lit(1e12)
                ).alias("c")
            )
        )
        ranks = (
            nodes.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("c", F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == n_iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node", (F.round(F.col("rank"), 9) + F.lit(0.0)).alias("pagerank")
    )


def _guarded_norm(side: str):
    """The L2 norm column with an explicit overflow trap: a DECIMAL(38,0)
    sum that overflows yields NULL (non-ANSI) — dividing by it would
    silently NULL every score, while the DuckDB oracle's HUGEINT raises.
    Raise loudly instead, naming the documented bound (Σ raw² < 1e14)."""
    return F.when(
        F.col("nrm").isNotNull() & (F.col("nrm") > 0), F.col("nrm")
    ).otherwise(
        F.raise_error(
            F.lit(
                f"hits: {side} L2 norm overflowed DECIMAL(38,0) "
                "(sum of squared 1e12-scaled scores >= 1e38, i.e. "
                "sum(raw^2) >= 1e14 — a node with degree >= ~1e7); "
                "shard the hot node or lower the lattice scale"
            )
        )
    )


def hits(
    edges: DataFrame, n_iters: int = 8, checkpoint_every: int = 2
) -> DataFrame:
    """HITS hubs-and-authorities by fixed-round mutual recursion over a
    DIRECTED edge list: a(v) = Σ_{u→v} h(u), h(u) = Σ_{u→v} a(v), each
    L2-normalized per round (Kleinberg 1999). On the user→merchant
    bipartite graph, hub scores rank users by how broadly they touch
    high-traffic merchants, authority scores rank merchants — the
    complementary eigenvector pair to PageRank's single stationary
    vector.

    Same determinism/scale recipe as :func:`pagerank`: per-round 12-dp
    resync rounding against an unrolled-CTE oracle, src/dst-keyed joins
    and aggregations only, `localCheckpoint` lineage cuts every
    `checkpoint_every` rounds. Output: one row per node with its role
    ('hub' for sources, 'authority' for destinations) and 9-dp score.
    """
    if n_iters < 1:
        raise ValueError("hits() needs at least one iteration")
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    hubs = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "h", F.lit(1.0)
    ).localCheckpoint(eager=True)
    # Exact-summation recipe (r7; replaces the r6 DECIMAL(19,12) per-edge
    # sums with the scaled-int64 lattice — same bit-exactness, integer-sum
    # cost on the hot per-edge aggregations): scores are 12-dp doubles in
    # [0, 1], so floor(h*1e12 + 0.5) recovers each score's exact lattice
    # integer (fp error of h*1e12 is ≲1e-4 ≪ 0.5) identically in both
    # engines, and the per-node long sums are order-independent. Only the
    # node-cardinality L2 norm still sums in DECIMAL — (19,0)² products
    # summed at (38,0), exact while Σ(raw·1e12)² < 1e38, i.e. Σ raw² <
    # 1e14 (NOT raw<1e6 with 1e6 nodes as r6/r7 claimed — that sits at
    # ~1e42, 4 orders past the cap). On iteration 1 raw equals in-degree,
    # so one hot node with in-degree ≥ ~1e7 would overflow the sum; the
    # norm select below guards that explicitly (a NULL/invalid norm
    # raises instead of silently nulling every score — DuckDB's HUGEINT
    # raises on the same overflow, so the engines stay aligned). The 1e12
    # scale cancels in score/norm, so the quotient needs no rescale.
    for it in range(n_iters):
        cp = (it + 1) % checkpoint_every == 0 or it == n_iters - 1
        a_raw = (
            edges.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(
                F.sum(
                    F.floor(F.col("h") * F.lit(1e12) + F.lit(0.5))
                ).alias("a_raw")
            )
        )
        a_norm = a_raw.agg(
            F.sqrt(
                F.sum(
                    F.col("a_raw").cast("decimal(19,0)")
                    * F.col("a_raw").cast("decimal(19,0)")
                ).cast("double")
            ).alias("nrm")
        )
        auths = a_raw.crossJoin(F.broadcast(a_norm)).select(
            F.col("dst").alias("node"),
            F.round(
                F.col("a_raw").cast("double") / _guarded_norm("authority"),
                12,
            ).alias("a"),
        )
        if cp:
            # checkpoint auths BEFORE building h_raw from it (r7): the
            # hubs checkpoint then costs a single join+agg from the fresh
            # auths snapshot. The r6 order (both checkpointed after the
            # full iteration was wired) recomputed the un-checkpointed
            # a_i ← h_{i-1} ← a_{i-1} chain inside the hubs job — ~7
            # join+agg phases per 2 iterations instead of 4.
            auths = auths.localCheckpoint(eager=True)
        h_raw = (
            edges.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(
                F.sum(
                    F.floor(F.col("a") * F.lit(1e12) + F.lit(0.5))
                ).alias("h_raw")
            )
        )
        h_norm = h_raw.agg(
            F.sqrt(
                F.sum(
                    F.col("h_raw").cast("decimal(19,0)")
                    * F.col("h_raw").cast("decimal(19,0)")
                ).cast("double")
            ).alias("nrm")
        )
        hubs = h_raw.crossJoin(F.broadcast(h_norm)).select(
            F.col("src").alias("node"),
            F.round(
                F.col("h_raw").cast("double") / _guarded_norm("hub"), 12
            ).alias("h"),
        )
        if cp:
            hubs = hubs.localCheckpoint(eager=True)
    return hubs.select(
        "node",
        F.lit("hub").alias("role"),
        (F.round(F.col("h"), 9) + F.lit(0.0)).alias("score"),
    ).union(
        auths.select(
            "node",
            F.lit("authority").alias("role"),
            (F.round(F.col("a"), 9) + F.lit(0.0)).alias("score"),
        )
    )


def _score_map(df: DataFrame, key: str, val) -> DataFrame:
    """One-row map<key → 1e12-lattice long> of a SMALL score frame —
    broadcast into the per-iteration adjacency pass of the small-side
    bipartite kernels. The floor is the same per-edge lattice snap the
    generic kernels compute after their join; hoisting it to one row per
    small-side node is exact because the snapped integer depends only on
    the node, never the edge."""
    return df.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(key), val.alias("v")))
        ).alias("_m")
    )


def pagerank_bipartite_smallside(
    edges: DataFrame,
    n_iters: int = 8,
    damping: float = 0.85,
    max_small_side: int = 2_000_000,
) -> DataFrame:
    """PageRank over the SYMMETRIZED bipartite graph (`a`, `b` columns,
    distinct pairs, disjoint id domains), specialized for a bounded-small
    `b` side — bit-identical to
    ``pagerank(edges.union(edges.reversed))`` (pytest-pinned equivalence)
    but structurally cheaper: the symmetrized edge list is never
    materialized and NO per-iteration edge join runs. Instead the `a`-side
    adjacency ``(a, [b...], outdeg)`` is grouped ONCE (one shuffle total),
    and each iteration is

    - a-side update: broadcast the b-side's per-node lattice
      contributions as a one-row map (the broadcast-join idiom, one row ×
      |b| entries) and fold each adjacency array in-partition — zero
      shuffle;
    - b-side update: explode the adjacency with the per-`a` lattice
      contribution and hash-aggregate — the shuffle carries only
      |b| × n_partitions partial rows.

    Per iteration that is ONE adjacency pass (r11): the a-side rank is a
    pure expression of the previous b-side map, so it is folded INLINE in
    the b-update scan and the big (a, bs) frame is never re-materialized
    — only the |b|-row mb frame checkpoints each round (the r10 loop
    paid two adjacency-scale passes plus a full-adjacency localCheckpoint
    per round). At the 10M-event anchor (~150k users × 100 categories)
    the generic kernel's two edge-join+agg phases are likewise avoided
    (~14M join-probe rows per round).

    Scale contract: the map broadcast bounds the small side the same way
    a broadcast join bounds its build side — ~2M entries ≈ 32 MB. Above
    ``max_small_side`` the function falls back to the generic
    :func:`pagerank`, which has no small-side requirement. The exact
    arithmetic is the generic kernel's unchanged (per-edge
    floor(rank/outdeg·1e12+0.5) snaps, order-independent long sums,
    12-dp per-iteration resync), so the unrolled-CTE DuckDB oracle of
    `pagerank_bipartite` applies verbatim.
    """
    edges = edges.select("a", "b").localCheckpoint(eager=True)
    adj = (
        edges.groupBy("a")
        .agg(
            F.collect_list("b").alias("bs"),
            F.count(F.lit(1)).alias("outdeg"),
        )
        .localCheckpoint(eager=True)
    )
    bdeg = (
        edges.groupBy("b")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    n_a, n_b = adj.count(), bdeg.count()
    if n_b > max_small_side:
        sym = edges.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        return pagerank(sym, n_iters=n_iters, damping=damping)
    n = n_a + n_b
    if n == 0:
        return adj.select(F.col("a").alias("node")).withColumn(
            "pagerank", F.lit(0.0)
        )
    base = (1.0 - damping) / n
    lattice = lambda r: F.floor(  # noqa: E731  — the generic per-edge snap
        F.col(r) / F.col("outdeg") * F.lit(1e12) + F.lit(0.5)
    )
    rank_of = lambda c: F.round(  # noqa: E731
        F.lit(base)
        + F.lit(damping) * (F.col(c).cast("double") / F.lit(1e12)),
        12,
    )
    fold_bs = F.aggregate(  # Σ over bs of the broadcast map's lattice entries
        "bs",
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.element_at(F.col("_m"), x),
    )
    # r11 optimization (guide §2.4/§5): the a-side rank is a PURE
    # EXPRESSION of the previous b-side map — rank_of(fold(bs, bmap)) —
    # so the big (a, bs) frame is never re-materialized with rank
    # columns. Only the |b|-row mb frame is checkpointed per iteration;
    # each iteration is ONE adjacency pass (the old loop paid two
    # adjacency-scale passes PLUS a full-adjacency localCheckpoint per
    # round). mb_k consumes ua_{k-1}.r = rank_of(fold(bs, map(mb_{k-2}))),
    # evaluated inline in the same scan — identical double arithmetic to
    # the materialized column, bit-equal (pytest-pinned vs the generic
    # kernel).
    # only mb_{k-2}, mb_{k-1} and the final frame are ever read, so the
    # loop keeps a two-slot window instead of the full history (r12): a
    # dropped reference lets the ContextCleaner release that iteration's
    # checkpoint blocks instead of pinning n_iters |b|-row snapshots in
    # executor storage for the whole build.
    mb_prev2 = None  # mb_{k-2} while building mb_k
    mb_prev1 = bdeg.withColumn("r", F.lit(1.0 / n))  # mb_0 = uniform init
    for k in range(1, n_iters + 1):
        if k == 1:
            src = adj.withColumn("_r", F.lit(1.0 / n))
        else:
            bmap_prev = _score_map(mb_prev2, "b", lattice("r"))
            src = adj.crossJoin(F.broadcast(bmap_prev)).withColumn(
                "_r",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * (fold_bs.cast("double") / F.lit(1e12)),
                    12,
                ),
            )
        mb_k = (
            src.select(
                F.floor(
                    F.col("_r") / F.col("outdeg") * F.lit(1e12) + F.lit(0.5)
                ).alias("_w"),
                F.explode("bs").alias("b"),
            )
            .groupBy("b")
            .agg(F.sum("_w").alias("_c"))
            .join(F.broadcast(bdeg), "b")
            .select("b", "outdeg", rank_of("_c").alias("r"))
            .localCheckpoint(eager=True)
        )
        mb_prev2, mb_prev1 = mb_prev1, mb_k
    mb = mb_prev1
    if n_iters == 0:
        ua = adj.withColumn("r", F.lit(1.0 / n))
    else:
        bmap_final = _score_map(mb_prev2, "b", lattice("r"))
        ua = adj.crossJoin(F.broadcast(bmap_final)).select(
            "a",
            F.round(
                F.lit(base)
                + F.lit(damping) * (fold_bs.cast("double") / F.lit(1e12)),
                12,
            ).alias("r"),
        )
    out = lambda df, key: df.select(  # noqa: E731
        F.col(key).alias("node"),
        (F.round(F.col("r"), 9) + F.lit(0.0)).alias("pagerank"),
    )
    return out(ua, "a").union(out(mb, "b"))


def hits_smallside(
    edges: DataFrame,
    n_iters: int = 8,
    max_small_side: int = 2_000_000,
) -> DataFrame:
    """HITS over a DIRECTED bipartite edge list (`src`, `dst`, distinct
    pairs, disjoint id domains) specialized for a bounded-small `dst`
    side — bit-identical to :func:`hits` (pytest-pinned) with the same
    structural rewrite as :func:`pagerank_bipartite_smallside`: the
    src-side adjacency is grouped once, the authority step is an
    explode + tiny hash aggregate, the hub step folds each adjacency
    array against the one-row broadcast authority map in-partition. The
    exact arithmetic (1e12 lattice snaps, long sums, DECIMAL(38,0) L2
    norms with the overflow trap, 12-dp resync) is :func:`hits`'s
    unchanged, so the unrolled-CTE oracle applies verbatim. Falls back
    to the generic kernel above ``max_small_side`` authorities.
    """
    if n_iters < 1:
        raise ValueError("hits_smallside() needs at least one iteration")
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    adj = (
        edges.groupBy("src")
        .agg(F.collect_list("dst").alias("ds"))
        .localCheckpoint(eager=True)
    )
    n_dst = edges.select("dst").distinct().count()
    if n_dst > max_small_side:
        return hits(edges, n_iters=n_iters)
    snap = lambda c: F.floor(F.col(c) * F.lit(1e12) + F.lit(0.5))  # noqa: E731
    norm_of = lambda raw: F.sqrt(  # noqa: E731 — hits()'s exact norm
        F.sum(
            F.col(raw).cast("decimal(19,0)") * F.col(raw).cast("decimal(19,0)")
        ).cast("double")
    ).alias("nrm")
    hubs = adj.withColumn("h", F.lit(1.0))
    auths = None
    for _ in range(n_iters):
        # a_raw is checkpointed EAGERLY at |dst| rows (r12, guide §2.4):
        # the a_norm broadcast and the auths projection both consume it,
        # and without the checkpoint each re-ran the adjacency-scale
        # explode+aggregate — two fat passes per iteration where one
        # suffices (interleaved A/B: 7% sf0.1 / 10-15% 1M / 7% 10M).
        # auths then derives NARROWLY from the tiny checkpoint and needs
        # no checkpoint of its own (its two consumers — amap and the
        # final output — each redo one broadcast-crossJoin projection).
        a_raw = (
            hubs.select(snap("h").alias("_w"), F.explode("ds").alias("dst"))
            .groupBy("dst")
            .agg(F.sum("_w").alias("a_raw"))
            .localCheckpoint(eager=True)
        )
        a_norm = a_raw.agg(norm_of("a_raw"))
        auths = a_raw.crossJoin(F.broadcast(a_norm)).select(
            "dst",
            F.round(
                F.col("a_raw").cast("double") / _guarded_norm("authority"),
                12,
            ).alias("a"),
        )
        amap = _score_map(auths, "dst", snap("a"))
        h_raw = adj.crossJoin(F.broadcast(amap)).select(
            "src",
            "ds",
            F.aggregate(
                "ds",
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.element_at(F.col("_m"), x),
            ).alias("h_raw"),
        ).localCheckpoint(eager=True)
        h_norm = h_raw.agg(norm_of("h_raw"))
        # h is DERIVED lazily from the checkpointed h_raw (one division
        # per row in each consumer) — skipping a third array
        # materialization per iteration
        hubs = h_raw.crossJoin(F.broadcast(h_norm)).select(
            "src",
            "ds",
            F.round(
                F.col("h_raw").cast("double") / _guarded_norm("hub"), 12
            ).alias("h"),
        )
    return hubs.select(
        F.col("src").alias("node"),
        F.lit("hub").alias("role"),
        (F.round(F.col("h"), 9) + F.lit(0.0)).alias("score"),
    ).union(
        auths.select(
            F.col("dst").alias("node"),
            F.lit("authority").alias("role"),
            (F.round(F.col("a"), 9) + F.lit(0.0)).alias("score"),
        )
    )
