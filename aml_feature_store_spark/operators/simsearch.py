"""Similarity search over embedding columns (SURVEY §2.11 X3).

Brute-force cosine top-k as the exactness baseline, and an IVF-style
(inverted-file) bucketed variant as the scale path. Embeddings are
``array<float>`` columns; all math is done after an explicit cast to
double so engine results are reproducible (float32 accumulation order
would not be).

Scale notes (100 TB): brute force is a broadcast of the query set against
a partition-parallel scan of the corpus — linear, no shuffle, but O(Q·N)
work. IVF cuts work to O(Q·N/k): assign corpus vectors to their nearest
of k centroids (one broadcast-join pass, cacheable), probe only the
query's closest centroid bucket(s). Recall < 1 by design — declared.
near_dup_pairs_bucketed is the exception: its bucket-pair pruning is
triangle-inequality-complete, so it is EXACT (identical to the all-pairs
threshold scan) while never building a cartesian plan node.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), "
    "(s, v) -> s + v)"
)


def _dbl(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add `_v` (double vector) and `_norm` columns."""
    return df.withColumn("_v", F.expr(_dbl(vec_col))).withColumn(
        "_norm", F.expr("sqrt(" + _DOT.format(a="_v", b="_v") + ")")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, vec_id, cosine, rank).

    Query set is broadcast; corpus never shuffles. Cosine is rounded to
    8 dp (absorbs sub-ulp fold differences) and ties break on vec_id so
    the top-k set is fully deterministic.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    dot = F.expr(_DOT.format(a="_qv", b="_cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "cosine",
            F.when(
                (F.col("_qn") * F.col("_cn")) != 0.0,
                F.round(dot / (F.col("_qn") * F.col("_cn")), 8),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk_sql(
    n_queries: int = 5, k: int = 10, table: str = "embeddings"
) -> str:
    """DuckDB oracle for cosine_topk with queries = vec_id < n_queries."""
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
), n AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         CASE WHEN q.nrm * c.nrm != 0.0
           THEN ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 8)
           ELSE 0.0 END AS cosine
  FROM n q JOIN n c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {n_queries}
)
SELECT query_id, vec_id, cosine,
       rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


KMEANS_QUANT = "1000000.0"  # per-dim means quantized to 1e-6 (see kmeans_centroids)


def _kmeans_cents_ctes(n_centroids: int, n_iters: int) -> str:
    """CTE chain unrolling n_iters Lloyd iterations over the `n` relation
    (vec_id, v, nrm) — the DuckDB mirror of :func:`kmeans_centroids`.
    Produces cents0 (seed = first n_centroids ids) … cents{n_iters}."""
    parts = [
        f"""cents0 AS (
  SELECT vec_id AS centroid_id, v AS cen_v, nrm AS cen_n
  FROM n WHERE vec_id < {n_centroids}
)"""
    ]
    for i in range(n_iters):
        parts.append(f"""sims_k{i} AS (
  SELECT n.vec_id, c.centroid_id, n.v,
         CASE WHEN n.nrm * c.cen_n != 0.0
           THEN ROUND(list_dot_product(n.v, c.cen_v) / (n.nrm * c.cen_n), 8)
           ELSE 0.0 END AS sim
  FROM n CROSS JOIN cents{i} c
)""")
        parts.append(f"""assign_k{i} AS (
  SELECT vec_id, centroid_id, v FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, centroid_id) AS rn
    FROM sims_k{i}
  ) WHERE rn = 1
)""")
        parts.append(f"""quant_k{i} AS (
  SELECT centroid_id,
         UNNEST(range(1, len(v) + 1)) AS pos,
         UNNEST(list_transform(v,
                x -> CAST(floor(x * {KMEANS_QUANT}) AS BIGINT))) AS q
  FROM assign_k{i}
)""")
        parts.append(f"""dims_k{i} AS (
  SELECT centroid_id, pos,
         CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / {KMEANS_QUANT} AS comp
  FROM quant_k{i} GROUP BY centroid_id, pos
)""")
        parts.append(f"""newv_k{i} AS (
  SELECT centroid_id, list(comp ORDER BY pos) AS new_v
  FROM dims_k{i} GROUP BY centroid_id
)""")
        parts.append(f"""cents{i + 1} AS (
  SELECT c.centroid_id, COALESCE(nv.new_v, c.cen_v) AS cen_v,
         sqrt(list_sum(list_transform(COALESCE(nv.new_v, c.cen_v),
                                      x -> x * x))) AS cen_n
  FROM cents{i} c LEFT JOIN newv_k{i} nv USING (centroid_id)
)""")
    return ",\n".join(parts)


def ivf_topk_sql(
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 8,
    table: str = "embeddings",
    n_probes: int = 1,
    refine_iters: int = 0,
) -> str:
    """DuckDB oracle for ivf_topk — the full pipeline (seed or k-means
    refined centroids, nearest-centroid assignment, bucket-restricted
    scoring, multi-probe) is deterministic, so the ANN path is exactly
    checkable, not rows-only."""
    cents = f"cents{refine_iters}"
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}
), n AS (
  SELECT vec_id, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM e
), {_kmeans_cents_ctes(n_centroids, refine_iters)}, sims AS (
  SELECT n.vec_id, {cents}.centroid_id,
         CASE WHEN n.nrm * {cents}.cen_n != 0.0
           THEN ROUND(list_dot_product(n.v, {cents}.cen_v) / (n.nrm * {cents}.cen_n), 8)
           ELSE 0.0 END AS sim
  FROM n CROSS JOIN {cents}
), ranked AS (
  SELECT vec_id, centroid_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, centroid_id) AS rn
  FROM sims
), assigned AS (
  SELECT vec_id, centroid_id FROM ranked WHERE rn = 1
), q AS (
  SELECT r.vec_id AS query_id, r.centroid_id AS q_cent, n.v AS q_v, n.nrm AS q_n
  FROM ranked r JOIN n ON r.vec_id = n.vec_id
  WHERE r.rn <= {n_probes} AND r.vec_id < {n_queries}
), scored AS (
  SELECT q.query_id, c.vec_id,
         CASE WHEN q.q_n * c.nrm != 0.0
           THEN ROUND(list_dot_product(q.q_v, c.v) / (q.q_n * c.nrm), 8)
           ELSE 0.0 END AS cosine
  FROM n c JOIN assigned a ON c.vec_id = a.vec_id
  JOIN q ON a.centroid_id = q.q_cent AND q.query_id != c.vec_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def recall_at_k(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query recall@k of an ANN result vs the exact top-k: join the
    exact set to the approx set and count hits. Both inputs are
    (query_id, vec_id, ...) top-k frames."""
    hit = approx.select("query_id", "vec_id").withColumn("_hit", F.lit(1))
    joined = exact.select("query_id", "vec_id").join(
        hit, ["query_id", "vec_id"], "left"
    )
    agg = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("_hit").alias("n_hit"),
    )
    return agg.select(
        "query_id",
        "n_exact",
        "n_hit",
        F.when(
            F.col("n_exact") != 0,
            F.col("n_hit").cast("double") / F.col("n_exact").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("recall_at_k"),
    )


def recall_at_k_sql(
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 8,
    table: str = "embeddings",
) -> str:
    """DuckDB oracle for recall_at_k(ivf vs brute force)."""
    return f"""
WITH exact_k AS ({cosine_topk_sql(n_queries, k, table)}),
approx_k AS ({ivf_topk_sql(n_queries, k, n_centroids, table)}),
joined AS (
  SELECT e.query_id, a.vec_id AS hit
  FROM exact_k e LEFT JOIN approx_k a
    ON e.query_id = a.query_id AND e.vec_id = a.vec_id
)
SELECT query_id, COUNT(*) AS n_exact, COUNT(hit) AS n_hit,
  CASE WHEN COUNT(*) != 0
    THEN CAST(COUNT(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    ELSE 0.0 END AS recall_at_k
FROM joined GROUP BY query_id
"""


def recall_refined_sql(
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 8,
    n_iters: int = 2,
    table: str = "embeddings",
) -> str:
    """DuckDB oracle for the seed-vs-refined recall@k comparison: both
    IVF pipelines (seed centroids, k-means-refined centroids) scored
    against the exact top-k in one result."""
    return f"""
WITH exact_k AS ({cosine_topk_sql(n_queries, k, table)}),
seed_k AS ({ivf_topk_sql(n_queries, k, n_centroids, table)}),
ref_k AS ({ivf_topk_sql(n_queries, k, n_centroids, table, refine_iters=n_iters)}),
seed_j AS (
  SELECT e.query_id, a.vec_id AS hit
  FROM exact_k e LEFT JOIN seed_k a
    ON e.query_id = a.query_id AND e.vec_id = a.vec_id
),
ref_j AS (
  SELECT e.query_id, a.vec_id AS hit
  FROM exact_k e LEFT JOIN ref_k a
    ON e.query_id = a.query_id AND e.vec_id = a.vec_id
),
seed_r AS (
  SELECT query_id,
    CASE WHEN COUNT(*) != 0
      THEN CAST(COUNT(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      ELSE 0.0 END AS recall_seed
  FROM seed_j GROUP BY query_id
),
ref_r AS (
  SELECT query_id,
    CASE WHEN COUNT(*) != 0
      THEN CAST(COUNT(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      ELSE 0.0 END AS recall_refined
  FROM ref_j GROUP BY query_id
)
SELECT query_id, recall_seed, recall_refined
FROM seed_r JOIN ref_r USING (query_id)
"""


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration Lloyd refinement of the IVF seed centroids,
    deterministic across engines AND partitionings: the update step's
    per-dimension mean is computed as an exact BIGINT sum of
    floor(x·1e6)-quantized components divided by the count — integer
    addition is order-independent, so the refined centroids are
    bit-identical no matter how Spark (or DuckDB, in the mirrored
    oracle) orders the sum. Assignment uses the same ROUND(cos, 8) +
    centroid_id tiebreak as ivf_assign; empty clusters keep their
    previous centroid. Returns (centroid_id, _cenv, _cenn).

    Scale shape: per iteration one broadcast of k tiny centroids against
    the corpus (no corpus shuffle), then one (centroid, dim)-key
    aggregation over the posexploded assignments — n·d rows map-side
    combined down to k·d. No collect; n_iters is a constant (default 2).
    """
    quant = float(KMEANS_QUANT)
    c = with_norm(corpus, vec_col).select(id_col, "_v", "_norm")
    cents = c.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"),
        F.col("_v").alias("_cenv"),
        F.col("_norm").alias("_cenn"),
    )
    dot = F.expr(_DOT.format(a="_v", b="_cenv"))
    for _ in range(n_iters):
        sims = c.crossJoin(F.broadcast(cents)).withColumn(
            "_sim",
            F.when(
                (F.col("_norm") * F.col("_cenn")) != 0.0,
                F.round(dot / (F.col("_norm") * F.col("_cenn")), 8),
            ).otherwise(F.lit(0.0)),
        )
        w = Window.partitionBy(id_col).orderBy(
            F.col("_sim").desc(), F.col("centroid_id")
        )
        assigned = (
            sims.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("centroid_id", "_v")
        )
        dims = (
            assigned.select(
                "centroid_id", F.posexplode("_v").alias("pos", "val")
            )
            .withColumn("q", F.floor(F.col("val") * quant).cast("long"))
            .groupBy("centroid_id", "pos")
            .agg(
                (
                    F.sum("q").cast("double")
                    / F.count(F.lit(1)).cast("double")
                    / F.lit(quant)
                ).alias("comp")
            )
        )
        newv = dims.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "comp"))),
                lambda s: s["comp"],
            ).alias("_newv")
        )
        cents = (
            cents.join(newv, "centroid_id", "left")
            .select(
                "centroid_id", F.coalesce("_newv", "_cenv").alias("_cenv")
            )
            .withColumn(
                "_cenn", F.expr("sqrt(" + _DOT.format(a="_cenv", b="_cenv") + ")")
            )
        )
    return cents


def _centroid_ranked(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Every (vector, centroid) similarity ranked per vector: `_rn` 1 is
    the nearest centroid. Centroids default to the first n_centroids
    vectors by id (deterministic seed); pass `centroids` (centroid_id,
    _cenv, _cenn — e.g. from kmeans_centroids) to rank against refined
    ones without changing any downstream shape."""
    c = with_norm(corpus, vec_col)
    cents = (
        centroids
        if centroids is not None
        else c.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"),
            F.col("_v").alias("_cenv"),
            F.col("_norm").alias("_cenn"),
        )
    )
    dot = F.expr(_DOT.format(a="_v", b="_cenv"))
    scored = c.crossJoin(F.broadcast(cents)).withColumn(
        "_sim",
        F.when(
            (F.col("_norm") * F.col("_cenn")) != 0.0,
            F.round(dot / (F.col("_norm") * F.col("_cenn")), 8),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_sim").desc(), F.col("centroid_id")
    )
    return scored.withColumn("_rn", F.row_number().over(w))


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantization with deterministic seed (or provided,
    e.g. k-means-refined) centroids. Returns corpus + `centroid_id`."""
    return (
        _centroid_ranked(corpus, n_centroids, id_col, vec_col, centroids)
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "centroid_id", F.col("_sim").alias("centroid_sim"))
    )


def near_dup_pairs_bucketed(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold, via IVF buckets — EXACT, no
    cartesian (X2 embedding near-dup; reference semantics: the all-pairs
    cosine scan of similarity_dedup in the reference's dedup tooling).

    Completeness argument (spherical triangle inequality): for vectors
    u, v assigned to centroids ci, cj with assignment angles ≤ r_i, r_j
    (the per-bucket max — its angular radius),

        angle(u, v) ≥ angle(ci, cj) − r_i − r_j.

    So a pair can only reach angle(u,v) ≤ θ_t = arccos(threshold) if its
    bucket pair satisfies angle(ci, cj) ≤ θ_t + r_i + r_j. Joining only
    those bucket pairs and exact-verifying the cosine therefore yields
    the identical row set to the O(n²) scan — pruning affects work, not
    output. With k centroids the candidate volume is Σ|B_i||B_j| over
    qualifying pairs: on clustered real data radii shrink and far bucket
    pairs drop; worst case (uniform sphere) degenerates to the same
    total comparisons as brute force but still through equi-joins, never
    a BroadcastNestedLoopJoin/CartesianProduct node.

    Physical plan: one broadcast-centroid assignment pass, one tiny
    (k rows, metadata-scale) collect for centroid vectors + radii, then
    bucket-pair equi-joins. The ε slack on the pruning predicate absorbs
    arccos round-off; it can only ADD candidate bucket pairs, never drop
    a qualifying one.
    """
    spark = corpus.sparkSession
    # metadata-scale driver read #1: the k centroid vectors (first k ids —
    # same deterministic seed as ivf_assign; refined centroids plug in here
    # without changing any downstream shape)
    cents = {
        r["centroid_id"]: r["_v"]
        for r in with_norm(corpus, vec_col)
        .filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("centroid_id"), "_v")
        .collect()
    }

    def _unit(v: list[float]) -> list[float]:
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n != 0.0 else v

    units = {i: _unit(v) for i, v in cents.items()}
    # assignment as a pure codegen'd expression over LITERAL centroids: one
    # dot product per centroid, argmax via struct-array min (ties -> lowest
    # centroid id) — no join node, unlike the broadcast crossJoin that
    # ivf_assign uses for its (oracle-mirrored) formulation. The pruning
    # argument only needs the assignment to be self-consistent with the
    # radii below, which it is by construction.
    def _cos_expr(unit_vec: list[float]) -> F.Column:
        arr = "array(" + ", ".join(f"cast({x!r} as double)" for x in unit_vec) + ")"
        d = F.expr(_DOT.format(a="_v", b=arr))
        return F.when(F.col("_norm") != 0.0, d / F.col("_norm")).otherwise(F.lit(0.0))

    choice = F.array_min(
        F.array(
            *[
                F.struct(
                    (-_cos_expr(units[i])).alias("negcos"),
                    F.lit(i).cast("long").alias("cid"),
                )
                for i in sorted(units)
            ]
        )
    )
    sided = (
        with_norm(corpus, vec_col)
        .withColumn("_ch", choice)
        .select(
            F.col(id_col).alias("_id"),
            F.col("_ch.cid").alias("_b"),
            "_v",
            "_norm",
            F.acos(
                F.least(F.greatest(-F.col("_ch.negcos"), F.lit(-1.0)), F.lit(1.0))
            ).alias("_ang"),
        )
    )
    # metadata-scale driver read #2: per-bucket angular radius
    radii = {
        r["_b"]: r["_r"]
        for r in sided.groupBy("_b").agg(F.max("_ang").alias("_r")).collect()
    }

    def _angle(a: list[float], b: list[float]) -> float:
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0.0 or nb == 0.0:
            return math.pi / 2
        cos = sum(x * y for x, y in zip(a, b)) / (na * nb)
        return math.acos(max(-1.0, min(1.0, cos)))

    theta = math.acos(threshold)
    # slack absorbing engine-vs-driver float differences in the angles; it
    # can only add candidate bucket pairs, never drop a qualifying one
    eps = 1e-6
    pairs = [
        (i, j)
        for i in radii
        for j in radii
        if _angle(cents[i], cents[j]) <= theta + radii[i] + radii[j] + eps
    ]
    bp = spark.createDataFrame(pairs, "b1 long, b2 long")
    a = sided.select(
        F.col("_id").alias("v1"), F.col("_b").alias("b1"),
        F.col("_v").alias("_va"), F.col("_norm").alias("_na"),
    )
    b = sided.select(
        F.col("_id").alias("v2"), F.col("_b").alias("b2"),
        F.col("_v").alias("_vb"), F.col("_norm").alias("_nb"),
    )
    dot = F.expr(_DOT.format(a="_va", b="_vb"))
    return (
        a.join(F.broadcast(bp), "b1")
        .join(b, "b2")
        .filter(F.col("v1") < F.col("v2"))
        .withColumn(
            "cosine",
            F.when(
                (F.col("_na") * F.col("_nb")) != 0.0,
                F.round(dot / (F.col("_na") * F.col("_nb")), 8),
            ).otherwise(F.lit(0.0)),
        )
        .filter(F.col("cosine") >= threshold)
        .select("v1", "v2", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
    refine_iters: int = 0,
) -> DataFrame:
    """ANN top-k probing the query's n_probes nearest centroid buckets
    (recall < 1 by design vs cosine_topk — the documented IVF trade;
    multi-probe buys recall back for n_probes/n_centroids of the
    brute-force work). refine_iters > 0 runs that many deterministic
    Lloyd iterations (kmeans_centroids) before assignment, improving
    recall without touching the search shape."""
    centroids = (
        kmeans_centroids(corpus, n_centroids, refine_iters, id_col, vec_col)
        if refine_iters
        else None
    )
    assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, centroids)
    # queries are corpus members here (self-search); probe their own
    # nearest bucket(s)
    q = (
        _centroid_ranked(corpus, n_centroids, id_col, vec_col, centroids)
        .filter(F.col("_rn") <= n_probes)
        .join(
            queries.select(F.col(id_col).alias("_qid")),
            F.col(id_col) == F.col("_qid"),
            "left_semi",
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col("centroid_id").alias("_qcent"),
            F.col("_v").alias("_qv"),
            F.col("_norm").alias("_qn"),
        )
    )
    c = with_norm(assigned, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col("centroid_id"),
        F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    dot = F.expr(_DOT.format(a="_qv", b="_cv"))
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("centroid_id") == F.col("_qcent"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .withColumn(
            "cosine",
            F.when(
                (F.col("_qn") * F.col("_cn")) != 0.0,
                F.round(dot / (F.col("_qn") * F.col("_cn")), 8),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# --- persistent IVF index ----------------------------------------------------


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 8,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: the assigned corpus written
    ``partitionBy(centroid_id)`` (so probing reads ONLY the probed
    buckets via partition pruning — at 100 TB a 1-probe query over k
    lists touches 1/k of the data, which is the entire point of
    persisting) plus the centroid table. Norms are precomputed so query
    time pays no per-vector normalization. Build once, query many —
    ``ivf_index_topk`` is the read side.
    """
    import os

    centroids = (
        kmeans_centroids(corpus, n_centroids, refine_iters, id_col, vec_col)
        if refine_iters
        else with_norm(corpus, vec_col)
        .filter(F.col(id_col) < n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col("_v").alias("_cenv"),
            F.col("_norm").alias("_cenn"),
        )
    )
    assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, centroids)
    with_norm(assigned, vec_col).select(
        F.col(id_col), F.col("_v"), F.col("_norm"), F.col("centroid_id")
    ).write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(path, "vectors")
    )
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a persisted IVF index: rank the query against
    the stored centroids (broadcast), collect the probed bucket ids
    (bounded by |queries| × n_probes), and scan ONLY those partitions of
    the vector table — the filter is a literal IN over the partition
    column, so it prunes at the file listing, never reading unprobed
    buckets. Scoring/ranking is identical to :func:`ivf_topk` (same
    rounding, same tiebreaks), so index round-trip results are
    bit-identical to the in-memory path."""
    import os

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    dot = F.expr(_DOT.format(a="_qv", b="_cenv"))
    ranked = q.crossJoin(F.broadcast(cents)).withColumn(
        "_sim",
        F.when(
            (F.col("_qn") * F.col("_cenn")) != 0.0,
            F.round(dot / (F.col("_qn") * F.col("_cenn")), 8),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("centroid_id")
    )
    probed = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_probes)
        .select("query_id", F.col("centroid_id").alias("_qcent"), "_qv", "_qn")
    )
    bucket_ids = [
        r["_qcent"] for r in probed.select("_qcent").distinct().collect()
    ]  # bounded: <= |queries| * n_probes
    vec = (
        spark.read.parquet(os.path.join(path, "vectors"))
        .filter(F.col("centroid_id").isin(bucket_ids))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col("centroid_id"),
            F.col("_v").alias("_cv"),
            F.col("_norm").alias("_cn"),
        )
    )
    dot2 = F.expr(_DOT.format(a="_qv", b="_cv"))
    scored = vec.join(
        F.broadcast(probed),
        (F.col("centroid_id") == F.col("_qcent"))
        & (F.col("query_id") != F.col("vec_id")),
    ).withColumn(
        "cosine",
        F.when(
            (F.col("_qn") * F.col("_cn")) != 0.0,
            F.round(dot2 / (F.col("_qn") * F.col("_cn")), 8),
        ).otherwise(F.lit(0.0)),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def pca_top_component(
    emb: DataFrame,
    n_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component of the embedding corpus by distributed
    power iteration — X3-family corpus analytics (dominant variance
    direction for whitening / drift monitoring / 1-D compression).

    The covariance matrix is never materialized: each round applies
    C·z = Σ_v (x_v − μ)((x_v − μ)·z) / N as two aggregations over the
    exploded (id, dim, centered-value) table — a dim-keyed broadcast
    join + id-keyed aggregation for the scores s_v, then an id-keyed
    join + dim-keyed aggregation for the update. At 100 TB the exploded
    table is the big operand and everything joins it on its own keys;
    the z and s frames are d- and N-row side tables (s rides a shuffle
    join at real N). Determinism mirrors the PageRank/k-means pattern:
    μ rounds to 9 dp, each normalized iterate to 12 dp, the output
    loadings to 9 dp — the DuckDB oracle unrolls the same rounds as
    CTEs and matches bit-exactly (sign and all, since both engines run
    the identical deterministic recurrence from the uniform start).
    """
    e = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "val")
    ).select(id_col, "dim", F.col("val").cast("double").alias("val"))
    # exact-summation mean (r6, ADVICE r5): 9-dp-rounded addends convert
    # to DECIMAL(38,12) exactly (magnitude << 2e3), decimal sums are
    # integer-exact, so the mean cannot depend on either engine's
    # summation order before the 9-dp resync rounding.
    mu = e.groupBy("dim").agg(
        F.round(
            F.sum(F.round(F.col("val"), 9).cast("decimal(38,12)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            9,
        ).alias("mu")
    )
    centered = (
        e.join(F.broadcast(mu), "dim")
        .select(id_col, "dim", (F.col("val") - F.col("mu")).alias("vc"))
        .localCheckpoint(eager=True)
    )
    n = centered.select(id_col).distinct().count()
    d = centered.select("dim").distinct().count()
    z = (
        centered.select("dim")
        .distinct()
        .withColumn("z", F.lit(round(1.0 / d**0.5, 12)))
    )
    for it in range(n_iters):
        # every aggregation sums 12-dp-rounded addends in DECIMAL — the
        # iteration's arithmetic is independent of partition/engine
        # summation order (same recipe as pagerank/hits, ADVICE r5)
        s = (
            centered.join(F.broadcast(z), "dim")
            .groupBy(id_col)
            .agg(
                F.sum(
                    F.round(F.col("vc") * F.col("z"), 12).cast(
                        "decimal(38,15)"
                    )
                )
                .cast("double")
                .alias("s")
            )
        )
        zraw = (
            centered.join(s, id_col)
            .groupBy("dim")
            .agg(
                F.round(
                    F.sum(
                        F.round(F.col("vc") * F.col("s"), 12).cast(
                            "decimal(38,15)"
                        )
                    ).cast("double")
                    / F.lit(float(n)),
                    12,
                ).alias("zraw")
            )
        )
        norm = zraw.agg(
            F.sqrt(
                F.sum(
                    F.col("zraw").cast("decimal(18,12)")
                    * F.col("zraw").cast("decimal(18,12)")
                ).cast("double")
            ).alias("nrm")
        )
        z = zraw.crossJoin(F.broadcast(norm)).select(
            "dim", F.round(F.col("zraw") / F.col("nrm"), 12).alias("z")
        )
        if (it + 1) % 2 == 0 or it == n_iters - 1:
            z = z.localCheckpoint(eager=True)
    return z.select(
        "dim", (F.round(F.col("z"), 9) + F.lit(0.0)).alias("loading")
    )


def pca_top_component_sql(
    n_iters: int = 8, table: str = "embeddings", id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Unrolled power-iteration CTE oracle for :func:`pca_top_component`
    (DuckDB generate_subscripts is 1-based; shifted to match posexplode)."""
    head = f"""
WITH e AS (
  SELECT {id_col},
         generate_subscripts({vec_col}, 1) - 1 AS dim,
         CAST(unnest({vec_col}) AS DOUBLE) AS val
  FROM {table}
),
mu AS MATERIALIZED (
  SELECT dim,
         round(CAST(SUM(CAST(round(val, 9) AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(*), 9) AS mu
  FROM e GROUP BY dim
),
centered AS MATERIALIZED (
  SELECT e.{id_col}, e.dim, e.val - m.mu AS vc FROM e JOIN mu m USING (dim)
),
nn AS (SELECT CAST(COUNT(DISTINCT {id_col}) AS DOUBLE) AS n FROM centered),
dd AS (SELECT CAST(COUNT(DISTINCT dim) AS DOUBLE) AS d FROM centered),
z0 AS MATERIALIZED (SELECT DISTINCT dim, round(1.0 / sqrt((SELECT d FROM dd)), 12) AS z
       FROM centered)"""
    cte = ""
    for i in range(1, n_iters + 1):
        cte += f""",
s{i} AS MATERIALIZED (
  SELECT c.{id_col},
         CAST(SUM(CAST(round(c.vc * z.z, 12) AS DECIMAL(38,15))) AS DOUBLE)
           AS s
  FROM centered c JOIN z{i - 1} z USING (dim) GROUP BY c.{id_col}
),
zr{i} AS MATERIALIZED (
  SELECT c.dim,
         round(CAST(SUM(CAST(round(c.vc * s.s, 12) AS DECIMAL(38,15)))
                    AS DOUBLE) / (SELECT n FROM nn), 12) AS zraw
  FROM centered c JOIN s{i} s USING ({id_col}) GROUP BY c.dim
),
nrm{i} AS MATERIALIZED (
  SELECT sqrt(CAST(SUM(CAST(zraw AS DECIMAL(18,12))
                       * CAST(zraw AS DECIMAL(18,12))) AS DOUBLE)) AS nrm
  FROM zr{i}
),
z{i} AS MATERIALIZED (SELECT dim, round(zraw / (SELECT nrm FROM nrm{i}), 12) AS z FROM zr{i})"""
    return (
        head
        + cte
        + f"""
SELECT dim, round(z, 9) + 0.0 AS loading FROM z{n_iters}
"""
    )


def pca_scores(
    emb: DataFrame,
    n_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector projection onto the top principal component (the 1-D
    compression code) plus reconstruction error ‖x−μ‖² − score² — the
    variance NOT captured, a standard embedding-anomaly signal. Reuses
    the :func:`pca_top_component` recurrence; one extra dim-keyed
    broadcast join + id-keyed aggregation over the centered table."""
    e = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "val")
    ).select(id_col, "dim", F.col("val").cast("double").alias("val"))
    # exact-summation mean (r6, ADVICE r5): 9-dp-rounded addends convert
    # to DECIMAL(38,12) exactly (magnitude << 2e3), decimal sums are
    # integer-exact, so the mean cannot depend on either engine's
    # summation order before the 9-dp resync rounding.
    mu = e.groupBy("dim").agg(
        F.round(
            F.sum(F.round(F.col("val"), 9).cast("decimal(38,12)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            9,
        ).alias("mu")
    )
    centered = e.join(F.broadcast(mu), "dim").select(
        id_col, "dim", (F.col("val") - F.col("mu")).alias("vc")
    )
    comp = pca_top_component(emb, n_iters, id_col, vec_col).select(
        "dim", F.col("loading").alias("z")
    )
    return (
        centered.join(F.broadcast(comp), "dim")
        .groupBy(id_col)
        .agg(
            (
                F.round(
                    F.sum(
                        F.round(F.col("vc") * F.col("z"), 12).cast(
                            "decimal(38,15)"
                        )
                    ).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("score"),
            F.round(
                F.sum(
                    F.round(F.col("vc") * F.col("vc"), 12).cast(
                        "decimal(38,15)"
                    )
                ).cast("double"),
                6,
            ).alias("_ss"),
        )
        .select(
            id_col,
            "score",
            (
                F.round(F.col("_ss") - F.col("score") * F.col("score"), 6)
                + F.lit(0.0)
            ).alias("recon_err"),
        )
    )


def pca_scores_sql(
    n_iters: int = 8, table: str = "embeddings", id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle for :func:`pca_scores`: the component CTE chain plus the
    projection joins, same rounding points."""
    comp = pca_top_component_sql(n_iters, table, id_col, vec_col)
    # reuse the chain up to the final SELECT, then project
    body = comp.rsplit("SELECT dim,", 1)[0]
    return (
        body
        + f""",
comp AS MATERIALIZED (SELECT dim, round(z, 9) + 0.0 AS z FROM z{n_iters}),
proj AS (
  SELECT c.{id_col},
         round(CAST(SUM(CAST(round(c.vc * k.z, 12) AS DECIMAL(38,15)))
                    AS DOUBLE), 6) + 0.0 AS score,
         round(CAST(SUM(CAST(round(c.vc * c.vc, 12) AS DECIMAL(38,15)))
                    AS DOUBLE), 6) AS ss
  FROM centered c JOIN comp k USING (dim) GROUP BY c.{id_col}
)
SELECT {id_col}, score,
       round(ss - score * score, 6) + 0.0 AS recon_err
FROM proj
"""
    )
