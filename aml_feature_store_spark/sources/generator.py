"""Synthetic transaction generator (SURVEY §2.1 S9) — distributed, seeded.

Re-expresses the reference's pandas generator (reference:
offline_data/generate_sample_data.py:7-104: 50k txns, 1k customers, 500
merchants, lognormal(3, 1.5) amounts min 1.0, 80% of IPs from a hot pool,
5% suspicious with uniform 5k-50k amounts skewed to night hours, hot-key
customers taking 20% of traffic, seed 42) as ``spark.range(n)`` + column
expressions — no driver-side loop, so it scales to any row count and any
cluster, deterministic per (seed, n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def generate_transactions(
    spark: SparkSession,
    n: int = 50_000,
    n_customers: int = 1_000,
    n_merchants: int = 500,
    n_days: int = 30,
    suspicious_rate: float = 0.05,
    hot_customers: int = 100,
    hot_traffic_share: float = 0.2,
    seed: int = 42,
    start: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Deterministic synthetic transaction log with the reference's shape."""
    df = spark.range(n)
    u = lambda k: F.rand(seed + k)  # noqa: E731
    # hot-key skew: hot_traffic_share of rows drawn from the hot pool
    cust_idx = F.when(
        u(1) < hot_traffic_share,
        (u(2) * hot_customers).cast("int"),
    ).otherwise((u(3) * n_customers).cast("int"))
    suspicious = u(4) < suspicious_rate
    amount_normal = F.round(
        F.greatest(F.exp(F.randn(seed + 5) * 1.5 + 3.0), F.lit(1.0)), 2
    )
    amount_susp = F.round(u(6) * (50_000 - 5_000) + 5_000, 2)
    # suspicious events skew to night hours 2-5
    ts_uniform = F.to_timestamp(F.lit(start)) + F.make_dt_interval(
        days=F.lit(0), hours=F.lit(0), mins=F.lit(0),
        secs=u(7) * (n_days * 86400),
    )
    night_secs = (
        F.floor(u(8) * n_days).cast("double") * 86400
        + (F.lit(2 * 3600) + u(9) * (3 * 3600))
    )
    ts_susp = F.to_timestamp(F.lit(start)) + F.make_dt_interval(
        days=F.lit(0), hours=F.lit(0), mins=F.lit(0), secs=night_secs
    )
    ip_hot = F.concat(F.lit("192.168.1."), (u(10) * 50 + 1).cast("int").cast("string"))
    ip_cold = F.concat(
        (u(11) * 254 + 1).cast("int").cast("string"), F.lit("."),
        (u(12) * 254 + 1).cast("int").cast("string"), F.lit("."),
        (u(13) * 254 + 1).cast("int").cast("string"), F.lit("."),
        (u(14) * 254 + 1).cast("int").cast("string"),
    )
    ts = F.when(suspicious, ts_susp).otherwise(ts_uniform)
    out = df.select(
        F.sha2(F.concat(F.lit("txn-"), F.col("id").cast("string")), 256)
        .substr(1, 32)
        .alias("transaction_id"),
        F.format_string("CUST_%06d", cust_idx + 1).alias("customer_id"),
        F.format_string(
            "MERCH_%05d", (u(15) * n_merchants).cast("int") + 1
        ).alias("merchant_id"),
        F.when(suspicious, amount_susp).otherwise(amount_normal).alias("amount"),
        F.when(u(16) < 0.8, ip_hot).otherwise(ip_cold).alias("ip_address"),
        ts.alias("event_timestamp"),
        (F.weekday(ts) >= 5).alias("is_weekend"),
        F.hour(ts).alias("hour_of_day"),
        suspicious.alias("is_suspicious"),
    )
    return out


def write_event_log(df: DataFrame, path: str, ts_col: str = "event_timestamp") -> None:
    """Offline-store layout (S2): append-only parquet partitioned by event
    date so time predicates become partition pruning at 100 TB."""
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.mode("append")
        .partitionBy("event_date")
        .parquet(path)
    )


def generate_documents(
    spark: SparkSession,
    n: int = 50_000,
    vocab_size: int | None = None,
    n_sources: int = 20,
    near_dup_every: int = 10,
    seed: int = 42,
    exact_dup_frac: float = 0.0,
    gray_frac: float = 0.0,
) -> DataFrame:
    """Driver-testdata-shaped documents at arbitrary scale (doc_id, text,
    lang, source, n_chars): word-salad text over a small vocabulary with
    15-60 words per doc, and every ``near_dup_every``-th doc a one-word
    mutation of the doc ``near_dup_every-1`` below it — so MinHash/LSH,
    SimHash and connected-components queries see the same planted
    duplicate structure at 10x that the shipped dirs have, and candidate
    growth stays measurable. Pure column expressions, deterministic per
    (seed, n).

    ``vocab_size`` defaults to max(40, n // 1250): real corpora grow
    vocabulary with size, and a FIXED vocabulary makes random-pair
    Jaccard a constant — LSH candidates then grow quadratically with n
    by chance collisions alone (measured at 500k docs on the old fixed
    40-word vocab: 4.2M candidates for 50k true pairs). Scaling the
    vocabulary keeps random-pair similarity below the LSH band floor, so
    candidate growth measures the PLANTED duplicates, which is the thing
    the anchor exists to measure. n <= 50k keeps the historic 40-word
    vocabulary bit-for-bit."""
    if vocab_size is None:
        vocab_size = max(40, n // 1250)
    vocab = [
        "batch", "part", "spark", "line", "column", "order", "small", "sort",
        "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
        "query", "big", "key", "window", "row", "table", "stream", "merge",
        "data", "join", "shard", "plan", "stage", "task", "node", "disk",
        "cache", "spill", "skew", "probe", "build", "range", "frame", "state",
    ]
    if vocab_size <= len(vocab):
        vocab = vocab[:vocab_size]
    else:  # extend deterministically: numbered variants of the base words
        vocab = vocab + [
            f"{vocab[i % len(vocab)]}{i // len(vocab)}"
            for i in range(vocab_size - len(vocab))
        ]
    varr = F.array(*[F.lit(w) for w in vocab])
    df = spark.range(n)
    # near-dup pairs share a base id -> identical word stream
    is_dup = (F.col("id") % near_dup_every == near_dup_every - 1) & (
        F.col("id") >= near_dup_every
    )
    base = F.when(is_dup, F.col("id") - (near_dup_every - 1)).otherwise(
        F.col("id")
    )
    n_words = (
        F.pmod(F.xxhash64(base, F.lit(seed)), F.lit(46)) + 15
    ).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: varr.getItem(
            F.pmod(F.xxhash64(base, j, F.lit(seed + 1)), F.lit(len(vocab))).cast(
                "int"
            )
        ),
    )
    text = F.concat(
        F.array_join(words, " "),
        F.when(is_dup, F.lit(" extra")).otherwise(F.lit("")),
    )
    # Adversarial duplicate structure for the r8 LSH skew anchors (both
    # default OFF, keeping every existing corpus bit-identical):
    # - exact_dup_frac: the first n·frac docs are EXACT copies of one
    #   template — identical MinHash signatures, so every one of the 8
    #   LSH band buckets holds that fraction of the corpus (the judge's
    #   25%-hot-bucket scenario); exercises the exact-dup pre-collapse.
    # - gray_frac: the next n·frac docs share a 24-word template plus 16
    #   doc-unique filler tokens — pairwise shingle Jaccard ≈ 22/54 ≈
    #   0.41, BELOW the 0.5 threshold but with per-band collision
    #   probability j² ≈ 0.17 (any-of-8 ≈ 0.77): a candidate-pair blowup
    #   whose verified output is empty, the classic banded-LSH adversary.
    if exact_dup_frac or gray_frac:
        n_exact = int(n * exact_dup_frac)
        n_gray = int(n * gray_frac)
        t_exact = " ".join(vocab[(7 * i + 3) % len(vocab)] for i in range(30))
        t_gray = " ".join(vocab[(11 * i + 5) % len(vocab)] for i in range(24))
        gray_fill = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda j: F.format_string("g%dw%d", F.col("id"), j),
            ),
            " ",
        )
        text = (
            F.when(F.col("id") < n_exact, F.lit(t_exact))
            .when(
                F.col("id") < n_exact + n_gray,
                F.concat(F.lit(t_gray + " "), gray_fill),
            )
            .otherwise(text)
        )
    u = lambda k: F.rand(seed + k)  # noqa: E731
    lang = (
        F.when(u(2) < 0.9, "en").when(u(2) < 0.96, "pt").otherwise("es")
    )
    return df.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.format_string(
            "src%d", F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(n_sources))
        ).alias("source"),
        F.length(text).alias("n_chars"),
    )


def generate_embeddings(
    spark: SparkSession,
    n: int = 20_000,
    dim: int = 64,
    n_clusters: int = 32,
    noise: float = 0.25,
    seed: int = 42,
) -> DataFrame:
    """Driver-testdata-shaped embeddings at arbitrary scale (vec_id,
    embedding float[dim], label): points scatter around ``n_clusters``
    deterministic centroids, so IVF partitioning and probe pruning behave
    the way the shipped dirs do. Pure column expressions."""
    df = spark.range(n)
    label = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_clusters)).cast("int")
    emb = F.array(
        *[
            (
                F.sin(label.cast("double") * F.lit(0.7) + F.lit(i * 1.3))
                + F.randn(seed + 10 + i) * noise
            ).cast("float")
            for i in range(dim)
        ]
    )
    return df.select(
        F.col("id").alias("vec_id"),
        emb.alias("embedding"),
        label.alias("label"),
    )


def generate_events(
    spark: SparkSession,
    n: int = 1_000_000,
    n_users: int = 15_000,
    n_merchants: int = 100,
    n_days: int = 30,
    seed: int = 42,
    start: str = "2024-01-01 00:00:00",
    hot_frac: float = 0.0,
) -> DataFrame:
    """Driver-testdata-shaped events at an arbitrary scale (for scaling
    benchmarks beyond the shipped sf dirs): same schema and the same
    per-key daily rate as /root/testdata (events/user stays ~constant as
    both n and n_users scale), so frame sizes, join fan-outs and state
    sizes scale the way a real 100 TB log would — by key count, not by
    per-key depth. ``ts`` is emitted as epoch-nanos long, matching the
    on-disk layout load_table expects."""
    df = spark.range(n)
    u = lambda k: F.rand(seed + k)  # noqa: E731
    types = F.array(
        F.lit("click"), F.lit("error"), F.lit("purchase"),
        F.lit("signup"), F.lit("view"),
    )
    ts = F.to_timestamp(F.lit(start)) + F.make_dt_interval(
        days=F.lit(0), hours=F.lit(0), mins=F.lit(0),
        secs=u(1) * (n_days * 86400),
    )
    return df.select(
        F.col("id").alias("event_id"),
        (F.unix_micros(ts) * 1000).alias("ts"),
        F.when(u(6) < hot_frac, F.lit(0))
        .otherwise((u(2) * n_users).cast("long"))
        .alias("user_id"),
        types.getItem((u(3) * 5).cast("int")).alias("event_type"),
        F.round(F.greatest(F.exp(F.randn(seed + 4) * 1.5 + 3.0), F.lit(0.01)), 2)
        .alias("value"),
        F.format_string('{"k": %d}', (u(5) * n_merchants).cast("int"))
        .alias("props"),
    )
