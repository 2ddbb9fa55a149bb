"""Registered queries: LLM-training-data pipeline operators — dedup,
similarity search, text analysis, multimodal columns (SURVEY §2.11 X1-X5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import register
from ..operators import dedup, multimodal, simsearch, text
from ..sources import load_table

# --- X1/X2: dedup -----------------------------------------------------------


@register("dedup_exact", oracle=dedup.exact_dedup_sql())
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest: group size + canonical flag (X1)."""
    return dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


@register("dedup_ngram_jaccard", oracle=dedup.jaccard_pairs_sql(threshold=0.5))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard ≥ 0.5 via inverted-index
    self-join (X2 exact path)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(dedup.shingles(docs), threshold=0.5)


@register("dedup_minhash_lsh", oracle=dedup.minhash_lsh_pairs_sql(threshold=0.5))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(8×2) candidate pairs verified by exact Jaccard ≥ 0.5
    (X2 scale path). md5-based hashing → bit-identical on any engine."""
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.5
    )


@register("dedup_simhash", oracle=dedup.simhash_pairs_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-32 near-dup pairs with Hamming ≤ 6 (X2 fingerprint path)."""
    return dedup.simhash_pairs(load_table(spark, sf_dir, "documents"))


# --- X3: similarity search --------------------------------------------------

N_QUERIES = 5


@register("knn_cosine_bruteforce", oracle=simsearch.cosine_topk_sql(N_QUERIES, 10))
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the first 5 vectors against the corpus —
    broadcast queries, no shuffle of the corpus side (X3 baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return simsearch.cosine_topk(emb, queries, k=10)


@register("ann_ivf_topk", oracle=simsearch.ivf_topk_sql(N_QUERIES, 10))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-10 (probe nearest centroid only) — the scale
    path. Seed centroids + 8-dp rounding + id tiebreaks make the whole
    pipeline deterministic, so it is exactly oracle-checkable even though
    recall < 1 vs brute force by design (X3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return simsearch.ivf_topk(emb, queries, k=10)


@register("ann_recall_at_k", oracle=simsearch.recall_at_k_sql(N_QUERIES, 10))
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF ANN path against exact brute force, per query —
    quantifies the accuracy side of the IVF speed/recall trade (X3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = simsearch.cosine_topk(emb, queries, k=10)
    approx = simsearch.ivf_topk(emb, queries, k=10)
    return simsearch.recall_at_k(exact, approx)


# --- X4: text analysis ------------------------------------------------------


@register("text_stats", oracle=text.text_stats_sql())
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document length/ratio/token statistics + quality score (X4)."""
    return text.text_stats(load_table(spark, sf_dir, "documents"))


@register("language_id", oracle=text.language_id_sql())
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic with per-language scores (X4)."""
    return text.language_id(load_table(spark, sf_dir, "documents"))


@register("doc_fingerprints", oracle=text.fingerprints_sql())
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content md5 + min-shingle-hash anchor per document (X4)."""
    return text.fingerprints(load_table(spark, sf_dir, "documents"))


# --- X5: multimodal columns -------------------------------------------------


@register(
    "multimodal_binary_stats",
    oracle="""
SELECT doc_id, 'text/plain' AS modality,
       octet_length(encode(text)) AS n_bytes,
       lower(substr(hex(encode(text)), 1, 8)) AS header_hex,
       md5(text) AS payload_md5
FROM documents
""",
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary payload column + typed metadata (size, header hex,
    digest) — the multimodal column convention (X5). Payload = UTF-8 bytes
    here; schema/plumbing identical for real image/audio blobs."""
    out = multimodal.binarize_documents(load_table(spark, sf_dir, "documents"))
    return out.select("doc_id", "modality", "n_bytes", "header_hex", "payload_md5")


@register("multimodal_image_features", oracle=None)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas 'decode' over binary payloads (X5): byte
    stats + header-derived dimensions. Codec call is a deterministic fake
    (no image libs in container) — rows-only check; plumbing unit-tested."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.extract_image_features(multimodal.binarize_documents(docs))
