"""Ranked retrieval over the document corpus: BM25 and TF-IDF (X4 family).

A training-data pipeline needs keyword retrieval for targeted curation
("pull the top documents about X for inspection / decontamination") and
per-document salient-term extraction (topic tagging, index keys). The
reference has no retrieval surface (its text handling stops at feature
dicts, `feature_engineering/advanced_features.py`), so these operators are
scale additions in the spirit of SURVEY §2.11 X4 — same tokenizer as
`operators/text.py` so every text operator agrees on what a "word" is.

Scale design (100 TB):
- BM25 filters the exploded token stream to the query terms BEFORE any
  shuffle, so the grouped state is O(n_docs_matching × n_query_terms),
  not O(total tokens). Corpus stats (N, avgdl) are a 1-row broadcast;
  per-term document frequencies are an n_terms-row broadcast. The final
  top-k is a TakeOrderedAndProject (no global sort materialized).
- TF-IDF must see every term (df over the whole vocabulary): one
  explode → two token-keyed shuffles (distinct doc-term, then df) → a
  doc_id-partitioned window for the per-doc top-k. No global window,
  no cartesian anywhere.

Float discipline: per-term contributions are rounded to 6 dp, summed,
and the sum rounded to 6 dp again — sums of 1e-6 multiples stay ~1e-15
from a 1e-6 multiple, far from any half-ulp rounding boundary, so Spark
and DuckDB agree bit-exactly despite different summation orders (house
convention, same as the windowed-stats family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import _TOKS

K1 = 1.2
B = 0.75


def _terms_sql_list(terms: list[str]) -> str:
    return ", ".join(f"'{t}'" for t in terms)


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    k1: float = K1,
    b: float = B,
    top_n: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-`top_n` documents for a bag-of-words query under BM25.

    Okapi BM25 with the Lucene idf variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive), k1=1.2,
    b=0.75. Documents containing none of the query terms score 0 and are
    omitted. Ties on the rounded score break by doc_id ascending.
    """
    toks = docs.select(
        F.col(id_col), F.expr(_TOKS).alias("toks")
    ).select(id_col, F.size("toks").alias("dl"), "toks")

    corpus = toks.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    tf = (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))

    idf = (
        df_t.crossJoin(F.broadcast(corpus))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
            "avgdl",
        )
    )

    contrib = tf.join(F.broadcast(idf), "term").select(
        id_col,
        "term",
        F.round(
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
            6,
        ).alias("term_score"),
    )

    return (
        contrib.groupBy(id_col)
        .agg(
            (F.round(F.sum("term_score"), 6) + F.lit(0.0)).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(top_n)
    )


def bm25_rank_sql(
    terms: list[str],
    k1: float = K1,
    b: float = B,
    top_n: int = 50,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`bm25_rank` (same tokenizer, same rounding)."""
    tl = _terms_sql_list(terms)
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM {table}
), dl AS (
  SELECT {id_col}, len(toks) AS dl, toks FROM toks
), corpus AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT {id_col}, dl, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT {id_col}, dl, unnest(toks) AS term FROM dl)
  WHERE term IN ({tl})
  GROUP BY {id_col}, dl, term
), df_t AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), contrib AS (
  SELECT tf.{id_col},
         round(ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
               * tf.tf * {k1 + 1.0!r}
               / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * tf.dl / c.avgdl)),
               6) AS term_score
  FROM tf JOIN df_t d USING (term) CROSS JOIN corpus c
)
SELECT {id_col},
       round(sum(term_score), 6) + 0.0 AS bm25,
       count(*) AS n_terms_matched
FROM contrib
GROUP BY {id_col}
ORDER BY bm25 DESC, {id_col}
LIMIT {top_n}
"""


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-`top_k` terms by TF-IDF (sklearn smooth idf:
    ``ln((1+N)/(1+df)) + 1``, raw tf). Rank ties break by term ascending
    on the 6-dp-rounded score so both engines agree exactly.
    """
    toks = docs.select(F.col(id_col), F.expr(_TOKS).alias("toks"))

    n_docs = toks.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))

    tf = (
        toks.select(id_col, F.explode("toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))

    idf = df_t.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (
            F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
            + F.lit(1.0)
        ).alias("idf"),
    )

    scored = tf.join(idf, "term").select(
        id_col,
        "term",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )

    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= top_k)
        .select(id_col, "term_rank", "term", "tfidf")
    )


def tfidf_top_terms_sql(
    top_k: int = 3,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`tfidf_top_terms`."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM {table}
), corpus AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM toks
), tf AS (
  SELECT {id_col}, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT {id_col}, unnest(toks) AS term FROM toks)
  GROUP BY {id_col}, term
), df_t AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.{id_col}, tf.term,
         round(tf.tf * (ln((1.0 + c.n_docs) / (1.0 + d.df)) + 1.0), 6)
           AS tfidf
  FROM tf JOIN df_t d USING (term) CROSS JOIN corpus c
), ranked AS (
  SELECT {id_col}, term, tfidf,
         row_number() OVER (PARTITION BY {id_col}
                            ORDER BY tfidf DESC, term) AS term_rank
  FROM scored
)
SELECT {id_col}, term_rank, term, tfidf
FROM ranked WHERE term_rank <= {top_k}
"""


def unigram_logprob_quality(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram negative log-likelihood under the
    corpus's own empirical token distribution — the lightweight analog
    of CCNet/KenLM perplexity filtering (docs full of rare/garbage
    tokens score high, fluent-for-this-corpus docs score low).

    Two token-keyed aggregations (per-doc tf, corpus term counts), one
    broadcast of the corpus total, one join back — the same shuffle
    budget as TF-IDF. Per-token contributions round to 6 dp before the
    per-doc mean (house float discipline, both engines identical).
    """
    toks = docs.select(F.col(id_col), F.expr(_TOKS).alias("toks"))
    tf = (
        toks.select(id_col, F.explode("toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    term_counts = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = term_counts.agg(F.sum("ct").alias("total"))
    scored = (
        tf.join(term_counts, "term")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "tf",
            F.round(
                F.col("tf") * -F.log(F.col("ct") / F.col("total")), 6
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        # numerator rounded to 6 dp BEFORE the division: both engines'
        # sums resync to the same 1e-6 multiple, so the quotient (and its
        # final rounding) is computed from bit-identical operands
        (F.round(F.round(F.sum("nll"), 6) / F.sum("tf"), 6) + F.lit(0.0)).alias(
            "mean_token_nll"
        ),
    )


def unigram_logprob_quality_sql(
    table: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle for :func:`unigram_logprob_quality`."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM {table}
), tf AS (
  SELECT {id_col}, term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT {id_col}, unnest(toks) AS term FROM toks)
  GROUP BY {id_col}, term
), term_counts AS (
  SELECT term, SUM(tf) AS ct FROM tf GROUP BY term
), total AS (
  SELECT SUM(ct) AS total FROM term_counts
), scored AS (
  SELECT tf.{id_col}, tf.tf,
         round(tf.tf * -ln(tc.ct / t.total), 6) AS nll
  FROM tf JOIN term_counts tc USING (term) CROSS JOIN total t
)
SELECT {id_col},
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       round(round(SUM(nll), 6) / SUM(tf), 6) + 0.0 AS mean_token_nll
FROM scored GROUP BY {id_col}
"""


N_INDEX_BUCKETS = 16


def _term_bucket_col(col: str = "term") -> "F.Column":
    """Engine-portable term bucket: first 8 hex chars of md5 mod
    N_INDEX_BUCKETS (same md5-bucket trick as the seeded sampler, so the
    driver can recompute it for pruning literals without Spark)."""
    return (
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long")
        % N_INDEX_BUCKETS
    ).cast("int")


def term_bucket(term: str) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % N_INDEX_BUCKETS


def build_text_index(docs: DataFrame, path: str, id_col: str = "doc_id") -> None:
    """Materialize the inverted index for BM25: postings
    ``(term, doc_id, tf, dl)`` written ``partitionBy(bucket)`` (md5 term
    bucket), per-term document frequencies in a same-partitioned `terms`
    table, and the 1-row corpus stats table. A query for T terms then
    reads ONLY the ≤T bucket partitions via file-listing pruning — at
    100 TB the postings list is the big table and this is the entire
    point of persisting. Build once, query many; `index_bm25` is the
    read side and returns bit-identical results to :func:`bm25_rank`.
    """
    import os

    toks = docs.select(
        F.col(id_col), F.expr(_TOKS).alias("toks")
    ).select(id_col, F.size("toks").alias("dl"), "toks")
    toks.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).write.mode("overwrite").parquet(os.path.join(path, "stats"))
    postings = (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .withColumn("bucket", _term_bucket_col())
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "postings")
    )
    postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    ).withColumn("bucket", _term_bucket_col()).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(os.path.join(path, "terms"))


def index_bm25(
    spark,
    path: str,
    terms: list[str],
    k1: float = K1,
    b: float = B,
    top_n: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 against the persisted inverted index: the query terms'
    buckets become literal IN partition filters (pruned at file listing
    — unprobed buckets are never read), scoring and tiebreaks are
    identical to :func:`bm25_rank`, so index round trips are
    bit-identical to the scan path (and share its DuckDB oracle)."""
    import os

    buckets = sorted({term_bucket(t) for t in terms})
    postings = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    df_t = (
        spark.read.parquet(os.path.join(path, "terms"))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .select("term", "df")
    )
    stats = spark.read.parquet(os.path.join(path, "stats"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )
    contrib = postings.join(F.broadcast(idf), "term").select(
        id_col,
        F.round(
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
            6,
        ).alias("term_score"),
    )
    return (
        contrib.groupBy(id_col)
        .agg(
            (F.round(F.sum("term_score"), 6) + F.lit(0.0)).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(top_n)
    )
