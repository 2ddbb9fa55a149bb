"""Text-analysis operators for training-data pipelines (SURVEY §2.11 X4).

Quality scoring, token counting, language-ID heuristic, and content
fingerprinting over a `text` column — all native column expressions
(regexp + length arithmetic), zero UDFs, so the whole pass is one
codegen'd Project and scales linearly with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TOKS = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
# BPE-ish tokenizer: letter runs | digit runs | single punctuation marks
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]

# marker tokens per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "y"],
}


def _count_tokens_in(words: list[str]) -> Column:
    arr = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter({_TOKS}, x -> array_contains(array({arr}), x)))"
    ).cast("long")


def quality_score_col() -> Column:
    """Composite quality score as a reusable column over `text`:
    0.4·cap(n_words/50) + 0.3·(1−punct_ratio) + 0.3·cap(distinct/25).
    Shared by text_stats and the curation pipeline so the formula cannot
    drift between them."""
    n_chars = F.length("text").cast("double")
    n_words = F.expr(f"size({_TOKS})").cast("long")
    n_distinct = F.expr(f"size(array_distinct({_TOKS}))").cast("long")
    punct = n_chars - F.length(
        F.regexp_replace("text", "[^A-Za-z0-9 ]", "")
    ).cast("double")
    return (
        F.least(n_words.cast("double") / F.lit(50.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - punct / n_chars) * F.lit(0.3)
        + F.least(n_distinct.cast("double") / F.lit(25.0), F.lit(1.0)) * F.lit(0.3)
    )


def token_count_col() -> Column:
    """BPE-ish token count as a reusable column over `text`."""
    return F.size(
        F.regexp_extract_all("text", F.lit(TOKEN_RE), F.lit(0))
    ).cast("long")


def lang_pred_col() -> Column:
    """Marker-token language prediction as a reusable column over `text`
    (argmax with fixed precedence, 'und' when all scores are 0)."""
    scores = {
        lang: _count_tokens_in(markers) for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        pred = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return pred


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document statistics + composite quality score.

    n_words, distinct words, avg word length, punctuation/digit/upper
    ratios, stopword ratio, token count (BPE-ish regex), and
    quality_score = 0.4·cap(n_words/50) + 0.3·(1−punct_ratio)
                  + 0.3·cap(distinct/25).
    """
    n_chars = F.length("text").cast("double")
    n_words = F.expr(f"size({_TOKS})").cast("long")
    n_distinct = F.expr(f"size(array_distinct({_TOKS}))").cast("long")
    letters = n_chars - F.length(
        F.regexp_replace("text", "[A-Za-z]", "")
    ).cast("double")
    digits = n_chars - F.length(F.regexp_replace("text", "[0-9]", "")).cast("double")
    uppers = n_chars - F.length(F.regexp_replace("text", "[A-Z]", "")).cast("double")
    punct = n_chars - F.length(
        F.regexp_replace("text", "[^A-Za-z0-9 ]", "")
    ).cast("double")
    stop = _count_tokens_in(STOPWORDS)
    n_tokens = token_count_col()
    wl = F.expr(
        f"aggregate({_TOKS}, 0L, (s, x) -> s + length(x))"
    ).cast("double")
    quality = quality_score_col()
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        F.when(n_words > 0, wl / n_words.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("avg_word_len"),
        (punct / n_chars).alias("punct_ratio"),
        (digits / n_chars).alias("digit_ratio"),
        (uppers / F.greatest(letters, F.lit(1.0))).alias("upper_ratio"),
        F.when(n_words > 0, stop.cast("double") / n_words.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
        n_tokens.alias("n_tokens"),
        quality.alias("quality_score"),
    )


def text_stats_sql(table: str = "documents") -> str:
    toks = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x != '')")
    return f"""
WITH base AS (
  SELECT doc_id, text,
         CAST(length(text) AS DOUBLE) AS n_chars,
         {toks} AS toks
  FROM {table}
), c AS (
  SELECT doc_id, n_chars,
    CAST(len(toks) AS BIGINT) AS n_words,
    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_words,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) AS wl,
    n_chars - CAST(length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) AS letters,
    n_chars - CAST(length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS digits,
    n_chars - CAST(length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) AS uppers,
    n_chars - CAST(length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) AS punct,
    CAST(len(list_filter(toks, x -> list_contains({_sql_list(STOPWORDS)}, x))) AS BIGINT) AS stop,
    CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens
  FROM base
)
SELECT doc_id, n_words, n_distinct_words,
  CASE WHEN n_words > 0 THEN wl / CAST(n_words AS DOUBLE) ELSE 0.0 END AS avg_word_len,
  punct / n_chars AS punct_ratio,
  digits / n_chars AS digit_ratio,
  uppers / GREATEST(letters, 1.0) AS upper_ratio,
  CASE WHEN n_words > 0 THEN CAST(stop AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
  n_tokens,
  LEAST(CAST(n_words AS DOUBLE) / 50.0, 1.0) * 0.4
    + (1.0 - punct / n_chars) * 0.3
    + LEAST(CAST(n_distinct_words AS DOUBLE) / 25.0, 1.0) * 0.3 AS quality_score
FROM c
"""


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-token language-ID heuristic: score = count of language-marker
    tokens; argmax with fixed precedence (en>de>fr>es), 'und' (undetermined)
    when all scores are 0. Deterministic and fully relational."""
    scores = {
        lang: _count_tokens_in(markers) for lang, markers in LANG_MARKERS.items()
    }
    out = docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        lang_pred_col().alias("lang_predicted"),
    )
    return out


def language_id_sql(table: str = "documents") -> str:
    toks = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x != '')")
    score_cols = ",\n    ".join(
        f"CAST(len(list_filter(toks, x -> list_contains({_sql_list(m)}, x))) AS BIGINT)"
        f" AS score_{lang}"
        for lang, m in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE "
    for lang in langs:
        case += f"WHEN score_{lang} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"""
WITH base AS (SELECT doc_id, lang, {toks} AS toks FROM {table}),
sc AS (
  SELECT doc_id, lang AS lang_actual,
    {score_cols}
  FROM base
)
SELECT doc_id, lang_actual, {", ".join(f"score_{l}" for l in langs)},
       {case} AS lang_predicted
FROM sc
"""


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprints: md5 of case/punctuation-normalized text + the
    minimum shingle hash (winnowing-style anchor) per document."""
    from .dedup import _H_SPARK, shingles

    norm_md5 = F.md5(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""))
    base = docs.select("doc_id", norm_md5.alias("norm_md5"))
    minsh = (
        shingles(docs)
        .withColumn("_h", F.expr(_H_SPARK))
        .groupBy("doc_id")
        .agg(F.min("_h").alias("min_shingle_hash"))
    )
    return base.join(minsh, "doc_id", "left")


def fingerprints_sql(table: str = "documents") -> str:
    from .dedup import _H_DUCK, shingles_sql

    return f"""
WITH s AS ({shingles_sql(table)}),
m AS (SELECT doc_id, MIN({_H_DUCK}) AS min_shingle_hash FROM s GROUP BY doc_id)
SELECT d.doc_id,
       md5(regexp_replace(lower(d.text), '[^a-z0-9]', '', 'g')) AS norm_md5,
       m.min_shingle_hash
FROM {table} d LEFT JOIN m ON d.doc_id = m.doc_id
"""


def repetition_stats(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    Table A1): top-unigram fraction, top-bigram fraction, and distinct-
    word ratio per document. High top-n-gram mass flags boilerplate /
    degenerate generations; standard training-data quality filters.

    Plan: one explode per n-gram order, per-(doc, gram) count, per-doc
    max/sum — two shuffles keyed by doc_id, partial-agg friendly, no
    Python. At 100 TB both aggregations pre-combine map-side and the two
    branches share the one documents scan."""
    uni = docs.select(
        F.col(id_col), F.explode(F.split(F.col("text"), " ")).alias("g")
    )
    big = docs.filter(F.expr("size(split(text, ' ')) >= 2")).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> array_join(slice(split(text, ' '), i, 2), ' '))"
            )
        ).alias("g"),
    )

    def per_doc(ex: DataFrame, top_name: str) -> DataFrame:
        counts = ex.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("_c"))
        return counts.groupBy(id_col).agg(
            F.sum("_c").cast("long").alias(f"_n_{top_name}"),
            (F.max("_c").cast("double") / F.sum("_c").cast("double")).alias(
                f"top_{top_name}_frac"
            ),
            (
                F.count(F.lit(1)).cast("double") / F.sum("_c").cast("double")
            ).alias(f"distinct_{top_name}_ratio"),
        )

    u = per_doc(uni, "unigram")
    b = per_doc(big, "bigram")
    return (
        docs.select(id_col)
        .join(u, id_col, "left")
        .join(b, id_col, "left")
        .select(
            id_col,
            F.coalesce("_n_unigram", F.lit(0)).alias("n_words"),
            F.coalesce("top_unigram_frac", F.lit(0.0)).alias("top_unigram_frac"),
            F.coalesce("distinct_unigram_ratio", F.lit(0.0)).alias(
                "distinct_word_ratio"
            ),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def repetition_stats_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB mirror of repetition_stats (same splits, same divisions)."""
    return f"""
WITH uni AS (
  SELECT {id_col}, UNNEST(string_split(text, ' ')) AS g FROM {table}
),
ucnt AS (SELECT {id_col}, g, COUNT(*) AS c FROM uni GROUP BY {id_col}, g),
u AS (
  SELECT {id_col}, SUM(c) AS n_words,
         CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_unigram_frac,
         CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS distinct_word_ratio
  FROM ucnt GROUP BY {id_col}
),
w AS (SELECT {id_col}, string_split(text, ' ') AS words FROM {table}),
pos AS (
  SELECT {id_col}, UNNEST(range(1, len(words))) AS i, words
  FROM w WHERE len(words) >= 2
),
bi AS (SELECT {id_col}, array_to_string(words[i:i + 1], ' ') AS g FROM pos),
bcnt AS (SELECT {id_col}, g, COUNT(*) AS c FROM bi GROUP BY {id_col}, g),
b AS (
  SELECT {id_col},
         CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac
  FROM bcnt GROUP BY {id_col}
)
SELECT d.{id_col},
       CAST(COALESCE(u.n_words, 0) AS BIGINT) AS n_words,
       COALESCE(u.top_unigram_frac, 0.0) AS top_unigram_frac,
       COALESCE(u.distinct_word_ratio, 0.0) AS distinct_word_ratio,
       COALESCE(b.top_bigram_frac, 0.0) AS top_bigram_frac
FROM {table} d
LEFT JOIN u ON u.{id_col} = d.{id_col}
LEFT JOIN b ON b.{id_col} = d.{id_col}
"""
