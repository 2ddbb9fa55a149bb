"""Third-implementation cross-checks: pure-Python reference
implementations (plain dicts/loops, no Spark, no SQL) verified against
the engine on randomized corpora. The DuckDB oracles mirror the engine's
expression tree by construction; these references are derived
independently from the published formulas, so a shared engine/oracle
misreading of a formula cannot survive this file.
"""

from __future__ import annotations

import math
import re

import pytest


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _random_docs(rng, n_docs: int) -> list[tuple[int, str]]:
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = []
    for i in range(n_docs):
        n = int(rng.integers(3, 30))
        words = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
        docs.append((i, " ".join(words)))
    return docs


def test_bm25_matches_pure_python_reference(spark):
    import numpy as np

    from aml_feature_store_spark.operators import retrieval

    rng = np.random.default_rng(31)
    docs = _random_docs(rng, 25)
    terms = ["alpha", "delta", "theta"]
    k1, b = 1.2, 0.75

    toks = {i: _tokens(t) for i, t in docs}
    n_docs = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df_t = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    expected = {}
    for i, v in toks.items():
        score = 0.0
        matched = 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (n_docs - df_t[t] + 0.5) / (df_t[t] + 0.5))
            score += round(
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl)),
                6,
            )
        if matched:
            expected[i] = (round(score, 6), matched)

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["bm25"], r["n_terms_matched"])
        for r in retrieval.bm25_rank(sdf, terms, top_n=100).collect()
    }
    assert got == expected


def test_unigram_nll_matches_pure_python_reference(spark):
    import numpy as np

    from aml_feature_store_spark.operators import retrieval

    rng = np.random.default_rng(37)
    docs = _random_docs(rng, 20)
    toks = {i: _tokens(t) for i, t in docs}
    counts: dict[str, int] = {}
    for v in toks.values():
        for t in v:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    expected = {}
    for i, v in toks.items():
        nll = sum(
            round(
                v.count(t) * -math.log(counts[t] / total), 6
            )
            for t in set(v)
        )
        expected[i] = (len(v), round(round(nll, 6) / len(v), 6))

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_token_nll"])
        for r in retrieval.unigram_logprob_quality(sdf).collect()
    }
    assert got == expected


def test_decontaminate_matches_set_intersection(spark):
    import numpy as np

    from aml_feature_store_spark.operators import dedup as dd

    rng = np.random.default_rng(41)
    docs = _random_docs(rng, 30)
    n = 3
    grams = {
        i: {
            " ".join(tok[j : j + n])
            for j in range(len(tok) - n + 1)
        }
        for i, tok in ((i, _tokens(t)) for i, t in docs)
    }
    eval_ids = [i for i, _ in docs if i < 5]
    eval_grams = set().union(*(grams[i] for i in eval_ids))
    expected = {
        i: len(grams[i] & eval_grams) for i, _ in docs if i >= 5
    }

    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n_shared_grams"]
        for r in dd.decontaminate(
            sdf.filter("doc_id >= 5"), sdf.filter("doc_id < 5"), n=n
        ).collect()
    }
    assert got == expected


def test_pagerank_matches_pure_python_power_iteration(spark):
    import numpy as np

    from aml_feature_store_spark.operators.graph import pagerank

    rng = np.random.default_rng(43)
    nodes = [f"n{i}" for i in range(12)]
    pairs = set()
    while len(pairs) < 20:
        a, b = rng.integers(0, 12, 2)
        if a != b:
            pairs.add((f"n{a}", f"n{b}"))
    edges = sorted(pairs)

    outdeg: dict[str, int] = {}
    incoming: dict[str, list[str]] = {}
    present = set()
    for s, d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
        incoming.setdefault(d, []).append(s)
        present.add(s)
    # engine nodes = distinct src only (symmetric graphs have src==all)
    n = len(present)
    ranks = {v: 1.0 / n for v in present}
    for _ in range(8):
        new = {}
        for v in present:
            c = sum(
                ranks[u] / outdeg[u]
                for u in incoming.get(v, [])
                if u in present
            )
            new[v] = round(0.15 / n + 0.85 * c, 12)
        ranks = new
    expected = {v: round(r, 9) + 0.0 for v, r in ranks.items()}

    sdf = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["pagerank"] for r in pagerank(sdf, n_iters=8).collect()}
    assert got == pytest.approx(expected, abs=1e-9)
