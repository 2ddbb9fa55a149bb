"""Unit tests: dedup, similarity search, text analysis, multimodal (X1-X5)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aml_feature_store_spark.operators import dedup, multimodal, simsearch, text


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_exact_dedup_groups(spark):
    d = _docs(spark, ["same text here", "same text here", "different one"])
    out = {r["doc_id"]: r for r in dedup.exact_dedup(d).collect()}
    assert out[0]["dup_group_size"] == 2 and out[1]["dup_group_size"] == 2
    assert out[0]["is_canonical"] and not out[1]["is_canonical"]
    assert out[2]["dup_group_size"] == 1 and out[2]["is_canonical"]


def test_shingles_are_word_3grams(spark):
    d = _docs(spark, ["a b c d", "x y"])
    sh = {(r["doc_id"], r["shingle"]) for r in dedup.shingles(d).collect()}
    assert sh == {(0, "a b c"), (0, "b c d")}  # short doc yields none


def test_jaccard_identical_docs(spark):
    t = "alpha beta gamma delta epsilon zeta"
    d = _docs(spark, [t, t, "unrelated totally different words here now"])
    pairs = dedup.jaccard_pairs(dedup.shingles(d), threshold=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["d1"], p["d2"]) == (0, 1) and p["jaccard"] == 1.0


def test_jaccard_pairs_docs_equals_generic(spark):
    """The r12 size-pruned docs path must be bit-equal to the generic
    exploded path on a corpus mixing exact dups, boundary-jaccard pairs,
    size-mismatched pairs the pre-filter kills, overlap-free docs, and
    shingle-less short docs — at several thresholds including 0 (where
    the prune must keep everything the generic path emits)."""
    texts = [
        "alpha beta gamma delta epsilon zeta",            # 0
        "alpha beta gamma delta epsilon zeta",            # 1: exact dup of 0
        "alpha beta gamma delta epsilon eta theta iota",  # 2: partial overlap
        "alpha beta gamma",                               # 3: 1 shingle, subset of 0
        "unrelated totally different words here now",     # 4
        "x y",                                            # 5: no shingles
        "alpha beta gamma delta",                         # 6: 2 shingles, subset
    ]
    d = _docs(spark, texts)
    for thr in (0.0, 0.25, 0.5, 1.0):
        gen = sorted(
            map(tuple, dedup.jaccard_pairs(dedup.shingles(d), thr).collect())
        )
        pru = sorted(map(tuple, dedup.jaccard_pairs_docs(d, thr).collect()))
        assert pru == gen, f"threshold {thr}: {pru} != {gen}"


def test_minhash_lsh_finds_identical(spark):
    t = "one two three four five six seven eight nine ten"
    d = _docs(spark, [t, t, "totally different text with other words in it"])
    pairs = dedup.minhash_lsh_pairs(d, threshold=0.5).collect()
    assert len(pairs) == 1
    assert pairs[0]["est_sim"] == 1.0 and pairs[0]["jaccard"] == 1.0


def test_exact_collapse_pairs_equal_uncollapsed(spark):
    """The r8 exact-dup pre-collapse must be output-invisible: pairs and
    component labels from the collapsed pipeline equal the uncollapsed
    banding pipeline run over ALL docs, on an adversarial corpus mixing
    an exact-copy cluster, a planted near-dup, a shingle-less duplicate
    group (< 3 tokens: must NOT pair), and unrelated docs."""
    base = "one two three four five six seven eight nine ten"
    near = "one two three four five six seven eight nine zzz"
    texts = [
        base, base, base, base,          # 0-3: exact cluster
        near,                            # 4: near-dup of the cluster
        "tiny doc", "tiny doc",          # 5-6: identical, no shingles
        "totally different text with other words in it",  # 7
    ]
    d = _docs(spark, texts)
    collapsed = {
        (r["d1"], r["d2"]): (r["est_sim"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(d, threshold=0.5).collect()
    }
    uncollapsed = {
        (r["d1"], r["d2"]): (r["est_sim"], r["jaccard"])
        for r in dedup._rep_lsh_pairs(d, threshold=0.5).collect()
    }
    assert collapsed == uncollapsed
    # the exact cluster pairs among itself; 5-6 must be absent
    assert (0, 1) in collapsed and (2, 3) in collapsed
    assert (5, 6) not in collapsed
    got = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup.minhash_dedup_labels(d, threshold=0.5).collect()
    }
    ref = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup.near_dup_components_star(
            d, dedup._rep_lsh_pairs(d, threshold=0.5)
        ).collect()
    }
    assert got == ref
    assert got[5] == (5, True) and got[6] == (6, True)  # no-shingle split
    # near-dup (jaccard 6/10 = 0.6) joins the exact cluster's component
    assert all(got[i] == (0, i == 0) for i in (0, 1, 2, 3, 4))


def test_exact_dup_guard_skips_collapse_when_uniform(spark, monkeypatch):
    """r9 (VERDICT #4): a corpus with no exact duplicates must route
    around the pre-collapse (guard returns False) with output identical
    to the collapse path (guard forced True) — so the guard is purely a
    physical shortcut. NULL texts conservatively report 'has dups'."""
    texts = [
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight nine zzz",
        "totally different text with other words in it",
        "tiny doc",
    ]
    d = _docs(spark, texts)
    assert dedup._has_exact_dups(d) is False
    assert dedup._has_exact_dups(_docs(spark, texts + [texts[0]])) is True
    # >=2 NULL texts: distinct md5 ignores NULLs -> conservative True
    dn = spark.createDataFrame(
        [(0, None), (1, None)], "doc_id long, text string"
    )
    assert dedup._has_exact_dups(dn) is True

    fast_pairs = {
        (r["d1"], r["d2"]): (r["est_sim"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(d, threshold=0.5).collect()
    }
    fast_labels = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup.minhash_dedup_labels(d, threshold=0.5).collect()
    }
    monkeypatch.setattr(dedup, "_has_exact_dups", lambda *a, **k: True)
    slow_pairs = {
        (r["d1"], r["d2"]): (r["est_sim"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(d, threshold=0.5).collect()
    }
    slow_labels = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in dedup.minhash_dedup_labels(d, threshold=0.5).collect()
    }
    assert fast_pairs == slow_pairs and (0, 1) in fast_pairs
    assert fast_labels == slow_labels
    assert fast_labels[3] == (3, True)  # shingle-less doc labels itself
    # r10 (per r9 ADVICE): the explicit hint skips the eager guard scan
    # entirely — monkeypatch would raise if consulted — and both hint
    # values reproduce the guard-routed outputs exactly
    def _boom(*a, **k):
        raise AssertionError("guard must not run when hint is passed")

    monkeypatch.setattr(dedup, "_has_exact_dups", _boom)
    for hint in (False, True):
        hint_pairs = {
            (r["d1"], r["d2"]): (r["est_sim"], r["jaccard"])
            for r in dedup.minhash_lsh_pairs(
                d, threshold=0.5, has_exact_dups=hint
            ).collect()
        }
        hint_labels = {
            r["doc_id"]: (r["component"], r["is_canonical"])
            for r in dedup.minhash_dedup_labels(
                d, threshold=0.5, has_exact_dups=hint
            ).collect()
        }
        assert hint_pairs == fast_pairs
        assert hint_labels == fast_labels


def test_simhash_identical_zero_hamming(spark):
    t = "one two three four five six seven"
    d = _docs(spark, [t, t])
    pairs = dedup.simhash_pairs(d).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def _vecs(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<float>, label int",
    )


def test_cosine_topk_orders_by_similarity(spark):
    corpus = _vecs(
        spark,
        [
            [1, 0, 0, 0],   # query
            [1, 0.01, 0, 0],  # nearly parallel
            [0.7, 0.7, 0, 0],
            [0, 1, 0, 0],   # orthogonal
            [-1, 0, 0, 0],  # opposite
        ],
    )
    q = corpus.filter(F.col("vec_id") == 0)
    out = simsearch.cosine_topk(corpus, q, k=4).collect()
    order = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [1, 2, 3, 4]
    by_id = {r["vec_id"]: r["cosine"] for r in out}
    assert by_id[3] == pytest.approx(0.0)
    assert by_id[4] == pytest.approx(-1.0)


def test_ivf_recall_vs_bruteforce(spark):
    import random

    rng = random.Random(3)
    corpus = _vecs(
        spark, [[rng.gauss(0, 1) for _ in range(8)] for _ in range(120)]
    )
    q = corpus.filter(F.col("vec_id") < 3)
    exact = simsearch.cosine_topk(corpus, q, k=5).collect()
    approx = simsearch.ivf_topk(corpus, q, k=5, n_centroids=4).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(ap) > 0
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.4  # ANN trade-off, deterministic given seed data
    # determinism: same call twice → same result
    again = {(r["query_id"], r["vec_id"]) for r in
             simsearch.ivf_topk(corpus, q, k=5, n_centroids=4).collect()}
    assert ap == again


def test_kmeans_centroids_recover_clusters(spark):
    # two tight angular clusters; seed centroids (ids 0,1) both sit in
    # cluster A, so seed-IVF lumps all of cluster B into one bucket —
    # Lloyd iterations must pull one centroid toward B.
    a = [[10, 0.1 * i, 0, 0] for i in range(6)]         # cluster A, ids 0-5
    b = [[0, 0.1 * (i + 1), 10, 0] for i in range(6)]   # cluster B, ids 6-11
    corpus = _vecs(spark, a + b)
    refined = {
        r["centroid_id"]: r["_cenv"]
        for r in simsearch.kmeans_centroids(
            corpus, n_centroids=2, n_iters=2
        ).collect()
    }
    assert set(refined) == {0, 1}
    # one refined centroid points along axis 0 (A), the other along axis 2 (B)
    axes = sorted(
        (0 if v[0] > v[2] else 2) for v in refined.values()
    )
    assert axes == [0, 2]
    # determinism: second run is bit-identical
    again = {
        r["centroid_id"]: r["_cenv"]
        for r in simsearch.kmeans_centroids(
            corpus, n_centroids=2, n_iters=2
        ).collect()
    }
    assert refined == again


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # all vectors identical → every vector assigns to centroid 0 (id
    # tiebreak); centroid 1's cluster is empty and must survive unchanged
    corpus = _vecs(spark, [[1, 0, 0, 0]] * 4)
    out = {
        r["centroid_id"]: r["_cenv"]
        for r in simsearch.kmeans_centroids(
            corpus, n_centroids=2, n_iters=1
        ).collect()
    }
    assert set(out) == {0, 1}
    assert out[1][0] == pytest.approx(1.0)


def test_text_stats_basic(spark):
    d = _docs(spark, ["Hello World, this is GREAT stuff 123!"])
    r = text.text_stats(d).collect()[0]
    assert r["n_words"] == 7  # hello world this is great stuff 123
    assert r["n_tokens"] == 9  # 6 letter runs + '123' + ',' + '!'
    assert 0 < r["quality_score"] <= 1.0
    assert r["punct_ratio"] > 0


def test_language_id_markers(spark):
    d = _docs(spark, ["the cat of a house", "der hund und die katze",
                      "le chat et la maison", "xyz qrs"])
    out = {r["doc_id"]: r["lang_predicted"] for r in text.language_id(d).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr" and out[3] == "und"


def test_fingerprint_normalization_invariance(spark):
    d = _docs(spark, ["Hello, World one two three!", "hello world ONE two THREE"])
    rows = {r["doc_id"]: r for r in text.fingerprints(d).collect()}
    assert rows[0]["norm_md5"] == rows[1]["norm_md5"]


def test_multimodal_plumbing(spark):
    d = _docs(spark, ["abcdef", "Z"])
    b = multimodal.binarize_documents(d)
    rows = {r["doc_id"]: r for r in b.collect()}
    assert rows[0]["n_bytes"] == 6 and rows[0]["header_hex"] == "61626364"
    feats = {
        r["doc_id"]: r
        for r in multimodal.extract_image_features(b).collect()
    }
    assert feats[0]["header_hex"] == "61626364"
    assert feats[0]["mean_byte"] == pytest.approx(
        sum(b"abcdef") / 6.0
    )
    assert feats[0]["width"] == ord("a") % 64 + 1
    assert feats[1]["height"] == 0  # single-byte payload edge case


def test_multimodal_real_decode_bmp_wav_ppm(spark):
    """Hand-built format bytes decode exactly (pure struct+numpy path)."""
    import struct

    import numpy as np

    from aml_feature_store_spark.operators.multimodal import decode_features

    # 2x2 24-bit BMP, bottom-up, stride 8 (2 padding bytes per row)
    w = h = 2
    stride = 8
    px_rows = [bytes([10, 20, 30, 40, 50, 60, 0, 0]),
               bytes([70, 80, 90, 100, 110, 120, 0, 0])]
    bmp = (b"BM" + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                         2835, 2835, 0, 0) + b"".join(px_rows))
    vals = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    bmp_mean = float(np.mean(vals))
    bmp_std = float(np.std(vals))

    # mono 16-bit PCM WAV, 4 samples at 8000 Hz
    samples = np.array([0, 1000, -1000, 500], dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)

    # 2x1 P6 PPM
    ppm = b"P6\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])

    junk = b"\x00\x01not-a-format"

    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav)), (3, bytearray(ppm)),
         (4, bytearray(junk))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_features(df).collect()}
    b = got[1]
    assert (b["format"], b["width"], b["height"], b["channels"]) == ("bmp", 2, 2, 3)
    assert b["mean_val"] == pytest.approx(bmp_mean, abs=1e-12)
    assert b["std_val"] == pytest.approx(bmp_std, abs=1e-12)
    a = got[2]
    assert (a["format"], a["channels"], a["sample_rate"], a["n_samples"]) == (
        "wav", 1, 8000, 4)
    assert a["mean_val"] == pytest.approx(float(samples.mean()), abs=1e-12)
    p = got[3]
    assert (p["format"], p["width"], p["height"], p["channels"]) == ("ppm", 2, 1, 3)
    assert p["mean_val"] == pytest.approx(3.5, abs=1e-12)
    j = got[4]
    assert j["format"] is None and j["n_bytes"] == len(junk)


def test_multimodal_synthesized_bmp_roundtrip(spark):
    """synthesize -> decode over the documents table: every payload parses
    as an 8x8 3-channel BMP whose pixel mean matches the resized text
    bytes (padding columns excluded by the decoder)."""
    import numpy as np

    from aml_feature_store_spark.operators.multimodal import (
        decode_features,
        synthesize_bmp_payloads,
    )
    from aml_feature_store_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    got = {r["doc_id"]: r for r in
           decode_features(synthesize_bmp_payloads(docs)).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(texts)
    stride = 24  # 8*3 is already 4-byte aligned - no row padding
    for doc_id, text in texts.items():
        r = got[doc_id]
        assert (r["format"], r["width"], r["height"], r["channels"]) == (
            "bmp", 8, 8, 3)
        src = np.frombuffer((text or " ").encode("utf-8"), dtype=np.uint8)
        px = np.resize(src, stride * 8).astype(float)
        assert r["mean_val"] == pytest.approx(float(px.mean()), abs=1e-9)


def test_near_dup_components_chain_triangle_singleton(spark):
    """Min-label propagation handles chains (transitivity), triangles,
    and singletons; canonical = min id per component."""
    from aml_feature_store_spark.operators.dedup import near_dup_components

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 9)], "doc_id long"
    )
    # chain 1-2-3-4 (diameter 3), triangle 5-6-7, singleton 8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7)],
        "d1 long, d2 long",
    )
    got = {r["doc_id"]: r for r in near_dup_components(docs, pairs).collect()}
    assert {d: got[d]["component"] for d in range(1, 9)} == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5, 8: 8,
    }
    assert [d for d in range(1, 9) if got[d]["is_canonical"]] == [1, 5, 8]


def test_ivf_index_roundtrip_matches_inmemory(spark, tmp_path):
    """Persisted-index ANN == in-memory IVF bit-for-bit, and the probe
    scan prunes to the probed centroid partitions."""
    import contextlib
    import io

    from aml_feature_store_spark.operators import simsearch
    from aml_feature_store_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf")
    simsearch.build_ivf_index(emb, path)
    got = simsearch.ivf_index_topk(spark, path, queries, k=5)
    a = {(r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
         for r in got.collect()}
    b = {(r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
         for r in simsearch.ivf_topk(emb, queries, k=5).collect()}
    assert a == b and len(a) == 15
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_lines and any("centroid_id" in l for l in scan_lines)


def test_jpeg_flat_block_q100_pixel_exact():
    """The content class backing the r9 JPEG/MJPEG oracle contracts: at
    quality 100 (all Annex-K quant entries scale to 1) a FLAT 8×8 block
    has one integer DC coefficient and zero ACs, so the lossy DCT
    pipeline reproduces it bit-exactly — pinned over all 256 gray levels
    and on 4-block 16×16 composites with extreme DC deltas."""
    import numpy as np

    from aml_feature_store_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for v in range(256):
        px = np.full((8, 8, 3), v, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(px, quality=100)), px)
    for vals in ([0, 255, 0, 255], [128, 127, 129, 1], [17, 200, 3, 254]):
        px = np.zeros((16, 16, 3), np.uint8)
        px[:8, :8], px[:8, 8:], px[8:, :8], px[8:, 8:] = vals
        assert np.array_equal(decode_jpeg(encode_jpeg(px, quality=100)), px)


def test_jpeg_ac_ripple_q100_pixel_exact():
    """The r10 AC extension of the oracle content class: base + a·s_x
    with s = (+1,−1,−1,+1,+1,−1,−1,+1) (the scaled u=4 DCT-II basis) has
    EXACTLY two integer DCT coefficients — DC = 8(base−128) and
    C(4,0) = 8a — so the quality-100 round trip stays bit-exact while
    genuinely exercising zigzag ordering, (run,size) AC Huffman codes,
    and nonzero-AC dequant. Pinned over all 256 bases at the clamped
    max amplitude, all amplitudes 0-7 at mid/extreme bases, and a
    4-block composite mixing amplitudes; plus the squared-sum identity
    Σp² = 192·Σ_blocks(base² + a²) the SQL oracle relies on."""
    import numpy as np

    from aml_feature_store_spark.operators.jpeg import decode_jpeg, encode_jpeg

    S = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)

    def block_img(pairs):
        px = np.zeros((16, 16, 3), np.int64)
        for b, (r, c) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
            base, a = pairs[b % len(pairs)]
            px[r : r + 8, c : c + 8] = (base + a * S)[:, None, None]
        return px.astype(np.uint8)

    for base in range(256):
        a = min(7, base, 255 - base)
        img = block_img([(base, a)])
        assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)
    for base in (7, 128, 248):
        for a in range(8):
            aa = min(a, base, 255 - base)
            img = block_img([(base, aa)])
            assert np.array_equal(
                decode_jpeg(encode_jpeg(img, quality=100)), img
            )
    pairs = [(17, 5), (200, 7), (3, 3), (254, 1)]
    img = block_img(pairs)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.array_equal(dec, img)
    assert (dec.astype(np.int64) ** 2).sum() == 192 * sum(
        b * b + a * a for b, a in pairs
    )
    assert dec.astype(np.int64).sum() == 192 * sum(b for b, _ in pairs)


def test_multimodal_bmp_orientation():
    """Positive-height BMPs store rows bottom-up (spec): the decoder must
    flip so row 0 is the TOP image row; negative height means top-down
    and is kept as-is; the encoder mirrors the flip so the round trip is
    pixel-exact AND the first FILE row is the bottom image row. Pinned
    because order-invariant sum contracts cannot see orientation (the
    r8 no-flip defect certified green on every sum oracle)."""
    import struct

    import numpy as np

    from aml_feature_store_spark.operators.multimodal import (
        _encode_bmp,
        _parse_bmp_pixels,
    )

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    b = _encode_bmp(px)
    (off,) = struct.unpack_from("<I", b, 10)
    file_row0 = np.frombuffer(b, np.uint8, count=24, offset=off).reshape(8, 3)
    assert np.array_equal(file_row0, px[7])  # bottom image row first in file
    got = _parse_bmp_pixels(b)
    assert got[:3] == (8, 8, 3) and np.array_equal(got[3], px)
    # negative height = top-down: decoder keeps file order
    hdr = b"BM" + struct.pack("<IHHI", 54 + 24 * 8, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 8, -8, 1, 24, 0, 24 * 8, 2835, 2835, 0, 0
    )
    got_td = _parse_bmp_pixels(hdr + px.tobytes())
    assert np.array_equal(got_td[3], px)


def test_multimodal_resize_nearest_neighbor_exact(spark):
    """4x4 resize of a known 8x8 BMP picks exactly the nearest-neighbor
    source pixels ((y*h)//oh, (x*w)//ow) and re-encodes losslessly."""
    import numpy as np

    from aml_feature_store_spark.operators.multimodal import (
        _encode_bmp,
        _parse_bmp_pixels,
        resize_images,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_encode_bmp(px)))], "doc_id long, payload binary"
    )
    out = resize_images(df, 4, 4).collect()[0]["payload"]
    got = _parse_bmp_pixels(bytes(out))
    assert got[:3] == (4, 4, 3)
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(got[3], px[ys][:, xs])


def test_multimodal_frame_sample_roundtrip(spark):
    """Every k-th frame of the length-prefixed container comes back
    byte-identical with its index; non-container payloads emit nothing."""
    from aml_feature_store_spark.operators.multimodal import (
        pack_frame_sequence,
        sample_frames,
    )

    frames = [bytes([i]) * (10 + i) for i in range(5)]
    df = spark.createDataFrame(
        [(1, bytearray(pack_frame_sequence(frames))), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = sample_frames(df, every_k=2).collect()
    got = {(r["doc_id"], r["frame_idx"]): bytes(r["payload"]) for r in rows}
    assert got == {(1, 0): frames[0], (1, 2): frames[2], (1, 4): frames[4]}


def test_multimodal_malformed_header_yields_null_row(spark):
    """A payload with valid magic bytes but a malformed body must decode
    to a NULL row (format NULL, n_bytes kept), not fail the task."""
    from aml_feature_store_spark.operators.multimodal import decode_features

    bad_ppm = b"P6\nabc def\n255\n" + bytes(16)   # non-numeric header tokens
    bad_bmp = b"BM" + bytes(60)                   # zeroed header fields
    df = spark.createDataFrame(
        [(1, bytearray(bad_ppm)), (2, bytearray(bad_bmp))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_features(df).collect()}
    assert got[1]["format"] is None and got[1]["n_bytes"] == len(bad_ppm)
    assert got[2]["format"] is None and got[2]["n_bytes"] == len(bad_bmp)


def test_near_dup_components_raises_when_unconverged(spark):
    """Exhausting max_iterations without a fixpoint must raise, not
    silently return partial component labels."""
    import pytest as _pytest

    from aml_feature_store_spark.operators.dedup import near_dup_components

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    # path graph of diameter 5: needs ~5 rounds for label 1 to reach node 6
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "d1 long, d2 long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        near_dup_components(docs, pairs, max_iterations=2)
    # and with enough rounds the same graph converges to one component
    got = near_dup_components(docs, pairs, max_iterations=10)
    assert {r["component"] for r in got.collect()} == {1}


def test_png_roundtrip_all_channel_counts():
    """encode -> parse round-trips exactly for gray / gray+alpha / RGB /
    RGBA (8-bit, non-interlaced) — the native stdlib-zlib PNG codec."""
    import numpy as np

    from aml_feature_store_spark.operators.multimodal import (
        _encode_png,
        _parse_png_pixels,
    )

    rng = np.random.default_rng(7)
    for nch in (1, 2, 3, 4):
        px = rng.integers(0, 256, (13, 9, nch), dtype=np.uint8)
        w, h, outc, got = _parse_png_pixels(_encode_png(px))
        assert (w, h, outc) == (9, 13, nch)
        assert np.array_equal(got, px)


def test_png_all_five_scanline_filters_invert_exactly():
    """A PNG whose rows cycle through filters 0-4 (None/Sub/Up/Average/
    Paeth), forward-filtered by an independent reference implementation
    here, must decode back to the original pixels bit-exactly."""
    import struct
    import zlib

    import numpy as np

    from aml_feature_store_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png_pixels,
        _png_chunk,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    nch, (h, w) = 3, px.shape[:2]
    stride = w * nch
    flat = px.reshape(h, stride)
    scan = np.zeros((h, stride + 1), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = y % 5
        scan[y, 0] = f
        row = flat[y].astype(np.int32)
        filt = np.zeros(stride, np.int32)
        for i in range(stride):
            a = row[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (row[i] - pred) & 0xFF
        scan[y, 1:] = filt.astype(np.uint8)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(scan.tobytes()))
           + _png_chunk(b"IEND", b""))
    got = _parse_png_pixels(png)
    assert got is not None
    assert np.array_equal(got[3], px)


def test_png_palette_and_malformed():
    """Palette-indexed PNGs map through PLTE; truncated / bad-signature /
    interlaced payloads return None (-> NULL row, not a task failure)."""
    import struct
    import zlib

    import numpy as np

    from aml_feature_store_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png_pixels,
        _png_chunk,
    )

    rng = np.random.default_rng(3)
    table = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 5), dtype=np.uint8)
    scan = np.zeros((6, 6), np.uint8)
    scan[:, 1:] = idx

    def build(interlace):
        ihdr = struct.pack(">IIBBBBB", 5, 6, 8, 3, 0, 0, interlace)
        return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"PLTE", table.tobytes())
                + _png_chunk(b"IDAT", zlib.compress(scan.tobytes()))
                + _png_chunk(b"IEND", b""))

    w, h, outc, got = _parse_png_pixels(build(0))
    assert (w, h, outc) == (5, 6, 3)
    assert np.array_equal(got, table[idx])
    assert _parse_png_pixels(build(0)[:20]) is None
    assert _parse_png_pixels(b"XXXX" + build(0)[4:]) is None
    assert _parse_png_pixels(build(1)) is None  # Adam7 -> PIL fallback


def test_png_decode_and_resize_on_spark(spark):
    """synthesize_png_payloads -> decode_features on Spark: every payload
    decodes as an 8x8 RGB PNG with the exact pixel mean of the resized
    text bytes; resize_images halves it to 4x4 staying in PNG format."""
    import numpy as np

    from aml_feature_store_spark.operators.multimodal import (
        decode_features,
        resize_images,
        synthesize_png_payloads,
    )
    from aml_feature_store_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    pngs = synthesize_png_payloads(docs)
    got = {r["doc_id"]: r for r in decode_features(pngs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        r = got[doc_id]
        assert (r["format"], r["width"], r["height"], r["channels"]) == (
            "png", 8, 8, 3)
        src = np.frombuffer((text or " ").encode("utf-8"), dtype=np.uint8)
        px = np.resize(src, 8 * 8 * 3).astype(float)
        assert r["mean_val"] == pytest.approx(float(px.mean()), abs=1e-9)

    small = {r["doc_id"]: r for r in
             decode_features(resize_images(pngs, 4, 4)).collect()}
    for doc_id in texts:
        r = small[doc_id]
        assert (r["format"], r["width"], r["height"], r["channels"]) == (
            "png", 4, 4, 3)


def test_duplicated_span_coverage_known_corpus(spark):
    """3-gram span coverage on a hand-built corpus: shared phrase tagged
    in both docs, unique tails untagged, short docs yield zero spans."""
    from aml_feature_store_spark.operators.dedup import duplicated_span_coverage

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),      # spans: 3 (1 shared w/ doc 2)
            (2, "the quick brown cat sleeps"),     # spans: 3 (1 shared w/ doc 1)
            (3, "aa bb aa bb aa bb"),              # intra-doc repeats: 4 spans
            (4, "too short"),                      # < 3 words -> 0 spans
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           duplicated_span_coverage(docs, n=3).collect()}
    # doc 1: spans {the quick brown, quick brown fox, brown fox jumps};
    # only "the quick brown" occurs twice corpus-wide
    assert got[1]["n_spans"] == 3 and got[1]["n_dup_spans"] == 1
    assert got[1]["dup_fraction"] == pytest.approx(1 / 3, abs=1e-12)
    assert got[2]["n_dup_spans"] == 1
    # doc 3: spans [aa bb aa, bb aa bb, aa bb aa, bb aa bb] -> all dup'd
    assert got[3]["n_spans"] == 4 and got[3]["n_dup_spans"] == 4
    assert got[3]["dup_fraction"] == 1.0
    assert got[4]["n_spans"] == 0 and got[4]["dup_fraction"] == 0.0


def test_repetition_stats_known_docs(spark):
    """Top-n-gram fractions on hand-built docs: degenerate repetition
    scores 1.0, diverse text scores 1/n, single-word doc has no bigrams."""
    from aml_feature_store_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),   # top uni 4/4, top bi 3/3
            (2, "a b c d"),               # top uni 1/4, distinct 1.0
            (3, "x"),                      # no bigrams -> 0.0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["top_unigram_frac"] == 1.0
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[1]["distinct_word_ratio"] == pytest.approx(0.25, abs=1e-12)
    assert got[2]["top_unigram_frac"] == pytest.approx(0.25, abs=1e-12)
    assert got[2]["distinct_word_ratio"] == 1.0
    assert got[2]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-12)
    assert got[3]["n_words"] == 1 and got[3]["top_bigram_frac"] == 0.0


def test_star_contraction_components_match_label_propagation(spark):
    """Star contraction on a 40-node random graph + long path + isolated
    nodes: labels match brute-force union-find exactly, and a
    diameter-12 path converges within the fixed O(log n) round budget
    (label propagation would need 12 rounds; star needs ~4)."""
    import random

    from aml_feature_store_spark.operators.dedup import (
        near_dup_components,
        near_dup_components_star,
    )

    rng = random.Random(42)
    nodes = list(range(1, 41))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(25)]
    edges += [(100 + i, 101 + i) for i in range(12)]  # path of diameter 12
    all_nodes = sorted({n for e in edges for n in e} | set(nodes) | {999})

    # brute-force union-find reference
    parent = {n: n for n in all_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in all_nodes}

    docs = spark.createDataFrame([(n,) for n in all_nodes], "doc_id long")
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {
        r["doc_id"]: r["component"]
        for r in near_dup_components_star(docs, pairs, max_rounds=6).collect()
    }
    assert got == want
    # and agrees with the label-propagation implementation
    lp = {
        r["doc_id"]: r["component"]
        for r in near_dup_components(docs, pairs, max_iterations=20).collect()
    }
    assert got == lp


def test_star_contraction_empty_and_singletons(spark):
    from aml_feature_store_spark.operators.dedup import near_dup_components_star

    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    pairs = spark.createDataFrame([], "d1 long, d2 long")
    got = {r["doc_id"]: (r["component"], r["is_canonical"])
           for r in near_dup_components_star(docs, pairs).collect()}
    assert got == {1: (1, True), 2: (2, True), 3: (3, True)}


def test_gif_roundtrip_and_spark_decode(spark):
    """GIF encode -> decode round-trips bit-exactly (palette build + LZW),
    and decode_features dispatches .gif payloads on Spark."""
    import numpy as np

    from aml_feature_store_spark.operators.multimodal import (
        _encode_gif,
        _parse_gif_pixels,
        decode_features,
    )

    rng = np.random.default_rng(9)
    base = rng.integers(0, 6, (11, 7), dtype=np.uint8) * 40
    px = np.stack([base, 255 - base, base // 2], axis=-1).astype(np.uint8)
    w, h, c, arr = _parse_gif_pixels(_encode_gif(px))
    assert (w, h, c) == (7, 11, 3)
    assert np.array_equal(arr, px)

    df = spark.createDataFrame(
        [(1, bytearray(_encode_gif(px)))], "doc_id long, payload binary"
    )
    r = decode_features(df).collect()[0]
    assert (r["format"], r["width"], r["height"], r["channels"]) == (
        "gif", 7, 11, 3)
    assert r["mean_val"] == pytest.approx(float(px.astype(float).mean()),
                                          abs=1e-12)


def test_gif_lzw_dictionary_growth_per_spec():
    """A hand-assembled LZW stream with REAL dictionary growth — the
    deferred code (code == table size) and the 3->4 bit width increase —
    must decode to the spec-mandated pixel run. The round-trip encoder
    never grows the dictionary (uncompressed-LZW trick), so this pins the
    decoder against the GIF spec independently."""
    import struct

    import numpy as np

    from aml_feature_store_spark.operators.multimodal import _parse_gif_pixels

    # 7x1 image, all palette index 0, min code size 2:
    # codes = CLEAR(4) 0 6 7 0 EOI(5); 6 and 7 are dictionary entries
    # created mid-stream ("00", "000"); widths: 3,3,3,3,4,4 bits LSB-first
    bits = []
    for code, width in ((4, 3), (0, 3), (6, 3), (7, 3), (0, 4), (5, 4)):
        bits += [(code >> i) & 1 for i in range(width)]
    data = bytearray()
    for i in range(0, len(bits), 8):
        data.append(sum(b << j for j, b in enumerate(bits[i : i + 8])))

    palette = bytes([10, 20, 30] + [0, 0, 0] * 3)  # 4 entries (depth 2)
    gif = (b"GIF89a" + struct.pack("<HHBBB", 7, 1, 0x81, 0, 0) + palette
           + b"\x2C" + struct.pack("<HHHHB", 0, 0, 7, 1, 0)
           + bytes([2, len(data)]) + bytes(data) + b"\x00\x3B")
    got = _parse_gif_pixels(gif)
    assert got is not None
    w, h, c, arr = got
    assert (w, h, c) == (7, 1, 3)
    assert np.array_equal(arr, np.tile(np.array([10, 20, 30], np.uint8),
                                       (1, 7, 1)))


def test_gif_malformed_yields_none():
    from aml_feature_store_spark.operators.multimodal import _parse_gif_pixels

    assert _parse_gif_pixels(b"NOTGIF" + b"\x00" * 20) is None
    assert _parse_gif_pixels(b"GIF89a" + b"\x01" * 4) is None
    # truncated mid color table
    assert _parse_gif_pixels(b"GIF89a" + bytes([7, 0, 1, 0, 0x81, 0, 0, 1])) is None


def test_bm25_hand_computed(spark):
    """Two-doc corpus, one query term: BM25 verified against the closed
    form. doc 1 = 'cat dog' (tf=1, dl=2), doc 2 = 'cat cat cat fish'
    (tf=3, dl=4); N=2, both contain 'cat' so df=2, avgdl=3."""
    import math

    from aml_feature_store_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat cat fish")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_rank(docs, ["cat"]).collect()
    }
    idf = math.log(1.0 + (2 - 2 + 0.5) / (2 + 0.5))
    k1, b, avgdl = 1.2, 0.75, 3.0

    def score(tf, dl):
        return round(
            round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6),
            6,
        )

    assert out == {1: score(1, 2), 2: score(3, 4)}
    assert out[2] > out[1]  # higher tf wins despite longer doc


def test_bm25_excludes_nonmatching_and_limits(spark):
    from aml_feature_store_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(i, "cat" if i % 2 else "dog") for i in range(10)],
        ["doc_id", "text"],
    )
    rows = retrieval.bm25_rank(docs, ["cat"], top_n=3).collect()
    assert len(rows) == 3
    # identical scores -> doc_id ascending tiebreak
    assert [r["doc_id"] for r in rows] == [1, 3, 5]


def test_tfidf_top_terms_ranks_rare_term_first(spark):
    """'zebra' appears once in one doc of three -> highest idf; the
    shared term 'cat' ranks below it despite equal tf."""
    from aml_feature_store_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(1, "cat zebra"), (2, "cat dog"), (3, "cat dog")],
        ["doc_id", "text"],
    )
    rows = retrieval.tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["term_rank"], r["term"]))
    assert sorted(by_doc[1]) == [(1, "zebra"), (2, "cat")]
    # docs 2/3: dog (df=2) beats cat (df=3)
    assert sorted(by_doc[2]) == [(1, "dog"), (2, "cat")]


def test_decontaminate_flags_shared_ngram(spark):
    """Train doc 10 repeats eval doc 1's 5-word phrase verbatim -> both
    its 5-grams... exactly 1 shared distinct 5-gram; doc 11 is clean."""
    from aml_feature_store_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (10, "x alpha beta gamma delta epsilon y"),
            (11, "totally different words here now honest"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_shared_grams"], r["contaminated"])
        for r in dd.decontaminate(
            docs.filter(F.col("doc_id") >= 10),
            docs.filter(F.col("doc_id") < 10),
            n=5,
        ).collect()
    }
    assert out[10] == (1, True)
    assert out[11] == (0, False)


def test_unigram_logprob_rare_tokens_score_higher(spark):
    """A doc of corpus-rare tokens must have higher mean NLL than one of
    corpus-common tokens."""
    from aml_feature_store_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(i, "common words common words") for i in range(8)]
        + [(100, "rareword otherrare thirdrare xyzzy")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["mean_token_nll"]
        for r in retrieval.unigram_logprob_quality(docs).collect()
    }
    assert out[100] > out[0]
    import math

    # common docs: p(common)=p(words)=16/36 -> NLL = ln(36/16)
    assert out[0] == pytest.approx(round(math.log(36 / 16), 6), abs=2e-6)


def test_domain_mixture_weights_upweight_small_domain(spark):
    """alpha=0.7 temperature: the small domain's sample_weight exceeds
    its raw proportion, the big domain's shrinks; weights sum to 1."""
    import __spark_entry__ as ent

    qs = ent.queries()
    # build directly from a tiny frame via the same operators
    from aml_feature_store_spark.queries.llm_pipeline import (
        domain_mixture_weights as q,
    )

    rows = q(spark, "/root/testdata/sf0.001").collect()
    total_w = sum(r["sample_weight"] for r in rows)
    assert total_w == pytest.approx(1.0, abs=1e-5)
    big = max(rows, key=lambda r: r["n_docs"])
    small = min(rows, key=lambda r: r["n_docs"])
    if big["n_docs"] != small["n_docs"]:
        assert small["sample_weight"] > small["proportion"]
        assert big["sample_weight"] < big["proportion"]


def test_text_index_roundtrip_matches_scan_bm25(spark, tmp_path):
    """Index-served BM25 must be bit-identical to the direct scan path,
    and the probe must prune partitions at file listing (PartitionFilters
    with a literal IN over the md5 term buckets)."""
    from aml_feature_store_spark.operators import retrieval

    docs = spark.createDataFrame(
        [
            (1, "spark window join stream hash spark"),
            (2, "join join join window other words"),
            (3, "completely unrelated text body here"),
            (4, "hash stream hash stream hash stream"),
        ],
        ["doc_id", "text"],
    )
    terms = ["spark", "join", "hash"]
    path = str(tmp_path / "tidx")
    retrieval.build_text_index(docs, path)
    direct = retrieval.bm25_rank(docs, terms).collect()
    via_index = retrieval.index_bm25(spark, path, terms).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in via_index]

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        retrieval.index_bm25(spark, path, terms).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_term_bucket_portable_hash(spark):
    """Driver-side md5 bucket must equal the Spark column expression for
    the same term (the pruning literals depend on it)."""
    from aml_feature_store_spark.operators import retrieval

    terms = ["spark", "join", "zzz", "a", "42"]
    df = spark.createDataFrame([(t,) for t in terms], ["term"]).withColumn(
        "bucket", retrieval._term_bucket_col()
    )
    got = {r["term"]: r["bucket"] for r in df.collect()}
    for t in terms:
        assert got[t] == retrieval.term_bucket(t)


def test_pca_top_component_finds_dominant_direction(spark):
    """Vectors = t * e0 + small noise on e1: the top component must align
    with dim 0 (|loading_0| ~ 1) and be unit-norm."""
    import math

    from aml_feature_store_spark.operators import simsearch

    rows = []
    for i in range(40):
        t = (i - 20) / 4.0
        noise = 0.01 * ((i * 7) % 5 - 2)
        rows.append((i, [float(t), float(noise), 0.0, 0.0]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["dim"]: r["loading"] for r in simsearch.pca_top_component(emb).collect()}
    assert abs(abs(out[0]) - 1.0) < 1e-3
    assert abs(out[2]) < 1e-6 and abs(out[3]) < 1e-6
    assert abs(math.sqrt(sum(v * v for v in out.values())) - 1.0) < 1e-6


def test_sequence_packing_concat_then_chunk_invariants(spark):
    """Packing = concat docs in doc_id order, cut every BUDGET tokens; a
    doc joins the pack its starting offset lands in. Pins: pack mass
    conservation, doc_id-span contiguity across packs, and each pack's
    start offset living in [pack_id*B, (pack_id+1)*B)."""
    from aml_feature_store_spark.queries.llm_pipeline import (
        _PACK_BUDGET,
        sequence_packing,
    )

    out = sorted(
        sequence_packing(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["pack_id"],
    )
    assert out[0]["pack_id"] == 0
    assert [r["pack_id"] for r in out] == list(range(len(out)))
    total = sum(r["pack_tokens"] for r in out)
    assert sum(r["n_docs"] for r in out) == 500  # sf0.001 documents count
    # doc_id spans tile the corpus without gap or overlap
    for a, b in zip(out, out[1:]):
        assert b["first_doc_id"] == a["last_doc_id"] + 1
    # each pack's first doc STARTS inside the pack's token interval, so
    # the cumulative mass of all earlier packs is within [id*B, (id+1)*B)
    run = 0
    for r in out:
        assert r["pack_id"] * _PACK_BUDGET <= run < (r["pack_id"] + 1) * _PACK_BUDGET
        run += r["pack_tokens"]
    assert run == total


def test_quality_weighted_sample_biases_and_is_layout_invariant(spark):
    """E-S weighted sampling: the top-K exponential-key cut must (a) be
    identical under any partitioning (pure hash function of content),
    (b) overrepresent high-quality docs vs the corpus mean, and (c) use
    a global top-K plan, not a full sort or single-partition window."""
    from aml_feature_store_spark.queries.llm_pipeline import (
        quality_weighted_sample,
    )
    from aml_feature_store_spark.operators import text
    from aml_feature_store_spark.sources import load_table

    out = quality_weighted_sample(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 100
    assert rows == out.collect()  # deterministic re-execution
    corpus_mean = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select(F.avg(text.quality_score_col()).alias("m"))
        .first()["m"]
    )
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean  # weighting biases toward quality
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
