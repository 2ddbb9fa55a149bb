"""Guards on the catalog ORDER list vs the driver's 50-query check cap.

The driver's correctness gate hashes only the FIRST 50 registered queries,
so ORDER is load-bearing: a registration missing from it lands at an
arbitrary position relative to the cap (advisor finding, r2). These tests
make that failure mode loud.
"""

from aml_feature_store_spark import catalog

DRIVER_CAP = 50


def _ordered_names():
    return [q.name for q in catalog._ordered()]


def test_every_registered_query_is_in_order():
    catalog._ensure_loaded()
    missing = set(catalog.QUERIES) - set(catalog.ORDER)
    assert not missing, (
        f"registered queries missing from catalog.ORDER (their position vs "
        f"the driver's {DRIVER_CAP}-query cap is undefined): {sorted(missing)}"
    )


def test_order_has_no_stale_or_duplicate_names():
    catalog._ensure_loaded()
    stale = set(catalog.ORDER) - set(catalog.QUERIES)
    assert not stale, f"catalog.ORDER names no longer registered: {sorted(stale)}"
    dupes = {n for n in catalog.ORDER if catalog.ORDER.count(n) > 1}
    assert not dupes, f"duplicate names in catalog.ORDER: {sorted(dupes)}"


def test_first_50_are_all_oracle_backed():
    """Driver slots are scarce: a rows-only query inside the cap burns a
    hash-check slot for no signal."""
    catalog._ensure_loaded()
    window = _ordered_names()[:DRIVER_CAP]
    rows_only = [n for n in window if catalog.QUERIES[n].oracle is None]
    assert not rows_only, (
        f"rows-only queries occupy driver check slots: {rows_only}"
    )


def test_rotated_ann_and_text_queries_are_inside_the_cap():
    """r3 rotation (VERDICT r2 #2): the ANN family + text ops had never
    received a driver correctness row."""
    window = set(_ordered_names()[:DRIVER_CAP])
    for name in (
        "ann_ivf_topk",
        "ann_recall_at_k",
        "ann_ivf_multiprobe",
        "ann_ivf_topk_refined",
        "ann_recall_refined",
        "text_stats",
        "language_id",
        "doc_fingerprints",
    ):
        assert name in window, f"{name} fell outside the driver cap"
