"""Guards on the catalog's DERIVED presentation order vs the driver's
50-query check cap.

The driver's correctness gate hashes only the FIRST 50 registered queries.
Since r6 the order is derived from ``catalog.CERTIFIED`` (never-certified
oracle queries first, then stalest certification round, rows-only last) —
these tests pin that derivation so the cap always certifies the queries
most in need of a driver row.
"""

from aml_feature_store_spark import catalog

DRIVER_CAP = catalog.DRIVER_CAP


def _ordered_names():
    return [q.name for q in catalog._ordered()]


def test_certified_names_are_registered():
    catalog._ensure_loaded()
    stale = set(catalog.CERTIFIED) - set(catalog.QUERIES)
    assert not stale, f"CERTIFIED names no longer registered: {sorted(stale)}"


def test_certified_queries_are_oracle_backed():
    """A rows-only query can't have been hash-certified."""
    catalog._ensure_loaded()
    bogus = [
        n for n in catalog.CERTIFIED if catalog.QUERIES[n].oracle is None
    ]
    assert not bogus, f"rows-only queries marked CERTIFIED: {bogus}"


def test_never_certified_oracle_queries_lead_the_window():
    """Every oracle-backed query with no driver row sorts before every
    certified one — the whole point of the derived order."""
    catalog._ensure_loaded()
    names = _ordered_names()
    first_certified = next(
        i for i, n in enumerate(names) if n in catalog.CERTIFIED
    )
    late_uncertified = [
        n
        for n in names[first_certified:]
        if n not in catalog.CERTIFIED and catalog.QUERIES[n].oracle is not None
    ]
    assert not late_uncertified, (
        f"never-certified oracle queries sorted after certified ones: "
        f"{late_uncertified}"
    )


def test_certified_order_is_stalest_first():
    catalog._ensure_loaded()
    rounds = [
        catalog.CERTIFIED[n] for n in _ordered_names() if n in catalog.CERTIFIED
    ]
    assert rounds == sorted(rounds), "certified queries not stalest-first"


def test_first_50_are_all_oracle_backed():
    """Driver slots are scarce: a rows-only query inside the cap burns a
    hash-check slot for no signal."""
    catalog._ensure_loaded()
    window = _ordered_names()[:DRIVER_CAP]
    rows_only = [n for n in window if catalog.QUERIES[n].oracle is None]
    assert not rows_only, (
        f"rows-only queries occupy driver check slots: {rows_only}"
    )


def test_rows_only_sort_last():
    catalog._ensure_loaded()
    names = _ordered_names()
    first_rows_only = next(
        (i for i, n in enumerate(names) if catalog.QUERIES[n].oracle is None),
        len(names),
    )
    mixed = [
        n
        for n in names[first_rows_only:]
        if catalog.QUERIES[n].oracle is not None
    ]
    assert not mixed, f"oracle-backed queries sorted after rows-only: {mixed}"


def test_r6_rotation_certifies_the_judge_only_queries():
    """VERDICT r5 directive #1: the 22 queries certified only by the judge's
    re-check (plus this round's invalidations) must sit inside the cap."""
    window = set(_ordered_names()[:DRIVER_CAP])
    for name in (
        "psi_drift_value",
        "chi2_drift_event_type",
        "model_calibration_bins",
        "cusum_changepoint",
        "revenue_cube_by_type_dow",
        "shipping_priority_q3",
        "promo_revenue_q14",
        "funnel_conversion",
        "cohort_retention_weekly",
        "rfm_segments",
        "event_type_transitions",
        "basket_lift_pairs",
        "hits_bipartite",
        "viewers_never_purchased",
        "data_quality_profile",
        "robust_zscore_outliers",
        "embedding_pca_component",
        "embedding_pca_scores",
        "bm25_index_topk",
        "streaming_dedup_events",
        "streaming_dim_enrich",
        "streaming_interval_join",
        "seeded_sample",
        # invalidated this round (implementation changes)
        "pagerank_bipartite",
        "streaming_per_event_extended",
    ):
        assert name in window, f"{name} fell outside the driver cap"
