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


def test_r7_rotation_pins_new_and_stalest():
    """VERDICT r6 #2: the r7 window must lead with this round's new and
    invalidated oracle queries and then absorb EVERY remaining r4-stale
    row — after the r7 driver run no oracle query is certified older
    than r5."""
    catalog._ensure_loaded()
    names = _ordered_names()
    window = set(names[:DRIVER_CAP])
    for name in (
        # new oracle registrations this round
        "suppliers_kept_waiting_q21",
        "min_balance_supplier_q2",
        "dominant_part_suppliers_q20",
        "streaming_tdigest_quantiles",
        # rows-only → oracle conversions this round
        "pca_anomaly_scores",
        "graph_global_centralities",
        # invalidated this round (scaled-int64 lattice rewrite)
        "pagerank_bipartite",
        "hits_bipartite",
    ):
        assert name in window, f"{name} fell outside the driver cap"
    r4 = {n for n, r in catalog.CERTIFIED.items() if r == 4}
    assert r4 <= window, f"r4-stale rows outside the cap: {sorted(r4 - window)}"
