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


def test_rotation_pins_never_certified_then_stalest():
    """Round-agnostic rotation invariant (replaces the r7-specific pin,
    which described the pre-r7-fold ledger): the driver certifies only
    the first DRIVER_CAP names, so the window must lead with every
    never-certified oracle query and then absorb ALL rows from the
    stalest certified round (the treadmill: each round retires the
    oldest certifications)."""
    catalog._ensure_loaded()
    names = _ordered_names()
    window = set(names[:DRIVER_CAP])
    oracle = set(catalog.oracle_sql())
    never = oracle - set(catalog.CERTIFIED)
    assert never <= window, f"never-certified outside the cap: {sorted(never - window)}"
    if catalog.CERTIFIED:
        stalest = min(catalog.CERTIFIED.values())
        stale_rows = {
            n for n, r in catalog.CERTIFIED.items() if r == stalest and n in oracle
        }
        # all stalest rows rotate in, up to the cap's remaining room
        room = DRIVER_CAP - len(never)
        if len(stale_rows) <= room:
            assert stale_rows <= window, (
                f"stalest (r{stalest}) rows outside the cap: "
                f"{sorted(stale_rows - window)}"
            )
        else:
            # crowded case (ADVICE r8): more stale rows than room — the
            # post-never-certified slots must STILL be filled exclusively
            # from the stalest round, not from arbitrary newer rows
            filled = set(names[len(never):DRIVER_CAP])
            assert filled <= stale_rows, (
                f"window slots not drawn from the stalest round "
                f"(r{stalest}): {sorted(filled - stale_rows)}"
            )
