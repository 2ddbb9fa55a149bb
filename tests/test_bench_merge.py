"""bench.py --markdown multi-artifact merge: the BASELINE.md table is
rendered from the per-query MIN across a round's committed bench runs
(shared-box interference strikes different queries in different runs —
see bench._merge_artifacts), so a merge bug misreports the engine's
numbers. Pure-python, no Spark session."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _artifact(queries, scale100=None, sf=0.1):
    art = {
        "metric": "m",
        "value": round(sum(v for v in queries.values() if v is not None), 3),
        "unit": "sec",
        "repeats": 3,
        "sf": sf,
        "queries": queries,
        "samples": {},
        "errors": {},
        "skipped": [],
    }
    if scale100 is not None:
        art["scale100"] = {
            "n_events": 10_000_000,
            "queries": scale100,
            "value": round(
                sum(v for v in scale100.values() if v is not None), 3
            ),
            "samples": {},
        }
    return art


def test_merge_takes_per_query_min_and_recomputes_totals(tmp_path):
    a = _artifact({"q1": 2.0, "q2": 9.0}, scale100={"s1": 30.0, "s2": None})
    b = _artifact({"q1": 5.0, "q2": 1.0}, scale100={"s1": 10.0, "s2": 7.0})
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    merged = bench._merge_artifacts([str(pa), str(pb)])
    assert merged["queries"] == {"q1": 2.0, "q2": 1.0}
    assert merged["value"] == 3.0  # recomputed from the mins, not copied
    # a None (crashed/skipped sample) never wins over a real number
    assert merged["scale100"]["queries"] == {"s1": 10.0, "s2": 7.0}
    assert merged["scale100"]["value"] == 17.0
    assert merged["merged_from"] == ["a.json", "b.json"]


def test_merge_ignores_queries_missing_from_later_runs(tmp_path):
    a = _artifact({"q1": 2.0, "only_in_a": 4.0})
    b = _artifact({"q1": 1.5})
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    merged = bench._merge_artifacts([str(pa), str(pb)])
    assert merged["queries"] == {"q1": 1.5, "only_in_a": 4.0}


def test_merge_seeds_sections_missing_from_first_run(tmp_path):
    # scale100 succeeded only in the SECOND run: the section must survive
    # the merge (seeded from b) instead of being silently dropped
    a = _artifact({"q1": 2.0})
    b = _artifact({"q1": 3.0}, scale100={"s1": 10.0})
    c = _artifact({"q1": 4.0}, scale100={"s1": 8.0})
    paths = []
    for name, art in (("a", a), ("b", b), ("c", c)):
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(art))
        paths.append(str(p))
    merged = bench._merge_artifacts(paths)
    assert merged["queries"] == {"q1": 2.0}
    assert merged["scale100"]["queries"] == {"s1": 8.0}  # min of b and c
    assert merged["scale100"]["value"] == 8.0
    assert merged["scale100"]["seeded_from"] == "b.json"


def test_merge_seed_attribution_with_identical_artifacts(tmp_path):
    """r9 (ADVICE r8): byte-identical input artifacts (a rerun copied to
    a new file) must not misattribute seeded_from — pairing is by
    position, not dict equality."""
    a = _artifact({"q1": 2.0})
    b = _artifact({"q1": 3.0}, scale100={"s1": 10.0})
    paths = []
    for name, art in (("a", a), ("b_copy1", b), ("b_copy2", b)):
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(art))
        paths.append(str(p))
    merged = bench._merge_artifacts(paths)
    assert merged["scale100"]["seeded_from"] == "b_copy1.json"


def test_discard_reason_rules():
    # clean sample: kept
    assert bench._discard_reason(5.0, ext=1.0, gc_ms=100, steal_cores=0.1) is None
    # external-process load beyond the documented threshold
    r = bench._discard_reason(5.0, ext=bench.EXT_DISCARD_CORES + 1, gc_ms=0,
                              steal_cores=0.0)
    assert r == {"t": 5.0, "ext_cores": bench.EXT_DISCARD_CORES + 1}
    # stop-the-world GC dominating the sample (>50% of wall)
    r = bench._discard_reason(2.0, ext=0.0, gc_ms=1500, steal_cores=0.0)
    assert r == {"t": 2.0, "gc_ms": 1500}
    # hypervisor steal: the r7 class invisible to process accounting —
    # a 953 s sample of a 6 s query with 0 external cores but huge steal
    r = bench._discard_reason(953.0, ext=0.0, gc_ms=0,
                              steal_cores=bench.STEAL_DISCARD_CORES * 3)
    assert r is not None and "steal_cores" in r
    # steal just under the threshold: kept (rule is a threshold, not a tax)
    assert bench._discard_reason(6.0, ext=0.0, gc_ms=0,
                                 steal_cores=bench.STEAL_DISCARD_CORES - 0.5) is None


def test_render_markdown_single_and_multi(tmp_path):
    a = _artifact({"q1": 2.0})
    b = _artifact({"q1": 1.0})
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    single = bench.render_markdown(str(pa))
    assert "| q1 | 2.0 |" in single
    assert "per-query min across" not in single
    multi = bench.render_markdown(f"{pa} {pb}")
    assert "| q1 | 1.0 |" in multi
    assert "per-query min across the named runs" in multi
    assert "a.json b.json" in multi
