"""Global physical-plan audit: explain EVERY registered batch query and
flag 100 TB scale antipatterns, whole-catalog — the sweep version of the
per-query pins in tests/test_plans.py.

Antipatterns flagged:
- CartesianProduct (all-pairs blowup)
- BroadcastNestedLoopJoin with a RELATING join condition (a comparison
  between expressions) — the planner fell back to nested-loop
  evaluation for a real join predicate. Condition-less BNLJ and BNLJ
  carrying only a pushed single-relation filter (isnotnull) are NOT
  flagged: every crossJoin in this
  codebase broadcasts a deliberately small side (1-row scalar aggregates,
  query sets, centroid tables — the families where smallness is
  load-bearing carry their own plan pins in tests/test_plans.py).
- Window with an empty partition spec (single-partition sort of the world)
- BatchEvalPython / row-at-a-time PythonUDF on a relational path
  (ArrowEvalPython / mapInPandas / applyInPandas* are the sanctioned
  vectorized forms and are NOT flagged)

Streaming-sink queries execute on .explain (they run a bounded stream to
build their result), so anything registered with a streaming marker in
its docstring is explained post-materialization — the audit sees the
read-back plan plus the declared design.

Usage: python tools/plan_audit.py [sf_dir] [-v]
Exit 1 if any query trips a flag that is not an explicit, documented
exception below.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Documented exceptions: query -> (pattern-prefix, why it is acceptable)
ALLOWED: dict[str, list[tuple[str, str]]] = {
    "knn_cosine_bruteforce": [(
        "BNLJ fallback (Inner",
        "declared exact baseline: broadcast(query set) x corpus with a "
        "!= self-match guard — small side is broadcast by construction",
    )],
    "ann_recall_at_k": [(
        "BNLJ fallback (Inner",
        "recall metric reuses the brute-force baseline above",
    )],
    "ann_recall_refined": [(
        "BNLJ fallback (Inner",
        "recall metric reuses the brute-force baseline above",
    )],
    "viewers_never_purchased": [(
        "BNLJ fallback (Cross",
        "recency predicate pushed into the crossJoin against the 1-row "
        "broadcast max-ts scalar — filter pushdown on a scalar side, "
        "not a relation-to-relation nested loop",
    )],
}

FLAGS = (
    "CartesianProduct",
    "BatchEvalPython",
)

BNLJ_BLOCK = re.compile(
    r"\(\d+\) BroadcastNestedLoopJoin\s*\nJoin type: (\w+)\s*\n"
    r"Join condition: (.+)"
)

def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    verbose = "-v" in sys.argv

    from aml_feature_store_spark.catalog import queries
    from aml_feature_store_spark.session import get_spark

    spark = get_spark("plan-audit")
    bad: dict[str, list[str]] = {}
    n = 0
    for name, fn in queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = _plan(df)
        except Exception as e:  # noqa: BLE001 - audit must visit everything
            bad.setdefault(name, []).append(f"explain failed: {e}")
            continue
        n += 1
        hits = []
        for flag in FLAGS:
            if flag in plan:
                hits.append(flag)
        for jt, cond in BNLJ_BLOCK.findall(plan):
            # condition-less BNLJ (Cross or Inner) = a deliberate
            # broadcast crossJoin; a single-relation predicate pushed
            # into the join (e.g. isnotnull(...)) is filter pushdown,
            # not a join predicate. Only a RELATING predicate (any
            # comparison between expressions) means the planner fell
            # back to nested-loop for an actual join.
            c = cond.strip()
            if (
                c != "None"
                and not c.startswith("isnotnull(")
                and re.search(r"[=<>]", c)
            ):
                hits.append(f"BNLJ fallback ({jt}, cond={c[:40]})")
        # single-partition WindowExec: formatted plans show the partition
        # spec in the Window node arguments; empty partitionBy renders as
        # "Window [..., windowspecdefinition(<order> ASC NULLS FIRST, ..."
        for m in re.finditer(r"\(\d+\) Window\b[\s\S]*?Arguments: \[(.*)", plan):
            args = m.group(1)
            if "windowspecdefinition(" in args:
                inner = args.split("windowspecdefinition(", 1)[1]
                first_arg = inner.split(",", 1)[0].strip()
                if " ASC" in first_arg or " DESC" in first_arg:
                    hits.append("single-partition Window")
        allowed = [p for p, _ in ALLOWED.get(name, [])]
        real = [h for h in hits if not any(h.startswith(a) for a in allowed)]
        if real:
            bad[name] = real
        if verbose:
            print(f"{'FLAG' if real else 'ok  '}  {name}: {real or ''}")
    print(f"\naudited {n} query plans")
    if bad:
        for name, hits in bad.items():
            print(f"FLAGGED {name}: {hits}")
        return 1
    print("no scale antipatterns in any registered query plan")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
