"""Dump ``explain("formatted")`` for bench queries to files.

Writes one ``<query><suffix>.txt`` per query into an output directory —
the judge-facing plan evidence for the optimization rounds
(``plans/r11/<query>_before.txt`` / ``_after.txt``).

Usage:
    python tools/dump_plans.py <out_dir> <suffix> [sf_dir] [query ...]

With no explicit query list, dumps every query in bench.py's HEADLINE
list (the set the driver times). Streaming-sink queries execute on
.explain (they run a bounded stream to build their result); that is the
same behavior tools/plan_audit.py documents.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]

    import bench
    from aml_feature_store_spark.catalog import queries
    from aml_feature_store_spark.session import get_spark

    if not names:
        names = list(bench.HEADLINE)

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    qs = queries()
    n_ok = 0
    failed: list[str] = []
    for name in names:
        try:
            plan = _plan(qs[name](spark, sf_dir))
            n_ok += 1  # only successful explains count (a failure stub is
            # written below either way so the dump visits everything)
        except Exception as e:  # noqa: BLE001 - dump must visit everything
            plan = f"explain failed: {type(e).__name__}: {e}\n"
            failed.append(name)
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n{plan}")
        print(f"{name} -> {path}", flush=True)
    print(f"dumped {n_ok}/{len(names)} plans" + (
        f"; FAILED: {', '.join(failed)}" if failed else ""
    ))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
