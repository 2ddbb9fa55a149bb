"""Regenerate catalog.CERTIFIED from the driver's CORRECTNESS_r{N}.json files.

A query is certified in round N if the driver recorded rows_match, a null
err, AND a true hash_match (rows-only checks never certify). Prints the
replacement dict body; apply by pasting between the CERTIFIED braces in
``aml_feature_store_spark/catalog.py`` (keep any invalidation comments for
queries whose implementation changed since their last row — delete those
entries by hand).

Usage: python tools/update_certified.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def latest_certified(root: str) -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("err") is None
                and row.get("hash_match") is True
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    certified = latest_certified(root)
    by_round: dict[int, list[str]] = {}
    for name, rnd in certified.items():
        by_round.setdefault(rnd, []).append(name)
    for rnd in sorted(by_round):
        print(f"    # r{rnd}-certified")
        for name in sorted(by_round[rnd]):
            print(f'    "{name}": {rnd},')
    print(f"# total: {len(certified)} driver-certified queries", file=sys.stderr)
