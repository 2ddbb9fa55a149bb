"""Pre-snapshot gate: run the full local oracle check against the LIVE
driver testdata and record the outcome in PROGRESS.jsonl.

Motivation (r3 postmortem): the driver regenerated /root/testdata between
rounds, silently changing events.ts from TIMESTAMP(NANOS) to
TIMESTAMP_MICROS; the engine's pinned nanos decode then corrupted every
timestamp and ~24 driver correctness rows flipped red. A green run of this
gate against the live testdata at snapshot time would have caught the
change in minutes. Run it as the last step of every round:

    python tools/gate.py [sf_dir]

Exit 0 + a {"gate": "oracle-check", ...} PROGRESS.jsonl line on green;
exit 1 (and no line) on any red — do not snapshot on a red gate.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"), sf_dir],
        capture_output=True,
        text=True,
    )
    tail = [ln for ln in proc.stdout.splitlines() if ln.strip()][-1:]
    summary = tail[0] if tail else ""
    green = proc.returncode == 0
    print(proc.stdout[-4000:])
    if not green:
        print(f"GATE RED ({summary}) — fix before snapshot", file=sys.stderr)
        return 1
    line = {
        "ts": time.time(),
        "gate": "oracle-check",
        "sf_dir": sf_dir,
        "summary": summary,
        "wall_s": round(time.time() - t0, 1),
        "green": True,
    }
    with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as f:
        f.write(json.dumps(line) + "\n")
    print(f"GATE GREEN: {summary}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
