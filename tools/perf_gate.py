"""Perf-regression gate: fresh bench vs the last committed BENCH_r*.json.

Usage: python tools/perf_gate.py [fresh.json|bench-log] [--threshold 0.10]

The fresh input is either a bench.py output file (the gate scans for the
one-line JSON) or is produced by running bench.py when omitted. Exits
non-zero — loudly — when the fresh value drops more than the threshold
below the best committed round artifact, so a routing/default change that
costs the flagship shows up BEFORE it lands (the round-3 tiled default
cost 27% and nothing caught it; this does).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact_value(path: str) -> float:
    with open(path) as f:
        art = json.load(f)
    if "value" in art:  # bare bench.py line
        return float(art["value"])
    # driver artifact: the bench line rides in the "tail" text
    m = re.search(r'\\"value\\": ([0-9.]+)|"value": ([0-9.]+)',
                  art.get("tail", ""))
    return float(m.group(1) or m.group(2)) if m else 0.0


def last_committed() -> tuple[str, float]:
    """Best committed round artifact — the BEST, not the latest, so a
    regression that already shipped once (round 3) can't lower the bar."""
    arts = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not arts:
        return "none", 0.0
    vals = [(os.path.basename(p), _artifact_value(p)) for p in arts]
    return max(vals, key=lambda nv: nv[1])


def fresh_value(source: str | None) -> float:
    if source:
        with open(source) as f:
            text = f.read()
    else:
        text = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True, text=True, timeout=1200,
        ).stdout
    for line in reversed(text.strip().splitlines()):
        m = re.search(r"\{.*\"metric\".*\}", line)
        if m:
            return float(json.loads(m.group(0))["value"])
    raise SystemExit(f"no bench JSON line found in {source or 'bench.py'}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("fresh", nargs="?", default=None,
                    help="bench output file (runs bench.py if omitted)")
    ap.add_argument("--threshold", type=float, default=0.10)
    args = ap.parse_args()
    name, prev = last_committed()
    fresh = fresh_value(args.fresh)
    if prev <= 0:
        print(f"perf gate: no committed baseline; fresh = {fresh:.3f}")
        return 0
    drop = 1.0 - fresh / prev
    status = "FAIL" if drop > args.threshold else "ok"
    print(f"perf gate [{status}]: fresh {fresh:.3f} vs {name} {prev:.3f} "
          f"({-drop * 100:+.1f}%; threshold -{args.threshold * 100:.0f}%)")
    return 1 if drop > args.threshold else 0


if __name__ == "__main__":
    sys.exit(main())
