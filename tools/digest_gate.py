#!/usr/bin/env python3
"""Per-round digest gate (r6 VERDICT #5, promoted in r8).

Runs the FULL oracle sweep in digest mode at sf0.1 — count + two 48-bit
md5 value-sums per engine over C99 '%a' hex-float canon — so emission /
representation changes that happen to preserve sf0.01 row hashes are
still digest-checked at 10x the rows every round. Exits nonzero if:

* any pair fails, or
* fewer than MIN_PAIRS pairs actually ran in digest mode (a coverage
  regression — e.g. pairs silently dropping their digest canon — must
  fail the gate, not shrink it).

Measured r8: 173/173 in 7m37s wall at sf0.1 on a loaded local[32] box —
inside the 10-minute round-checklist budget with zero exclusions.

Usage: python3 tools/digest_gate.py [sf_dir]   (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

MIN_PAIRS = 150


def main() -> int:
    from oracle_harness import run_all

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t0 = time.monotonic()
    results = run_all(sf_dir, digest=True)
    wall = time.monotonic() - t0
    n_pass = sum(1 for r in results if r["ok"])
    n_fail = sum(1 for r in results if r["ok"] is False)
    n_digest = sum(1 for r in results if r.get("mode") == "digest"
                   or r.get("digest"))
    print(f"\ndigest gate: {n_pass} pass, {n_fail} fail, "
          f"{n_digest} digest-checked, {wall:.0f}s wall at {sf_dir}")
    if n_fail:
        return 1
    if n_digest < MIN_PAIRS:
        print(f"digest gate: COVERAGE REGRESSION — only {n_digest} pairs "
              f"ran in digest mode (floor {MIN_PAIRS})")
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
