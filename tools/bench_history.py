#!/usr/bin/env python3
"""Cross-round bench table, regenerated from committed BENCH_r*.json
artifacts alone (r11 VERDICT #4): raw total, calibration state, and the
calibration-normalized total per round — the arithmetic the calibration
constant was added to automate, so no cross-round claim needs a human
to divide by box speed again.

Rounds whose artifact predates the provenance/calibration fields show
"-" in those columns; contaminated runs are flagged (their totals are
not comparable regardless of normalization — ambient load does not
rescale uniformly the way box frequency state does).

Usage: python3 tools/bench_history.py [repo_root]  (prints markdown)
"""
from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rows(root: str):
    from bench import CAL_REF_ALL_MB_S, normalized_total

    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        rnd = os.path.basename(path)[len("BENCH_"):-len(".json")]
        try:
            rec = json.load(open(path))
        except (ValueError, OSError):
            yield (rnd, None, None, None, None, "unreadable")
            continue
        # the driver wraps the bench's JSON line under "parsed"
        if "parsed" in rec and isinstance(rec["parsed"], dict):
            rec = rec["parsed"]
        total = rec.get("value")
        prov = rec.get("provenance") or {}
        cal = (prov.get("calibration") or {}).get("sha256_mb_per_s_all")
        cont = prov.get("contaminated")
        norm = (normalized_total(total, prov.get("calibration"))
                if cal else None)
        note = ""
        if cont:
            note = "contaminated (ambient load) — not comparable"
        elif cal:
            pct = (cal / CAL_REF_ALL_MB_S - 1) * 100
            note = f"box {pct:+.0f}% vs r11 idle baseline"
        yield (rnd, total, cont, cal, norm, note)


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else REPO
    from bench import CAL_REF_ALL_MB_S

    print(f"| round | total (s) | contaminated | cal all-threads (MB/s) "
          f"| normalized total (s, to {CAL_REF_ALL_MB_S:.0f}) | note |")
    print("|---|---|---|---|---|---|")
    for rnd, total, cont, cal, norm, note in rows(root):
        f = lambda v: "-" if v is None else v  # noqa: E731
        print(f"| {rnd} | {f(total)} | {f(cont)} | {f(cal)} "
              f"| {f(norm)} | {note} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
