"""Per-pair sf100 (1000x) digest-sweep runner with wall-clock budgets.

The monolithic harness stalls when ONE pair's oracle side is
pathological at 1000x (q108's iterative implied-vol SQL ran >20 min
single-threaded in DuckDB); this runner executes each pair in its own
subprocess under a timeout, so slow pairs are RECORDED as
timeout-excluded instead of silently blocking the rest of the decade's
verification. Results append to a JSONL ledger for NOTES.md.

    python3 tools/sf100_sweep.py [--timeout 420] [--names a,b,...]
                                 [--sf-dir /tmp/sf100]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf100")
    ap.add_argument("--timeout", type=float, default=420.0)
    ap.add_argument("--names", default=None)
    ap.add_argument("--out", default="/tmp/sf100_digest_results.jsonl")
    args = ap.parse_args()

    if args.names:
        names = args.names.split(",")
    else:
        plan = json.load(open("/tmp/sf100_keep.json"))
        names = plan["skip"]

    done = set()
    if os.path.exists(args.out):
        for line in open(args.out):
            try:
                done.add(json.loads(line)["name"])
            except (ValueError, KeyError):
                pass

    for name in names:
        if name in done:
            print(f"[skip-done] {name}", flush=True)
            continue
        t0 = time.time()
        # own session/process group: on timeout the WHOLE group (the
        # harness python AND its JVM child, which otherwise holds the
        # stdout pipe open and deadlocks subprocess.run's post-kill
        # communicate()) is killed
        proc = subprocess.Popen(
            [sys.executable, "tests/oracle_harness.py",
             args.sf_dir, "--digest", name],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, start_new_session=True)
        try:
            out, _ = proc.communicate(timeout=args.timeout)
            dt = round(time.time() - t0, 1)
            tail = "\n".join((out or "").strip().split("\n")[-8:])
            if f"[PASS] {name}" in (out or ""):
                status = "pass"
            elif f"[FAIL] {name}" in (out or ""):
                status = "fail"
            else:
                status = "error"
            rec = {"name": name, "status": status, "secs": dt,
                   "tail": tail if status != "pass" else ""}
        except subprocess.TimeoutExpired:
            import signal

            os.killpg(proc.pid, signal.SIGKILL)
            proc.communicate()
            rec = {"name": name, "status": "timeout",
                   "secs": round(time.time() - t0, 1), "tail": ""}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{rec['status'].upper()}] {name} ({rec['secs']}s)",
              flush=True)
        if rec["status"] in ("fail", "error"):
            print(rec["tail"], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
