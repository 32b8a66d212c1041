#!/usr/bin/env python3
"""Dump `.explain("formatted")` for every declared query and emit a
red-flag summary (Exchange count, Python-eval nodes, join strategies,
cartesian products, scan pushdown) — the measurement step of the
optimization guide (§1 / §7.2).

Usage:
  python tools/plan_audit.py [--sf-dir /root/testdata/sf0.001]
                             [--out /tmp/plan_audit] [--only q23,q30]

Writes <out>/<name>.txt per query and <out>/summary.jsonl, then prints a
sorted table of flag counts. Plan CONSTRUCTION only (explain is
driver-side); queries whose builders run bounded driver actions (kmeans
literals, portfolio opt) execute those at the tiny SF.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from build_a_market_data_etl_strategy_backtesting_engine_spark import (  # noqa: E402
    get_spark,
    queries as q,
)

NODE_PATTERNS = {
    "exchanges": re.compile(r"^\s*\+?-?\s*Exchange\b", re.M),
    "batch_eval_python": re.compile(r"BatchEvalPython", re.M),
    "arrow_eval_python": re.compile(r"ArrowEvalPython", re.M),
    "map_in_pandas": re.compile(r"MapInPandas|FlatMapGroupsInPandas|MapInArrow", re.M),
    "sort_merge_join": re.compile(r"SortMergeJoin", re.M),
    "broadcast_hash_join": re.compile(r"BroadcastHashJoin", re.M),
    "shuffled_hash_join": re.compile(r"ShuffledHashJoin", re.M),
    "bnl_join": re.compile(r"BroadcastNestedLoopJoin", re.M),
    "cartesian": re.compile(r"CartesianProduct", re.M),
    "window": re.compile(r"^\s*\+?-?\s*Window\b", re.M),
    "sorts": re.compile(r"^\s*\+?-?\s*Sort\b", re.M),
    "generate": re.compile(r"^\s*\+?-?\s*Generate\b", re.M),
    "scans": re.compile(r"Scan parquet", re.M),
}


def audit_plan(text: str) -> dict:
    flags = {k: len(p.findall(text)) for k, p in NODE_PATTERNS.items()}
    # scans with no pushed filters but a Filter directly above are worth
    # eyeballing; record raw PushedFilters lines for the summary
    flags["pushed_filters"] = re.findall(r"PushedFilters: \[(.*?)\]", text)
    flags["read_schemas"] = [
        s[:160] for s in re.findall(r"ReadSchema: (.*)", text)]
    return flags


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/plan_audit")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    only = {s.strip() for s in args.only.split(",") if s.strip()}

    spark = get_spark("plan-audit")
    names = sorted(q.spark_queries())
    rows = []
    with open(os.path.join(args.out, "summary.jsonl"), "w") as sink:
        for name in names:
            if only and not any(name.startswith(o) for o in only):
                continue
            fn = q.spark_queries()[name]
            t0 = time.perf_counter()
            try:
                df = fn(spark, args.sf_dir)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                text = buf.getvalue()
            except Exception as e:  # noqa: BLE001
                rows.append({"name": name, "error": f"{type(e).__name__}: {e}"})
                sink.write(json.dumps(rows[-1]) + "\n")
                continue
            build_s = round(time.perf_counter() - t0, 2)
            with open(os.path.join(args.out, f"{name}.txt"), "w") as fh:
                fh.write(text)
            rec = {"name": name, "build_s": build_s, **audit_plan(text)}
            rows.append(rec)
            sink.write(json.dumps(rec) + "\n")
            sink.flush()

    # console: worst offenders first
    def score(r):
        return (r.get("batch_eval_python", 0) * 100
                + r.get("cartesian", 0) * 100
                + r.get("bnl_join", 0) * 50
                + r.get("exchanges", 0))

    rows.sort(key=score, reverse=True)
    print(f"{'query':42s} exch py arrow mip smj bhj shj bnl cart win sort gen")
    for r in rows:
        if "error" in r:
            print(f"{r['name']:42s} ERROR {r['error'][:80]}")
            continue
        print(f"{r['name']:42s} {r['exchanges']:4d} {r['batch_eval_python']:2d} "
              f"{r['arrow_eval_python']:5d} {r['map_in_pandas']:3d} "
              f"{r['sort_merge_join']:3d} {r['broadcast_hash_join']:3d} "
              f"{r['shuffled_hash_join']:3d} {r['bnl_join']:3d} "
              f"{r['cartesian']:4d} {r['window']:3d} {r['sorts']:4d} "
              f"{r['generate']:3d}")
    spark.stop()


if __name__ == "__main__":
    main()
