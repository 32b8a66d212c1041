#!/usr/bin/env python3
"""Capture `.explain("formatted")` for every bench.py workload (guide §1:
measure/plan-audit before optimizing). Intercepts bench._materialize so the
exact DataFrame each workload would send to the noop sink is explained
instead of executed.

Usage: python tools/bench_plans.py [--sf-dir /root/testdata/sf0.001]
                                   [--out plans/r12] [--suffix _before]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from build_a_market_data_etl_strategy_backtesting_engine_spark import (  # noqa: E402
    get_spark,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/bench_plans")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--executed", action="store_true",
                    help="also run each workload through the noop sink "
                         "and dump the AQE-final executed plan")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    only = {s.strip() for s in args.only.split(",") if s.strip()}

    spark = get_spark("bench-plans")
    captured = {}

    def _capture(df):
        captured["df"] = df

    real_mat = bench._materialize
    bench._materialize = _capture
    try:
        bench._ensure_media_corpus(spark)
        for name, fn in bench.BENCHES.items():
            if only and name not in only:
                continue
            captured.clear()
            fn(spark, args.sf_dir)
            df = captured["df"]
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.out, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            n_exch = buf.getvalue().count("+- Exchange")
            print(f"{name:20s} -> {path}  (tree exchanges={n_exch})")
            if args.executed:
                # run the noop sink, THEN dump the AQE-final physical
                # plan (r12 VERDICT #7: static dumps cannot show
                # ReusedExchange / AQEShuffleRead decisions)
                real_mat(df)
                ex = df._jdf.queryExecution().executedPlan().toString()
                xpath = os.path.join(
                    args.out, f"{name}{args.suffix}_executed.txt")
                with open(xpath, "w") as fh:
                    fh.write(ex)
                print(f"{name:20s} -> {xpath}  "
                      f"(reused_exchanges={ex.count('ReusedExchange')})")
    finally:
        # restore: anything importing bench in this process afterwards
        # must see the real materializer (r12 ADVICE)
        bench._materialize = real_mat
    spark.stop()


if __name__ == "__main__":
    main()
