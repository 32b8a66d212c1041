#!/usr/bin/env python3
"""Per-workload time breakdown for bench.py (guide §1: know where the
time goes before touching anything): splits each workload's warm wall
into (a) DataFrame CONSTRUCTION (python query building + any bounded
driver actions) and (b) EXECUTION (the noop materialization), and runs
the execution N times for stability.

Usage: python tools/bench_breakdown.py [--sf-dir /root/testdata/sf0.1]
                                       [--reps 3] [--only name,name]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from build_a_market_data_etl_strategy_backtesting_engine_spark import (  # noqa: E402
    get_spark,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (  # noqa: E402
    load_tables,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = {s.strip() for s in args.only.split(",") if s.strip()}

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-breakdown", master=f"local[{cpus}]")
    # same warm-up as bench.py
    load_tables(spark, args.sf_dir)
    spark.sql("SELECT count(*) FROM events").collect()
    bench._ensure_media_corpus(spark)

    captured = {}
    real_mat = bench._materialize
    bench._materialize = lambda df: captured.__setitem__("df", df)

    out = {}
    try:
        for name, fn in bench.BENCHES.items():
            if only and name not in only:
                continue
            spark.sparkContext.setJobDescription(f"breakdown: {name}")
            # untimed first full run (cold: codegen, AQE, broadcast)
            captured.clear()
            t0 = time.perf_counter()
            fn(spark, args.sf_dir)
            build_s = time.perf_counter() - t0
            df = captured["df"]
            real_mat(df)
            execs = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                real_mat(df)
                execs.append(time.perf_counter() - t0)
            # rebuild each rep to measure steady-state construction
            builds = [build_s]
            for _ in range(args.reps - 1):
                captured.clear()
                t0 = time.perf_counter()
                fn(spark, args.sf_dir)
                builds.append(time.perf_counter() - t0)
            out[name] = {
                "build_s": [round(b, 3) for b in builds],
                "exec_s": [round(e, 3) for e in execs],
                "build_min": round(min(builds), 3),
                "exec_min": round(min(execs), 3),
            }
            print(f"{name:20s} build={out[name]['build_min']:6.3f}s "
                  f"exec={out[name]['exec_min']:6.3f}s  "
                  f"(builds={out[name]['build_s']} "
                  f"execs={out[name]['exec_s']})")
    finally:
        # restore: anything importing bench in this process afterwards
        # must see the real materializer (r12 ADVICE)
        bench._materialize = real_mat
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
