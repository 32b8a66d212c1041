#!/usr/bin/env python3
"""A/B measure of the sized cold-pass pair salt at sf10, chunks forced
(r12 VERDICT #9 / r11 carried item): the chunked LSH pair join's cold
passes used a fixed b-side salt of _PAIR_SALT=32, which imposes a 32x
a-side explode on EVERY cold pass; r11/r12 sized it from the actual max
cold-bucket pair count (collapses to 1 when every bucket is capped).
This tool measures the end-to-end chunked pair pipeline wall both ways
on the same data in the same session, interleaved reps, and writes the
evidence row.

Usage: python tools/pair_salt_ab.py [--sf-dir /tmp/sf10] [--chunks 8]
                                    [--reps 2] [--out evidence/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from build_a_market_data_etl_strategy_backtesting_engine_spark import (  # noqa: E402
    get_spark,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (  # noqa: E402
    dedup,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (  # noqa: E402
    load_tables,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--budget", type=int, default=5_000_000)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("pair-salt-ab", master=f"local[{cpus}]")
    docs = load_tables(spark, args.sf_dir, ["documents"])["documents"]
    sigs = dedup.minhash_signatures(docs, num_hashes=16, k=5)

    def run_once(label: str) -> float:
        spark.sparkContext.setJobDescription(f"pair-salt-ab: {label}")
        t0 = time.perf_counter()
        out = dedup.lsh_candidate_pairs(
            sigs, num_hashes=16, bands=4, max_band_df=200,
            chunk_ranges=args.chunks, hot_pair_budget=args.budget)
        out.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    real_sized = dedup._sized_pair_salt
    results = {"sized": [], "fixed32": []}
    n_pairs = {}
    # one untimed warm pass (codegen, footers) with the current code
    run_once("warmup")
    for rep in range(args.reps):
        # interleaved A/B so box drift hits both arms equally
        results["sized"].append(run_once(f"sized rep{rep}"))
        dedup._sized_pair_salt = lambda _m: dedup._PAIR_SALT
        try:
            results["fixed32"].append(run_once(f"fixed32 rep{rep}"))
        finally:
            dedup._sized_pair_salt = real_sized
    # row-count parity of the two arms (the salt must not change output)
    for label, patch in (("sized", None),
                         ("fixed32", lambda _m: dedup._PAIR_SALT)):
        if patch:
            dedup._sized_pair_salt = patch
        try:
            n_pairs[label] = dedup.lsh_candidate_pairs(
                sigs, num_hashes=16, bands=4, max_band_df=200,
                chunk_ranges=args.chunks,
                hot_pair_budget=args.budget).count()
        finally:
            dedup._sized_pair_salt = real_sized

    row = {
        "what": "sized cold-pass pair salt A/B, chunks forced",
        "sf_dir": args.sf_dir,
        "chunks": args.chunks,
        "hot_pair_budget": args.budget,
        "reps_s": results,
        "min_sized_s": min(results["sized"]),
        "min_fixed32_s": min(results["fixed32"]),
        "speedup": round(min(results["fixed32"]) / min(results["sized"]), 3),
        "n_pairs": n_pairs,
        "outputs_equal_count": n_pairs["sized"] == n_pairs["fixed32"],
        "cpus": cpus,
    }
    print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(json.dumps(row) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
