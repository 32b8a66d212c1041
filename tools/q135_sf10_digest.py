#!/usr/bin/env python3
"""q135 sf10 digest compare (r10 VERDICT #6): engine side through the
chunked pipeline (SPARK_GRAFT_CAND_CHUNKS honored if set), DuckDB side
through the new view-shadow source chunking — the monolithic oracle
spilled >60 GB of all-pairs scratch at sf10 and died on temp disk
(SCALING.md r10 ladder); the shadowed form runs the UNMODIFIED SQL 16
times on hash(source)%16 classes (valid: q135's edges require
a.source = b.source, so clusters never span sources).

Usage: python3 tools/q135_sf10_digest.py [--sf-dir /tmp/sf10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

NAME = "q135_dedup_resolution"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    args = ap.parse_args()

    from oracle_harness import (
        DUCK_DIGEST_SHADOW_CHUNKS,
        duck_connection,
        duck_digest_shadow_chunked,
        spark_digest,
    )

    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (
        get_spark,
    )

    spark = get_spark("q135-sf10-digest")
    fn = q.spark_queries()[NAME]
    sql = q.oracle_queries()[NAME]

    t0 = time.time()
    sd = spark_digest(fn(spark, args.sf_dir))
    t_spark = round(time.time() - t0, 1)
    print(f"engine digest {sd} in {t_spark}s "
          f"(chunks={os.environ.get('SPARK_GRAFT_CAND_CHUNKS', 'auto')})",
          flush=True)

    con = duck_connection(args.sf_dir)
    t0 = time.time()
    dd = duck_digest_shadow_chunked(
        con, sql, *DUCK_DIGEST_SHADOW_CHUNKS[NAME])
    t_duck = round(time.time() - t0, 1)
    ok = sd == dd
    print(json.dumps({"name": NAME, "sf_dir": args.sf_dir, "ok": ok,
                      "spark": sd, "duck": dd,
                      "spark_s": t_spark, "duck_s": t_duck}), flush=True)
    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
