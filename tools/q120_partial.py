"""q120 sf100 PARTIAL digest evidence (r9 VERDICT #3).

q120 (20M American options through the chunked binomial pricer) is
wall-bounded at sf100, not disk-bounded: the full run is ~80 min Spark
plus an hours-long single-threaded DuckDB oracle. Rather than leaving
the claim extrapolated, this tool runs the FIRST K of the 64 source
chunks (``p_partkey % 64 = i`` — the same partition both sides' chunked
digests use, tests/oracle_harness.py DUCK_DIGEST_CHUNKS) and compares
the per-chunk (count, hashsum1, hashsum2) tuples directly. K matched
chunks = a measured 1/64-resolution sample of the full digest equality,
plus measured s/chunk constants for the SCALING.md attribution.

Run:  python3 tools/q120_partial.py [--sf-dir /tmp/sf100] [--k 20]
          [--out /tmp/q120_partial.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NAME = "q120_binomial_american"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf100")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--from-chunk", type=int, default=0,
                    help="first chunk index to run — lets two instances "
                    "split the remaining range into disjoint halves "
                    "(separate --out files, merged afterward)")
    ap.add_argument("--out", default="/tmp/q120_partial.jsonl")
    args = ap.parse_args()

    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (
        get_spark,
    )
    from tests.oracle_harness import (
        DUCK_DIGEST_CHUNKS,
        duck_connection,
        duck_digest,
        spark_digest,
    )

    col, k_total, table, src_col = DUCK_DIGEST_CHUNKS[NAME]
    spark = get_spark("q120-partial")
    con = duck_connection(args.sf_dir)
    sql = q.oracle_queries()[NAME]
    fn = q.spark_queries()[NAME]

    import re

    pat = re.compile(rf"FROM {table}\b")
    assert len(pat.findall(sql)) == 1

    # resume set: only chunks whose digest MATCHED may be skipped —
    # skipping a failed chunk and counting it matched would corrupt the
    # evidence artifact (r10 ADVICE); failed chunks re-run
    done = set()
    if os.path.exists(args.out):
        for line in open(args.out):
            try:
                rec = json.loads(line)
                if rec.get("ok") is True:
                    done.add(rec["chunk"])
            except (ValueError, KeyError):
                pass

    # ENGINE-side chunking must filter the SOURCE, not the output: the
    # chunked binomial pricer materializes its induction through internal
    # parquet spills, so an output-level pmod filter runs only AFTER all
    # 20M options were priced — measured r11: one "chunk" cost the full
    # run. q120 loads only `part`, and id == p_partkey, so a per-chunk
    # dir holding part filtered to p_partkey % k = i prices exactly the
    # chunk (the same partition the DuckDB side's source filter uses).
    import duckdb
    import hashlib

    # cache keyed by sf_dir digest (r11 ADVICE): a bare k{K}_c{i} key
    # reused a chunk built from a DIFFERENT sf_dir (or a parquet left
    # truncated by an interrupted COPY) and silently poisoned the
    # evidence comparison. The digest scopes the cache to one dataset;
    # the temp-file-then-rename write means only COMPLETE chunk files
    # are ever visible at the cached path.
    sf_key = hashlib.sha256(
        os.path.realpath(args.sf_dir).encode()).hexdigest()[:12]
    chunk_root = f"/tmp/q120_chunks/{sf_key}"
    os.makedirs(chunk_root, exist_ok=True)

    def chunk_dir(i: int) -> str:
        cdir = os.path.join(chunk_root, f"k{k_total}_c{i}")
        pq = os.path.join(cdir, f"{table}.parquet")
        if not os.path.exists(pq):
            os.makedirs(cdir, exist_ok=True)
            tmp = f"{pq}.tmp.{os.getpid()}"
            duckdb.connect().execute(
                f"COPY (SELECT * FROM "
                f"read_parquet('{args.sf_dir}/{table}.parquet') "
                f"WHERE ({src_col or col}) % {k_total} = {i}) "
                f"TO '{tmp}' (FORMAT PARQUET)")
            os.rename(tmp, pq)
        return cdir

    n_match = 0
    for i in range(args.from_chunk, args.k):
        if i in done:
            print(f"[skip-done] chunk {i}", flush=True)
            n_match += 1
            continue
        t0 = time.time()
        sd = spark_digest(fn(spark, chunk_dir(i)))
        t_spark = round(time.time() - t0, 1)
        src = (f"FROM (SELECT * FROM {table} "
               f"WHERE ({src_col or col}) % {k_total} = {i}) {table}")
        t0 = time.time()
        dd = duck_digest(con, pat.sub(src, sql))
        t_duck = round(time.time() - t0, 1)
        ok = sd == dd
        n_match += ok
        rec = {"chunk": i, "ok": ok, "spark": sd, "duck": dd,
               "spark_s": t_spark, "duck_s": t_duck}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{'PASS' if ok else 'FAIL'}] chunk {i}/{k_total}: "
              f"rows={sd[0]} spark {t_spark}s duck {t_duck}s", flush=True)
        if not ok:
            print(f"  spark={sd} duck={dd}", flush=True)
            return 1
    print(f"{n_match}/{args.k} chunks digest-matched "
          f"(of {k_total} total)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
