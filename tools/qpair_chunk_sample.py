#!/usr/bin/env python3
"""Generic sampled per-chunk cross-engine digest runner (r12).

Converts "DuckDB-oracle-wall-excluded at sf100" pairs (SCALING.md
exclusion table: q23/q30/q127 of the q23/q30/q80/q93/q127 class) into
SAMPLED digest verification, the same evidence bar q120 met in r11/r12
(per-chunk (count, hashsum1, hashsum2) equality on source-partitioned
chunks, jsonl ledger, ok==true-only resume).

Chunk validity is per-query and documented in CONFIGS:

- q23_minhash_signatures: one output row per doc_id and every CTE is
  doc_id-local (shingle explode -> GROUP BY doc_id), so ANY partition of
  `documents` rows partitions the output exactly. Chunk key:
  doc_id % k (portable integer arithmetic).
- q127_mc_european: one output row per option id == p_partkey; each
  price depends only on that option's row and the (id, path)-keyed md5
  RNG. Chunk key: p_partkey % k. (Mirrors q120's
  DUCK_DIGEST_CHUNKS entry, reference backtesting/derivatives.py MC
  twin semantics.)
- q30_embedding_neardup: pairs require a.bucket = b.bucket (sign-LSH,
  8 seeded hyperplanes), so partitioning `embeddings` by a function of
  the bucket string never splits a pair. Chunk key:
  md5(bucket)[:6] % k, with the bucket string computed IN DuckDB for
  membership (COPY + source filter use the identical expression, so
  both engines see byte-identical chunk membership). Caveat recorded
  in each evidence row: summing chunk outputs reproduces each engine's
  monolithic output iff the two engines agree on every vector's bucket
  signs — established for this data family by the full-corpus digest
  PASSes at sf0.001/0.01/0.1 (tests/golden_hashes.json) and the sf10
  sweep, where any sign disagreement would have produced differing
  pair sets and failed the digest.

Both sides of a chunk see byte-identical membership by construction:
the engine reads a DuckDB-COPY'd per-chunk parquet dir (sf-dir-digest
keyed cache, temp-file-then-rename — r11 ADVICE), the oracle runs the
UNMODIFIED SQL with its single `FROM {table}` site source-filtered by
the same predicate (word-boundary regex, single-site asserted — the
r9-proven duck_digest_chunked form).

Run:  python3 tools/qpair_chunk_sample.py q23_minhash_signatures \
          [--sf-dir /tmp/sf100] [--chunks 0-15] [--out ...]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _q30_bucket_pred() -> str:
    """DuckDB chunk predicate for q30: md5 of the sign-LSH bucket string,
    rebuilt from the same plane literals the oracle SQL embeds (the
    module-level _BUCKET_SQL name is shadowed later in queries.py, so
    the expression is reconstructed from _PLANE_ARRS)."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )

    bucket = "concat(" + ", ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {arr})"
        f" > 0.0e0 THEN '1' ELSE '0' END)"
        for arr in q._PLANE_ARRS) + ")"
    return f"('0x' || substr(md5({bucket}), 1, 6))::BIGINT % {{k}} = {{i}}"


CONFIGS = {
    "q23_minhash_signatures": {
        "table": "documents", "k": 64,
        "pred": "doc_id % {k} = {i}",
        "validity": "per-doc output; all CTEs doc_id-local",
    },
    "q127_mc_european": {
        "table": "part", "k": 64,
        "pred": "p_partkey % {k} = {i}",
        "validity": "per-option output; id == p_partkey; (id,path) RNG",
    },
    "q30_embedding_neardup": {
        "table": "embeddings", "k": 64,
        "pred": _q30_bucket_pred,
        "validity": "pairs require equal sign-LSH bucket; chunk key = "
                    "md5(bucket) -- cross-engine bucket-sign agreement "
                    "established by full digests at sf<=10",
    },
}


def parse_chunks(spec: str, k: int) -> list[int]:
    out: list[int] = []
    for part in spec.split(","):
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        else:
            out.append(int(part))
    bad = [c for c in out if not 0 <= c < k]
    assert not bad, f"chunk ids out of range 0..{k - 1}: {bad}"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", choices=sorted(CONFIGS))
    ap.add_argument("--sf-dir", default="/tmp/sf100")
    ap.add_argument("--chunks", default="0-15",
                    help="chunk ids to run, e.g. '0-15' or '3,7,40-47'")
    ap.add_argument("--duck-temp-gb", type=int, default=40)
    ap.add_argument("--duck-memory-gb", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = CONFIGS[args.name]
    table, k = cfg["table"], cfg["k"]
    pred_t = cfg["pred"]() if callable(cfg["pred"]) else cfg["pred"]
    out_path = args.out or f"/tmp/{args.name}_chunks.jsonl"

    import duckdb
    from oracle_harness import duck_connection, duck_digest, spark_digest

    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (  # noqa: E501
        get_spark,
    )

    fn = q.spark_queries()[args.name]
    sql = q.oracle_queries()[args.name]
    pat = re.compile(rf"FROM {table}\b")
    assert len(pat.findall(sql)) == 1, (
        f"source-filtered oracle needs exactly one 'FROM {table}' site")

    def emit(rec):
        rec["ts"] = round(time.time(), 1)
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps({kk: vv for kk, vv in rec.items()
                          if kk != "validity"}), flush=True)

    # ok==true-only resume (r10 ADVICE: a failed chunk must re-run)
    done = set()
    if os.path.exists(out_path):
        for line in open(out_path):
            try:
                rec = json.loads(line)
                if rec.get("ok") is True and rec.get("k") == k:
                    done.add(rec["chunk"])
            except (ValueError, KeyError):
                pass

    sf_key = hashlib.sha256(
        os.path.realpath(args.sf_dir).encode()).hexdigest()[:12]
    chunk_root = f"/tmp/qpair_chunks/{args.name}/{sf_key}"
    os.makedirs(chunk_root, exist_ok=True)

    def chunk_dir(i: int) -> str:
        cdir = os.path.join(chunk_root, f"k{k}_c{i}")
        pq = os.path.join(cdir, f"{table}.parquet")
        if not os.path.exists(pq):
            os.makedirs(cdir, exist_ok=True)
            tmp = f"{pq}.tmp.{os.getpid()}"
            duckdb.connect().execute(
                f"COPY (SELECT * FROM "
                f"read_parquet('{args.sf_dir}/{table}.parquet') "
                f"WHERE {pred_t.format(k=k, i=i)}) "
                f"TO '{tmp}' (FORMAT PARQUET)")
            os.rename(tmp, pq)
        return cdir

    spark = get_spark(f"{args.name}-chunks")
    con = duck_connection(args.sf_dir)
    tmpdir = f"/tmp/duck_{args.name}_chunks_tmp"
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory='{tmpdir}'")
    con.execute(f"SET max_temp_directory_size='{args.duck_temp_gb}GiB'")
    con.execute("SET preserve_insertion_order=false")
    if args.duck_memory_gb:
        con.execute(f"SET memory_limit='{args.duck_memory_gb}GiB'")

    todo = [c for c in parse_chunks(args.chunks, k) if c not in done]
    if done:
        print(f"[resume] {len(done)} chunks already ok", flush=True)
    n_ok = len(done)
    for i in todo:
        t0 = time.time()
        sd = spark_digest(fn(spark, chunk_dir(i)))
        t_spark = round(time.time() - t0, 1)
        src = (f"FROM (SELECT * FROM {table} "
               f"WHERE {pred_t.format(k=k, i=i)}) {table}")
        t0 = time.time()
        try:
            dd = duck_digest(con, pat.sub(src, sql))
        except Exception as e:  # noqa: BLE001
            emit({"name": args.name, "chunk": i, "k": k, "ok": False,
                  "spark": sd, "duck": None, "spark_s": t_spark,
                  "duck_s": round(time.time() - t0, 1),
                  "duck_err": f"{type(e).__name__}: {e}"[:300]})
            continue
        t_duck = round(time.time() - t0, 1)
        ok = sd == dd
        n_ok += ok
        emit({"name": args.name, "chunk": i, "k": k, "ok": ok,
              "spark": sd, "duck": dd, "spark_s": t_spark,
              "duck_s": t_duck, "validity": cfg["validity"]})
        if not ok:
            return 1
    print(f"{n_ok}/{k} chunks digest-matched total", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
