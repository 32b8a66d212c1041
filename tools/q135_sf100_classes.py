#!/usr/bin/env python3
"""q135 per-source-class cross-engine digest sampling (r11 VERDICT #1).

q135's sf100 claim rested on engine-only evidence (the pair-stage ledger).
The view-shadow oracle proven at sf10 partitions `documents` by
``hash(source) % K`` — validity: q135's edges require a.source = b.source,
so clusters never span sources and the output restricted to a class is
exactly the monolithic output's class rows. This tool applies the q120
pattern per CLASS: both engines run the full q135 pipeline on the same
class and the (count, hashsum1, hashsum2) tuples are compared.

Phase 1 (always, committed either way): measured per-class constants —
docs, chars, and the EXACT per-class band-pair multiplicity (sum of
C(d,2) over the class-filtered corpus's (band, bh) buckets). That
multiplicity bounds BOTH engines' scratch: the engine's chunked pair
passes (~96 B live/pair) and DuckDB's shadow-pass hash join + DISTINCT
(measured ~260-430 B of temp per pair at sf10, where the monolithic
oracle died >60 GB at ~2.3e8 pairs). Whether a class is verifiable on
this box is decided by MEASUREMENT, not hope.

Phase 2 (classes in ascending multiplicity order): every class whose
mult is under ``--duck-max-pairs`` runs cross-engine — the engine side
chunk-forced on a DuckDB-COPY'd class dir (the same predicate, so both
sides see byte-identical membership), the DuckDB side the UNMODIFIED
oracle SQL through a one-class temp-view shadow with a hard
``max_temp_directory_size`` so an over-estimate errors instead of
filling the disk.

Usage: python3 tools/q135_sf100_classes.py [--sf-dir /tmp/sf100]
           [--classes 16] [--duck-max-pairs 150000000]
           [--duck-temp-gb 45] [--max-run N] [--stats-only]
           [--out /tmp/q135_classes.jsonl]
"""
from __future__ import annotations

import argparse
import hashlib
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
    ap.add_argument("--sf-dir", default="/tmp/sf100")
    ap.add_argument("--classes", type=int, default=16,
                    help="K of hash(source) %% K — matches the sf10 "
                    "view-shadow config")
    ap.add_argument("--duck-max-pairs", type=int, default=150_000_000,
                    help="max per-class band-pair multiplicity to "
                    "attempt the DuckDB side (measured ~260-430 B "
                    "temp/pair at sf10)")
    ap.add_argument("--duck-temp-gb", type=int, default=45)
    ap.add_argument("--duck-memory-gb", type=int, default=0,
                    help="explicit DuckDB memory_limit (GiB); 0 = "
                    "DuckDB's default 80%% of RAM. Class 8's first "
                    "attempt offloaded 50 GiB to temp and died on the "
                    "temp cap while ~60 GiB of RAM sat free — pin the "
                    "limit to the box's actual free RAM so the working "
                    "set stays resident and temp only takes overflow")
    ap.add_argument("--max-run", type=int, default=0,
                    help="max classes to digest-run (0 = all feasible)")
    ap.add_argument("--engine-chunks", type=int, default=0,
                    help="force SPARK_GRAFT_CAND_CHUNKS for the engine "
                    "side (0 = auto-size from the class's pair mult; "
                    "the auto floor of 2 under-chunked a 225M-pair "
                    "class into 12g-heap OOM — pass 8+ when sharing "
                    "the box)")
    ap.add_argument("--stats-only", action="store_true")
    ap.add_argument("--out", default="/tmp/q135_classes.jsonl")
    args = ap.parse_args()

    import duckdb
    from oracle_harness import duck_connection, duck_digest, spark_digest
    from pyspark.sql import functions as F

    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (  # noqa: E501
        dedup,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (  # noqa: E501
        get_spark,
        load_tables,
    )

    K = args.classes

    def emit(rec):
        rec["ts"] = round(time.time(), 1)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    # ---- phase 1: per-class constants ------------------------------
    # the class partition is DuckDB's hash(source) % K (the shadow's
    # own expression); Spark can't reproduce duckdb's hash, so the 20
    # (source -> class) rows come FROM duckdb and ride into Spark as a
    # broadcast map — both sides then mean the same class by 'c'
    con0 = duckdb.connect()
    src_cls = con0.execute(
        f"SELECT source, CAST(hash(source) % {K} AS BIGINT) AS c "
        f"FROM (SELECT DISTINCT source FROM "
        f"read_parquet('{args.sf_dir}/documents.parquet'))").fetchall()
    con0.close()
    cls_of = {s: int(c) for s, c in src_cls}

    # resume: if THIS out file already holds a completed phase-1 for the
    # same K, reuse the measured per-class stats instead of re-building
    # the sf100 band table (~15 min) just to re-derive known constants
    cached: dict[int, dict] = {}
    if os.path.exists(args.out):
        # keep the last COMPLETE (class_map .. stats_done) block for this
        # K; phase-2-only resumes append a bare class_map with no stats
        # after it, which must not invalidate an earlier complete block
        same_k, cur = False, {}
        for line in open(args.out):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("phase") == "class_map":
                same_k = rec.get("k") == K
                cur = {}
            elif rec.get("phase") == "class_stats" and same_k:
                cur[int(rec["c"])] = {
                    "mult": int(rec["mult"]),
                    "n_docs": int(rec.get("n_docs", 0)),
                    "sum_chars": int(rec.get("sum_chars", 0))}
            elif rec.get("phase") == "stats_done" and same_k and cur:
                cached = dict(cur)

    emit({"phase": "class_map", "k": K, "n_sources": len(cls_of),
          "classes_used": sorted(set(cls_of.values())),
          "stats_cached": bool(cached)})

    spark = get_spark("q135-classes")
    budget = dedup.box_scratch_budget(spark)

    if cached:
        stats = cached
    else:
        d = load_tables(spark, args.sf_dir, ["documents"])["documents"]
        t0 = time.time()
        bands = q._md5_band_table(d)
        cls_expr = F.coalesce(*(
            [F.when(F.col("source") == s, F.lit(c))
             for s, c in cls_of.items()]
            + [F.lit(-1)]))
        doc_cls = d.select("doc_id", cls_expr.alias("c"),
                           F.col("n_chars"))
        per_cls = (
            bands.join(doc_cls.select("doc_id", "c"), "doc_id")
            .groupBy("band", "bh", "c")
            .agg(F.count(F.lit(1)).alias("d"))
            .groupBy("c")
            .agg(F.sum(F.expr("CAST(d AS BIGINT) * (d - 1) DIV 2"))
                 .alias("mult"))
        )
        docs_cls = doc_cls.groupBy("c").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"))
        stats = {int(r["c"]): {"mult": int(r["mult"] or 0)}
                 for r in per_cls.collect()}
        for r in docs_cls.collect():
            stats.setdefault(int(r["c"]), {"mult": 0}).update(
                n_docs=int(r["n_docs"]), sum_chars=int(r["sum_chars"]))
        wall = round(time.time() - t0, 1)
        for c in sorted(stats):
            s = stats[c]
            emit({"phase": "class_stats", "c": c, "mult": s["mult"],
                  "n_docs": s.get("n_docs", 0),
                  "sum_chars": s.get("sum_chars", 0),
                  "duck_feasible": s["mult"] <= args.duck_max_pairs})
        emit({"phase": "stats_done", "wall_s": wall,
              "total_mult": sum(s["mult"] for s in stats.values()),
              "budget_bytes": budget,
              "duck_max_pairs": args.duck_max_pairs,
              "n_feasible": sum(1 for s in stats.values()
                                if s["mult"] <= args.duck_max_pairs)})
    if args.stats_only:
        return 0

    # ---- phase 2: per-class cross-engine digests -------------------
    fn = q.spark_queries()[NAME]
    sql = q.oracle_queries()[NAME]

    done = set()
    engine_done: dict[int, dict] = {}
    if os.path.exists(args.out):
        for line in open(args.out):
            try:
                rec = json.loads(line)
                if rec.get("phase") != "class_digest":
                    continue
                if rec.get("ok"):
                    done.add(rec["c"])
                elif rec.get("spark") and rec.get("duck") is None:
                    # engine side completed, oracle side aborted (temp/
                    # memory): reuse the recorded engine digest on retry
                    # instead of re-running hours of Spark
                    engine_done[rec["c"]] = rec
            except (ValueError, KeyError):
                pass

    sf_key = hashlib.sha256(
        os.path.realpath(args.sf_dir).encode()).hexdigest()[:12]
    class_root = f"/tmp/q135_classes/{sf_key}/k{K}"
    os.makedirs(class_root, exist_ok=True)

    def class_dir(c: int) -> str:
        cdir = os.path.join(class_root, f"c{c}")
        pq = os.path.join(cdir, "documents.parquet")
        if not os.path.exists(pq):
            os.makedirs(cdir, exist_ok=True)
            tmp = f"{pq}.tmp.{os.getpid()}"
            duckdb.connect().execute(
                f"COPY (SELECT * FROM "
                f"read_parquet('{args.sf_dir}/documents.parquet') "
                f"WHERE hash(source) % {K} = {c}) "
                f"TO '{tmp}' (FORMAT PARQUET)")
            os.rename(tmp, pq)
        return cdir

    con = duck_connection(args.sf_dir)
    tmpdir = "/tmp/duck_q135_classes_tmp"
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory='{tmpdir}'")
    con.execute(f"SET max_temp_directory_size='{args.duck_temp_gb}GiB'")
    # the digest is (count, sum(h1), sum(h2)) — order-free — so DuckDB
    # may stream/reorder freely; preserving insertion order forces
    # buffering that multiplies temp on the pair join + DISTINCT
    con.execute("SET preserve_insertion_order=false")
    if args.duck_memory_gb:
        con.execute(f"SET memory_limit='{args.duck_memory_gb}GiB'")
    cat = con.execute("SELECT current_catalog()").fetchone()[0]

    todo = [c for c in sorted(stats, key=lambda c: stats[c]["mult"])
            if stats[c]["mult"] <= args.duck_max_pairs and c not in done]
    if args.max_run:
        todo = todo[:args.max_run]
    n_ok = len(done)
    for c in todo:
        mult = stats[c]["mult"]
        # force the engine's chunked pipeline with passes auto-sized
        # from THIS class's exact multiplicity (the class dirs hold
        # ~1/K of the docs, under the auto-dispatch threshold, but the
        # pair mass is what needs chunking)
        if c in engine_done:
            prev = engine_done[c]
            sd = tuple(prev["spark"])
            k_c = prev.get("engine_chunks")
            t_spark = prev.get("spark_s")
            print(f"[reuse] class {c}: engine digest from prior record "
                  f"({t_spark}s, chunks={k_c})", flush=True)
        else:
            k_c = (args.engine_chunks or
                   min(64,
                       max(2, -(-(mult * q._PAIR_JOIN_LIVE_B) // budget))))
            os.environ["SPARK_GRAFT_CAND_CHUNKS"] = str(k_c)
            t0 = time.time()
            try:
                sd = spark_digest(fn(spark, class_dir(c)))
            finally:
                os.environ.pop("SPARK_GRAFT_CAND_CHUNKS", None)
            t_spark = round(time.time() - t0, 1)
        con.execute(
            f"CREATE OR REPLACE TEMP VIEW documents AS "
            f"SELECT * FROM {cat}.main.documents "
            f"WHERE hash(source) % {K} = {c}")
        t0 = time.time()
        try:
            dd = duck_digest(con, sql)
        except Exception as e:  # noqa: BLE001
            # a temp-limit (or OOM) abort on ONE class must not kill the
            # run — the class is recorded as oracle-infeasible on this
            # box (the engine side DID complete: sd is evidence of that)
            # and the sweep moves to the next class. A real DIGEST
            # MISMATCH below still aborts the run.
            t_duck = round(time.time() - t0, 1)
            emit({"phase": "class_digest", "c": c, "mult": mult,
                  "n_docs": stats[c].get("n_docs", 0), "ok": False,
                  "spark": sd, "duck": None, "engine_chunks": k_c,
                  "spark_s": t_spark, "duck_s": t_duck,
                  "duck_err": f"{type(e).__name__}: {e}"[:300]})
            continue
        finally:
            con.execute("DROP VIEW IF EXISTS temp.documents")
        t_duck = round(time.time() - t0, 1)
        ok = sd == dd
        n_ok += ok
        emit({"phase": "class_digest", "c": c, "mult": mult,
              "n_docs": stats[c].get("n_docs", 0), "ok": ok,
              "spark": sd, "duck": dd, "engine_chunks": k_c,
              "spark_s": t_spark, "duck_s": t_duck})
        if not ok:
            return 1
    emit({"phase": "run_done", "classes_verified": n_ok,
          "classes_total": K})
    return 0


if __name__ == "__main__":
    sys.exit(main())
