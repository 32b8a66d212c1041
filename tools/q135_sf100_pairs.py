#!/usr/bin/env python3
"""sf100 hot-bucket evidence run (r10 VERDICT #4 done-condition).

The r10 chunked pair join left ONE engineering gap: a (band, bh) bucket
was pass-atomic, and sf100's hottest bucket (d=45,864 -> C(d,2)=1.05e9
pairs, ~100 GB live) alone exceeds any per-pass budget. r11 subdivides
hot buckets by xxhash64(doc_a) % m (operators/dedup.py). This tool
measures that machinery AT sf100 with exact constants:

1. build + spill the md5 band table (the pipeline's own first phase);
2. one map-combinable agg -> total pair multiplicity, the hot-bucket
   list for the box budget (d, pairs per bucket), and m;
3. run hot passes and cold passes (bounded counts via --hot/--cold, 0 =
   all), measuring wall + spilled partial bytes per pass.

Every number is appended as a JSONL record so SCALING.md cites measured
constants, not extrapolation.

Usage: python3 tools/q135_sf100_pairs.py [--sf-dir /tmp/sf100]
           [--hot N] [--cold N] [--out /tmp/q135_sf100_pairs.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf100")
    ap.add_argument("--hot", type=int, default=0,
                    help="hot passes to run (0 = all, -1 = skip)")
    ap.add_argument("--cold", type=int, default=2,
                    help="cold passes to run (0 = all, -1 = skip)")
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--wipe-partials", action="store_true",
                    help="delete each pass's partial files after "
                    "measuring them — the ledger's claim is PER-PASS "
                    "bytes under budget, and 64 accumulated cold passes "
                    "(~60 GB) would not fit the box's free disk")
    ap.add_argument("--out", default="/tmp/q135_sf100_pairs.jsonl")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        dedup,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (
        get_spark,
        load_tables,
    )

    def emit(rec):
        rec["ts"] = round(time.time(), 1)
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    spark = get_spark("q135-sf100-pairs")
    budget = dedup.box_scratch_budget(spark)
    hot_pair_budget = budget // 96  # queries._PAIR_JOIN_LIVE_B
    d = load_tables(spark, args.sf_dir, ["documents"])["documents"]

    t0 = time.time()
    bands = q._md5_band_table(d).withColumnRenamed("doc_id", "doc")
    banded = dedup.spill_frame(bands, "sf100bands")
    emit({"phase": "band_spill", "wall_s": round(time.time() - t0, 1)})

    t0 = time.time()
    stats = (banded.groupBy("band", "bh")
             .agg(F.count(F.lit(1)).alias("d"))
             # integer DIV like dedup._lsh_pairs_chunked (r11 ADVICE)
             .withColumn("bpairs",
                         F.expr("CAST(d AS BIGINT) * (d - 1) DIV 2")))
    tot = stats.agg(
        F.sum("bpairs").alias("m"),
        F.count(F.lit(1)).alias("buckets"),
        F.max(F.when(F.col("bpairs") <= hot_pair_budget,
                     F.col("bpairs"))).alias("cold_max")).first()
    hot = (stats.filter(F.col("bpairs") > hot_pair_budget)
           .orderBy(F.desc("bpairs")).collect())
    hot_mult = sum(r["bpairs"] for r in hot)
    m = max(2, -(-hot_mult // hot_pair_budget)) if hot else 0
    cold_salt = dedup._sized_pair_salt(int(tot["cold_max"] or 0))
    emit({"phase": "stats", "wall_s": round(time.time() - t0, 1),
          "total_mult": int(tot["m"] or 0), "n_buckets": int(tot["buckets"]),
          "budget_bytes": budget, "hot_pair_budget": hot_pair_budget,
          "n_hot_buckets": len(hot), "hot_mult": int(hot_mult),
          "hot_passes_m": int(m),
          "cold_max_bpairs": int(tot["cold_max"] or 0),
          "cold_salt": cold_salt,
          "hottest": [{"d": int(r["d"]), "pairs": int(r["bpairs"])}
                      for r in hot[:5]]})

    scratch = str(spark.conf.get("spark.local.dir", "/tmp")).split(",")[0]
    import uuid

    base = f"{scratch}/sg_sf100hot_{uuid.uuid4().hex[:8]}"
    os.makedirs(base, exist_ok=True)
    from build_a_market_data_etl_strategy_backtesting_engine_spark.functions.derivatives import (
        _register_spill_dir,
    )

    _register_spill_dir(base)

    hot_keys = F.broadcast(
        stats.filter(F.col("bpairs") > hot_pair_budget).select("band", "bh"))
    banded.join(hot_keys, ["band", "bh"], "left_semi").write.parquet(
        f"{base}/hot")
    banded.join(hot_keys, ["band", "bh"], "left_anti").write.parquet(
        f"{base}/cold")
    hot_r = spark.read.schema(banded.schema).parquet(f"{base}/hot")
    cold_r = spark.read.schema(banded.schema).parquet(f"{base}/cold")

    def pair_partial(a_side, b_side, salt):
        # mirrors dedup._lsh_pairs_chunked's salted pass join (r11): the
        # b-side doc-hash salt spreads one bucket's join output across
        # `salt` tasks — without it the hottest bucket's per-pass
        # 25M-pair partial agg OOM'd a 12g heap at hot pass 5. r12: the
        # cold salt is SIZED from the max cold bucket (dedup.
        # _sized_pair_salt), mirroring the engine's own passes.
        if salt <= 1:
            a, b_ = a_side.alias("a"), b_side.alias("b")
            salt_eq = F.lit(True)
        else:
            a = a_side.withColumn(
                "_ps", F.explode(F.sequence(F.lit(0),
                                            F.lit(salt - 1)))).alias("a")
            b_ = b_side.withColumn(
                "_ps", F.pmod(F.xxhash64("doc"),
                              F.lit(salt)).cast("int")).alias("b")
            salt_eq = F.col("a._ps") == F.col("b._ps")
        return (a.join(b_, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bh") == F.col("b.bh"))
                       & salt_eq
                       & (F.col("a.doc") < F.col("b.doc")))
                .groupBy(F.col("a.doc").alias("doc_a"),
                         F.col("b.doc").alias("doc_b"))
                .agg(F.count(F.lit(1)).alias("n_shared_bands")))

    import shutil

    def wipe():
        if args.wipe_partials and os.path.isdir(f"{base}/partial"):
            shutil.rmtree(f"{base}/partial")

    with dedup._no_auto_broadcast(spark):
        acls = F.pmod(F.xxhash64("doc"), F.lit(m or 1))
        n_hot = (0 if args.hot < 0
                 else m if args.hot == 0 else min(args.hot, m))
        for j in range(n_hot):
            t0 = time.time()
            before = _du(base)
            (pair_partial(hot_r.filter(acls == j), hot_r, dedup._PAIR_SALT)
             .write.mode("append").parquet(f"{base}/partial"))
            emit({"phase": "hot_pass", "j": j, "of": int(m),
                  "wall_s": round(time.time() - t0, 1),
                  "partial_bytes": _du(base) - before})
            wipe()

        ccls = F.pmod(F.xxhash64("band", "bh"), F.lit(args.chunks))
        n_cold = (0 if args.cold < 0
                  else args.chunks if args.cold == 0
                  else min(args.cold, args.chunks))
        for i in range(n_cold):
            t0 = time.time()
            before = _du(base)
            (pair_partial(cold_r.filter(ccls == i), cold_r.filter(ccls == i),
                          cold_salt)
             .write.mode("append").parquet(f"{base}/partial"))
            emit({"phase": "cold_pass", "i": i, "of": args.chunks,
                  "wall_s": round(time.time() - t0, 1),
                  "partial_bytes": _du(base) - before, "salt": cold_salt})
            wipe()

    emit({"phase": "done", "partial_total_bytes": _du(f"{base}/partial")})
    return 0


if __name__ == "__main__":
    sys.exit(main())
