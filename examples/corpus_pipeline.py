#!/usr/bin/env python3
"""End-to-end LLM training-data pipeline over the documents/embeddings tables:

  stratified hash-sample (per-language keep rates, map-side)
    -> curate (dedup -> quality/language filter -> token budgets)
    -> near-dup removal (MinHash + LSH banding, verified pairs)
    -> embedding ANN neighbors (sign-LSH buckets) for the survivors
    -> int8 quantization of surviving embeddings (storage path)
    -> token-budget packing into training shards
    -> per-language corpus budget summary

Every stage is a bucket-join / single-shuffle / map-side operator (no O(n²)
anywhere); the same code path runs at 100 TB with the layouts in SCALING.md.

Run:  python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark import get_spark
from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    corpus,
    dedup,
    sampling,
    similarity,
    text as text_ops,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (
    load_tables,
)


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("corpus-pipeline", shuffle_partitions=8)
    t = load_tables(spark, sf_dir, ["documents", "embeddings"])
    docs, emb = t["documents"], t["embeddings"]

    # 0. stratified keep-rates (the training-mix dial): deterministic
    #    hash sampling, retry-stable, zero shuffle
    sampled = sampling.stratified_sample(
        docs, "doc_id", "lang",
        {"en": 0.9, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 0.8})
    print(f"sampled: {sampled.count()} / {docs.count()} docs kept")

    # 1. curation: exact dedup -> annotate -> filter (one shuffle)
    curated = corpus.curate_corpus(
        sampled, min_tokens=10, min_alpha_ratio=0.5, langs=None
    ).cache()
    print(f"curated: {curated.count()} docs survive")

    # 2. near-dup removal: MinHash signatures -> LSH candidates -> verified
    #    pairs above threshold; drop the higher doc_id of each pair
    pairs = dedup.minhash_dedup(
        curated, num_hashes=16, bands=8, k=5, threshold=0.7)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    deduped = curated.join(drop, "doc_id", "left_anti").cache()
    print(f"near-dup removal: {deduped.count()} docs remain "
          f"({drop.count()} dropped)")

    # 3. ANN neighbors over the survivors' embeddings (sign-LSH buckets)
    surviving_emb = emb.join(
        deduped.select(F.col("doc_id").alias("vec_id")), "vec_id")
    neighbors = dedup.embedding_near_dups(
        surviving_emb, n_planes=8, threshold=0.9, id_col="vec_id")
    print(f"high-cosine neighbor pairs among survivors: {neighbors.count()}")

    # 4. int8 storage path for surviving embeddings (4x smaller index)
    quant = similarity.quantize_embeddings(surviving_emb)
    q_err = quant.agg(F.max("max_abs_err").alias("worst")).collect()[0].worst
    print(f"quantized {quant.count()} embeddings, "
          f"worst reconstruction err {q_err:.5f}")

    # 5. pack survivors into 2048-token training shards (per-hash shard
    #    at scale: pass shard_col; global order is fine at example SF)
    packed = sampling.pack_token_budget(
        deduped.select(
            "doc_id", text_ops.token_count("text").alias("n_tok")),
        "n_tok", "doc_id", 2048)
    n_bins = packed.agg(F.count_distinct("bin")).collect()[0][0]
    print(f"packed into {n_bins} training shards of <=2048 tokens")

    # 6. per-language corpus budget (the training-mix numbers)
    print("\nper-language budgets:")
    for r in corpus.curation_summary(deduped).orderBy("pred_lang").collect():
        print(f"  {r.pred_lang:8s} docs={r.n_docs:6d} "
              f"tokens={r.sum_tokens:9d} bpe={r.sum_bpe_tokens:9d}")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
