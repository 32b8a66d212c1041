"""Scale-pattern tests: the storage-layout techniques the 100TB deployment
relies on, demonstrated and asserted on local data.

- partitioned writes -> partition-pruned scans (PartitionFilters)
- bucketed tables -> shuffle-free co-located joins
- salted aggregation for skewed keys (same result, uniform partitions)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark import plans
from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (
    events_as_ticks,
    load_tables,
)

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_scan(spark, tmp_path):
    """Bars written partitionBy(symbol, date) must scan only the selected
    partition directories — the layout that replaces the reference's
    Postgres (symbol, ts) indexes at scale."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import bars

    ticks = events_as_ticks(load_tables(spark, SF, ["events"])["events"])
    b = bars.ticks_to_ohlcv(ticks, "1H").withColumn(
        "date", F.to_date("ts"))
    path = str(tmp_path / "bars")
    b.write.partitionBy("symbol", "date").parquet(path)

    back = spark.read.parquet(path).filter(
        (F.col("symbol") == "click") & (F.col("date") == "2024-01-02"))
    txt = plans.explain_str(back)
    assert "PartitionFilters" in txt
    assert "symbol" in txt.split("PartitionFilters")[1][:200]
    # only the matching partition's rows are read
    assert back.count() == b.filter(
        (F.col("symbol") == "click") & (F.to_date("ts") == "2024-01-02")
    ).count()


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed by the join key join WITHOUT an Exchange —
    the co-located-join strategy for repeated big-big joins (e.g. the
    signature table in iterative dedup runs)."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest "
              f"LOCATION '{tmp_path}/warehouse'")
    ticks = events_as_ticks(load_tables(spark, SF, ["events"])["events"])
    (ticks.write.bucketBy(8, "symbol").sortBy("symbol")
     .mode("overwrite").saveAsTable("bktest.ticks_bucketed"))
    agg = ticks.groupBy("symbol").agg(F.avg("price").alias("avg_price"))
    (agg.write.bucketBy(8, "symbol")
     .mode("overwrite").saveAsTable("bktest.stats_bucketed"))

    a = spark.table("bktest.ticks_bucketed")
    b = spark.table("bktest.stats_bucketed")
    joined = a.join(b, "symbol")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_shuffles = plans.count_shuffles(joined)
        assert n_shuffles == 0, plans.explain_str(joined, "simple")
        assert joined.count() == ticks.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_aggregation_equals_plain(spark):
    """operators/skew.py::salted_agg for a pathologically hot key gives the
    same answer as the direct aggregation (the manual fallback when AQE
    skew handling isn't enough — e.g. 90% of rows on one symbol)."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import skew

    pdf = pd.DataFrame({
        "symbol": ["HOT"] * 9000 + ["COLD"] * 1000,
        "v": np.arange(10000, dtype=float),
    })
    df = spark.createDataFrame(pdf).repartition(8)
    plain = {r.symbol: (r.n, r.s, r.m, r.a) for r in df.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
        F.max("v").alias("m"), F.avg("v").alias("a")).collect()}

    salted = skew.salted_agg(
        df, "symbol",
        {"n": ("count", "v"), "s": ("sum", "v"),
         "m": ("max", "v"), "a": ("avg", "v")},
        n_salt=16, salt_from=["v"],
    )
    got = {r.symbol: (r.n, r.s, r.m, r.a) for r in salted.collect()}
    assert got.keys() == plain.keys()
    for k in plain:
        assert got[k][0] == plain[k][0]
        assert got[k][1] == pytest.approx(plain[k][1], rel=1e-12)
        assert got[k][2] == plain[k][2]
        assert got[k][3] == pytest.approx(plain[k][3], rel=1e-12)


def test_salted_join_equals_plain(spark):
    """salted_join output == plain join output on a hot-key fact/dim pair,
    for inner and left (incl. unmatched fact keys)."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import skew

    fact = spark.createDataFrame(pd.DataFrame({
        "symbol": ["HOT"] * 900 + ["COLD"] * 90 + ["ORPHAN"] * 10,
        "v": np.arange(1000, dtype=float),
    })).repartition(8)
    dim = spark.createDataFrame(pd.DataFrame({
        "symbol": ["HOT", "HOT", "COLD"],
        "w": [1.0, 2.0, 3.0],
    }))
    for how in ("inner", "left"):
        plain = fact.join(dim, "symbol", how)
        salted = skew.salted_join(fact, dim, "symbol", n_salt=8, how=how)
        a = sorted(map(tuple, plain.collect()))
        b = sorted(map(tuple, salted.collect()))
        assert a == b, how


def test_aqe_coalesces_small_shuffles(spark):
    """AQE must be on and coalescing: a 32-partition shuffle over tiny data
    executes with fewer post-shuffle partitions."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    df.collect()
    # after execution AQE reports the final (coalesced) plan
    txt = plans.explain_str(df, "simple")
    assert "AdaptiveSparkPlan" in txt


def test_lsh_band_table_bucketed_rerun_joins_without_exchange(spark,
                                                             tmp_path):
    """The lsh_candidate_pairs docstring claim, exercised: persist the
    (doc, band, bh) band table ONCE bucketed by the join keys; a later
    dedup run re-opens it and the self-join plans with NO Exchange under
    the join — only the final pair aggregation shuffles."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        dedup,
    )

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS lshtest "
              f"LOCATION '{tmp_path}/warehouse'")
    docs = load_tables(spark, SF, ["documents"])["documents"]
    sigs = dedup.minhash_signatures(docs, num_hashes=8)
    bt = dedup.band_table(sigs, num_hashes=8, bands=4)
    (bt.write.bucketBy(8, "band", "bh").sortBy("band", "bh")
     .mode("overwrite").saveAsTable("lshtest.bands"))

    reopened = spark.table("lshtest.bands")
    pairs = dedup.lsh_pairs_from_bands(reopened)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # whole pipeline: exactly ONE shuffle (the doc_a/doc_b agg); the
        # band self-join runs on the bucket layout, exchange-free
        assert plans.count_shuffles(pairs) == 1, \
            plans.explain_str(pairs, "simple")
        # vs the in-memory path, which must shuffle both join inputs
        fresh = dedup.lsh_pairs_from_bands(bt)
        assert plans.count_shuffles(fresh) > 1
        # and the result is identical
        got = {(r.doc_a, r.doc_b, r.n_shared_bands)
               for r in pairs.collect()}
        want = {(r.doc_a, r.doc_b, r.n_shared_bands)
                for r in fresh.collect()}
        assert got == want and got
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_ivf_index_partitioned_store_prunes_probe_scan(spark, tmp_path):
    """The ivf_index docstring claim, exercised: persist the index
    partitionBy(cell); a probe query's scan shows PartitionFilters on
    cell and returns the same top-k as the in-memory index."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        similarity as sim,
    )

    emb = load_tables(spark, SF, ["embeddings"])["embeddings"]
    cents = sim.kmeans_fit(emb, k=4, iterations=3)
    idx = sim.ivf_index(emb, cents)
    path = str(tmp_path / "ivf_store")
    idx.write.partitionBy("cell").mode("overwrite").parquet(path)

    reopened = spark.read.parquet(path)
    qv = [float(x) for x in emb.first()["embedding"]]
    top = sim.ivf_topk(reopened, cents, qv, k=5, n_probe=2)
    txt = plans.explain_str(top, "formatted")
    assert "PartitionFilters" in txt
    seg = txt.split("PartitionFilters")[1][:200]
    assert "cell" in seg
    mem = [(r[0], round(r.cosine, 9)) for r in
           sim.ivf_topk(idx, cents, qv, k=5, n_probe=2).collect()]
    stored = [(r[0], round(r.cosine, 9)) for r in top.collect()]
    assert stored == mem


def test_estimated_scan_partitions_declines_post_shuffle_plans(spark):
    """r6 ADVICE: the inputFiles-based partition estimate describes the
    LEAF scan, so applying it to a frame that already crossed an exchange
    (aggregate/join/window upstream) could trigger a redundant
    repartition. Such plans must return None (caller then pays the
    accurate RDD count once); raw scans keep the cheap file estimate."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        skew,
    )

    docs = load_tables(spark, SF, ["documents"])["documents"]
    assert isinstance(skew._estimated_scan_partitions(docs), int)

    agg = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    assert skew._estimated_scan_partitions(agg) is None

    joined = docs.join(docs.select("doc_id"), "doc_id")
    assert skew._estimated_scan_partitions(joined) is None

    # ensure_parallelism on a post-shuffle frame that already has enough
    # partitions must be an identity (no Repartition node added)
    wide = (docs.repartition(spark.sparkContext.defaultParallelism,
                             "doc_id")
            .withColumn("n", F.length("text")))
    out = skew.ensure_parallelism(wide, "doc_id")
    n_repart = out._jdf.queryExecution().analyzed().toString().count(
        "RepartitionByExpression")
    n_before = wide._jdf.queryExecution().analyzed().toString().count(
        "RepartitionByExpression")
    assert n_repart == n_before
