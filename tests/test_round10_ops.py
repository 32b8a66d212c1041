"""Round-10 operators: hot-symbol sharding for the merge as-of path.

SCALING.md r9 measured the merge's single-hot-symbol ceiling (~217k
union rows/s on one task vs ~530k at 20 symbols) and told users to
"salt by feed-shard and re-merge"; r9 VERDICT #5 asks for that as a
tested operator. shard_hot_symbols replicates trades across n shards
and hash-splits quotes; elect_sharded collapses replicas with the
merge's own election order (latest q_ts, then lexicographic (bid, ask));
asof_enrich_sharded composes them. Parity pins: sharded == unsharded
merge == interval join in batch, and stream == batch through the
chained stateful plan (applyInPandasWithState -> watermark -> max_by).
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming import (
    joins as sjoins,
)


def _frames(n_trades=30, n_quotes=500, symbols=("A", "B")):
    """Trades every 60s; quotes every 4s with a >tolerance dead zone in
    [600s, 900s] (null pass-through) and an equal-ts duplicate every 7th
    quote (the (bid, ask) tie-break)."""
    t0 = pd.Timestamp("2024-01-01")
    trows, qrows = [], []
    for sym in symbols:
        for i in range(n_trades):
            trows.append({
                "ts": t0 + pd.Timedelta(seconds=60 * i), "symbol": sym,
                "seq": i, "price": 100.0 + i, "volume": 10.0,
            })
        for i in range(n_quotes):
            if 600 <= i * 4 <= 900:
                continue
            q_ts = t0 + pd.Timedelta(seconds=4 * i)
            px = 100 + (i % 11) * 0.01
            qrows.append({"ts": q_ts, "symbol": sym,
                          "bid": round(px - 0.01, 4),
                          "ask": round(px + 0.01, 4)})
            if i % 7 == 0:
                qrows.append({"ts": q_ts, "symbol": sym,
                              "bid": round(px - 0.02, 4),
                              "ask": round(px + 0.03, 4)})
    return pd.DataFrame(trows), pd.DataFrame(qrows)


def _sorted(df):
    return (df.toPandas().sort_values(["symbol", "seq"])
            .reset_index(drop=True))


def test_sharded_matches_unsharded_batch(spark):
    tpdf, qpdf = _frames()
    T, Q = spark.createDataFrame(tpdf), spark.createDataFrame(qpdf)
    base = _sorted(sjoins.streaming_asof_enrich(T, Q,
                                                tolerance="3 minutes"))
    assert base["bid"].isna().sum() > 0  # dead zone exercised the nulls
    for n in (1, 3, 4):
        got = _sorted(sjoins.asof_enrich_sharded(T, Q, n,
                                                 tolerance="3 minutes"))
        pd.testing.assert_frame_equal(
            base, got[base.columns.tolist()].astype(
                base.dtypes.to_dict()))
    # interval-join variant agrees too (transitively pins the election)
    join = _sorted(sjoins.streaming_quote_enrich(T, Q,
                                                 tolerance="3 minutes"))
    pd.testing.assert_frame_equal(
        base, join[base.columns.tolist()].astype(base.dtypes.to_dict()))


def test_sharded_hot_symbols_list_limits_fanout(spark):
    tpdf, qpdf = _frames()
    T, Q = spark.createDataFrame(tpdf), spark.createDataFrame(qpdf)
    t2, q2 = sjoins.shard_hot_symbols(T, Q, 4, hot_symbols=["A"])
    # only the hot symbol's trades are replicated
    counts = {r["s"]: r["n"] for r in t2.select(
        F.split_part("symbol", F.lit(sjoins.HOT_SHARD_SEP),
                     F.lit(1)).alias("s")).groupBy("s").agg(
        F.count("*").alias("n")).collect()}
    n_t = len(tpdf) // 2
    assert counts == {"A": 4 * n_t, "B": n_t}
    # quotes are split, never replicated; cold symbols all on shard 0
    assert q2.count() == len(qpdf)
    shards = {r["symbol"].split(sjoins.HOT_SHARD_SEP)[1]
              for r in q2.filter(
                  F.col("symbol").startswith("B")).collect()}
    assert shards == {"0"}
    a_shards = {r["symbol"].split(sjoins.HOT_SHARD_SEP)[1]
                for r in q2.filter(
                    F.col("symbol").startswith("A")).collect()}
    assert len(a_shards) > 1  # the hot symbol actually spread
    # end-to-end parity with the selective list
    base = _sorted(sjoins.streaming_asof_enrich(T, Q,
                                                tolerance="3 minutes"))
    got = _sorted(sjoins.asof_enrich_sharded(T, Q, 4, hot_symbols=["A"],
                                             tolerance="3 minutes"))
    pd.testing.assert_frame_equal(
        base, got[base.columns.tolist()].astype(base.dtypes.to_dict()))


def test_sharded_rejects_bad_shard_count(spark):
    tpdf, qpdf = _frames(n_trades=2, n_quotes=4)
    T, Q = spark.createDataFrame(tpdf), spark.createDataFrame(qpdf)
    with pytest.raises(ValueError, match="n_shards"):
        sjoins.shard_hot_symbols(T, Q, 0)


def test_sharded_stream_equals_batch(spark, tmp_path):
    """The chained stateful plan (per-shard applyInPandasWithState ->
    withWatermark -> grouped max_by election) in append mode: the
    election row for a trade emits once the watermark passes its ts, so
    the fixture appends a far-future sentinel batch to flush the tail."""
    tpdf, qpdf = _frames(symbols=("A",))
    t0 = pd.Timestamp("2024-01-01")
    td, qd = tmp_path / "t", tmp_path / "q"
    td.mkdir(), qd.mkdir()
    cuts = [0, 600, 1200, 1800, 10 ** 9]
    iso_t = tpdf.assign(ts=tpdf.ts.map(pd.Timestamp.isoformat))
    iso_q = qpdf.assign(ts=qpdf.ts.map(pd.Timestamp.isoformat))
    for k in range(4):
        lo = t0 + pd.Timedelta(seconds=cuts[k])
        hi = t0 + pd.Timedelta(seconds=cuts[k + 1])
        iso_t[(tpdf.ts >= lo) & (tpdf.ts < hi)].to_json(
            td / f"b{k}.json", orient="records", lines=True)
        iso_q[(qpdf.ts >= lo) & (qpdf.ts < hi)].to_json(
            qd / f"b{k}.json", orient="records", lines=True)
    far = (t0 + pd.Timedelta(days=2)).isoformat()
    pd.DataFrame([{"ts": far, "symbol": "ZZZ", "seq": 10 ** 9,
                   "price": 1.0, "volume": 1.0}]).to_json(
        td / "b9.json", orient="records", lines=True)
    pd.DataFrame([{"ts": far, "symbol": "ZZZ", "bid": 1.0,
                   "ask": 2.0}]).to_json(
        qd / "b9.json", orient="records", lines=True)
    from tests.test_streaming import _stamp_dir
    _stamp_dir(td)
    _stamp_dir(qd)

    st = (spark.readStream.format("json")
          .schema("ts timestamp, symbol string, seq long, price double, "
                  "volume double")
          .option("maxFilesPerTrigger", 1).load(str(td)))
    sq = (spark.readStream.format("json")
          .schema("ts timestamp, symbol string, bid double, ask double")
          .option("maxFilesPerTrigger", 1).load(str(qd)))
    out = sjoins.asof_enrich_sharded(
        st, sq, 3, tolerance="3 minutes", hot_symbols=["A"],
        watermark="5 seconds")
    q = (out.writeStream.format("memory").queryName("sharded_r10")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = (spark.sql("SELECT * FROM sharded_r10 WHERE symbol <> 'ZZZ'")
           .toPandas().sort_values(["symbol", "seq"])
           .reset_index(drop=True))
    T = spark.createDataFrame(tpdf)
    Q = spark.createDataFrame(qpdf)
    base = _sorted(sjoins.streaming_asof_enrich(T, Q,
                                                tolerance="3 minutes"))
    assert len(got) == len(base) == 30
    pd.testing.assert_frame_equal(got.astype(base.dtypes.to_dict()),
                                  base)
    assert got["bid"].isna().sum() > 0


# ---------------------------------------------------------------- DSIR


def _dsir_corpora(spark):
    """Target domain: 'alpha beta gamma' style docs. Raw pool: half
    target-like, half off-domain noise."""
    target = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta") for i in range(10)],
        "doc_id long, text string")
    raw_rows = []
    for i in range(20):
        if i < 10:
            raw_rows.append((100 + i, "alpha beta gamma beta alpha"))
        else:
            raw_rows.append((100 + i, f"zeta eta theta iota kappa{i}"))
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    return raw, target


def test_dsir_weights_rank_target_like_docs_higher(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw, target = _dsir_corpora(spark)
    w = {r["doc_id"]: r["logw"]
         for r in dsir_importance_weights(raw, target,
                                          n_buckets=256).collect()}
    assert len(w) == 20
    like = [w[100 + i] for i in range(10)]
    noise = [w[110 + i] for i in range(10)]
    assert min(like) > max(noise)


def test_dsir_logratio_zero_when_target_equals_raw(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators.sampling import (
        dsir_bucket_logratios,
    )

    df = spark.createDataFrame(
        [(i, "one two three four") for i in range(8)],
        "doc_id long, text string")
    lrs = dsir_bucket_logratios(df, df, n_buckets=64)
    rows = lrs.collect()
    assert len(rows) == 64  # full bucket domain, zero-count rows included
    assert all(r["lr_x1e6"] == 0 for r in rows)


def test_dsir_resample_is_deterministic_and_weighted(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators.sampling import (
        dsir_resample,
    )

    raw, target = _dsir_corpora(spark)
    a = [r["doc_id"] for r in dsir_resample(raw, target, k=5,
                                            n_buckets=256).collect()]
    b = [r["doc_id"] for r in dsir_resample(raw, target, k=5,
                                            n_buckets=256).collect()]
    assert a == b and len(a) == 5
    # a different seed redraws the Gumbel noise
    c = [r["doc_id"] for r in dsir_resample(raw, target, k=5,
                                            n_buckets=256,
                                            seed=99).collect()]
    assert len(c) == 5
    # heavy importance weights dominate the draw: most picks target-like
    assert sum(1 for d in a if d < 110) >= 4
