"""Unit tests for operators/sampling.py and the tf-idf / redaction text ops."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    sampling,
    text as text_ops,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i % 7} common w{i % 3} tail{i}",
             lang=["en", "de", "fr"][i % 3]) for i in range(300)]
    )


def test_deterministic_sample_stable_and_rate(spark, docs):
    a = sampling.deterministic_sample(docs, "doc_id", 0.3)
    b = sampling.deterministic_sample(docs.repartition(7), "doc_id", 0.3)
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b  # partitioning-invariant membership
    assert 0.15 < len(ids_a) / 300 < 0.45  # rate in the right ballpark
    # subset property: lower rate selects a subset of a higher rate
    small = {r.doc_id for r in
             sampling.deterministic_sample(docs, "doc_id", 0.1).collect()}
    assert small <= set(ids_a)


def test_portable_bucket_matches_duckdb(spark, docs):
    import duckdb

    got = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id", sampling.portable_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    sql = sampling.portable_bucket_sql("i")
    want = dict(
        duckdb.connect().execute(
            f"SELECT i, {sql} FROM range(300) t(i)"
        ).fetchall()
    )
    assert got == want


def test_stratified_sample_rates(spark, docs):
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_rate=0.5
    ).groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in out}
    assert counts["en"] == 100  # rate 1.0 keeps every en doc
    assert "de" not in counts  # rate 0.0 drops all de docs
    assert 20 < counts.get("fr", 0) < 80  # default rate applies to fr


def test_pack_token_budget_invariants(spark, docs):
    d = docs.select("doc_id", text_ops.token_count("text").alias("n_tok"))
    packed = sampling.pack_token_budget(d, "n_tok", "doc_id", 50)
    rows = sorted(packed.collect(), key=lambda r: r.doc_id)
    # conservation: every doc lands in exactly one bin
    assert len(rows) == 300
    # bins are contiguous in doc order and each starts below the budget
    start = 0
    for r in rows:
        assert r.bin == start // 50
        start += r.n_tok
    # sharded mode: window partitions by shard, bin keys are shard-scoped
    sharded = sampling.pack_token_budget(
        d.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(4))),
        "n_tok", "doc_id", 50, shard_col="shard",
    )
    assert sharded.filter(~F.col("bin").contains("#")).count() == 0


def test_tfidf_hand_case(spark):
    d = spark.createDataFrame([
        Row(doc_id=0, text="apple banana apple"),
        Row(doc_id=1, text="banana cherry"),
    ])
    out = {(r.doc_id, r.term): r.tfidf
           for r in text_ops.tfidf_top_terms(d, k=3).collect()}
    # apple: tf 2/3 in doc0, df=1 of 2 docs -> (2/3)*ln(2)
    assert out[(0, "apple")] == pytest.approx((2 / 3) * math.log(2), abs=1e-7)
    # banana appears in both docs -> idf ln(1) = 0
    assert out[(0, "banana")] == 0.0
    assert out[(1, "cherry")] == pytest.approx(0.5 * math.log(2), abs=1e-7)


def test_redact_pii_counts_and_text(spark):
    d = spark.createDataFrame([
        Row(doc_id=0, text="mail a@b.com and c.d@e.org, call 555-1234"),
        Row(doc_id=1, text="nothing here"),
    ])
    rows = {r.doc_id: r for r in text_ops.redact_pii(d).collect()}
    assert (rows[0].n_email, rows[0].n_phone) == (2, 1)
    assert rows[0].redacted == "mail [EMAIL] and [EMAIL], call [PHONE]"
    assert (rows[1].n_email, rows[1].n_phone) == (0, 0)
    assert rows[1].redacted == "nothing here"


def test_quantize_embeddings_roundtrip(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        similarity,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark import plans

    d = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, -0.5, 0.25]),
         Row(vec_id=1, embedding=[0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<float>")
    out = similarity.quantize_embeddings(d)
    rows = {r.vec_id: r for r in out.collect()}
    # absmax maps the largest-|x| element to +/-127 exactly
    assert rows[0].q_vec == [127, -64, 32]
    assert rows[0].q_scale == pytest.approx(1.0 / 127, rel=1e-12)
    # reconstruction error bounded by scale/2 (round-to-nearest)
    assert rows[0].max_abs_err <= rows[0].q_scale / 2 + 1e-12
    # zero vector: scale 0, all-zero codes, zero error (no div-by-zero)
    assert rows[1].q_scale == 0.0
    assert rows[1].q_vec == [0, 0, 0]
    assert rows[1].max_abs_err == 0.0
    # map-side only: no exchange in the plan
    assert plans.count_shuffles(out) == 0


def test_unigram_logprob_hand_case(spark):
    d = spark.createDataFrame([
        Row(doc_id=0, text="a a b"),
        Row(doc_id=1, text="b"),
    ])
    # corpus: a:2, b:2, total 4 -> p(a)=p(b)=0.5
    rows = {r.doc_id: r for r in text_ops.unigram_logprob(d).collect()}
    assert rows[0].avg_logprob == pytest.approx(math.log(0.5), abs=1e-6)
    assert rows[0].n_tok == 3
    assert rows[1].avg_logprob == pytest.approx(math.log(0.5), abs=1e-6)
    # a rare token scores lower than common ones
    d2 = d.union(spark.createDataFrame([Row(doc_id=2, text="rare")]))
    r2 = {r.doc_id: r for r in text_ops.unigram_logprob(d2).collect()}
    assert r2[2].avg_logprob < r2[0].avg_logprob


def test_connected_components_chain_and_invariance(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import dedup

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (4, 5)], "doc_a bigint, doc_b bigint")
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 6, 9)], "doc_id bigint")
    out = {r.doc_id: r.cluster
           for r in dedup.connected_components(edges, nodes).collect()}
    # chain 1-2-3-9 closes transitively; 4-5 separate; 6 singleton
    assert out == {1: 1, 2: 1, 3: 1, 9: 1, 4: 4, 5: 4, 6: 6}
    # partition invariance: same fixpoint under a different layout
    out2 = {r.doc_id: r.cluster
            for r in dedup.connected_components(
                edges.repartition(5), nodes.repartition(3)).collect()}
    assert out2 == out
    # nodes=None derives the node set from the edges (no singletons)
    out3 = {r.doc_id: r.cluster
            for r in dedup.connected_components(edges).collect()}
    assert out3 == {1: 1, 2: 1, 3: 1, 9: 1, 4: 4, 5: 4}


def test_stratified_fixed_n_two_phase_equals_naive(spark, docs):
    # two-phase top-n must equal the naive single-window formulation
    from pyspark.sql import Window

    got = sampling.stratified_fixed_n(docs, "doc_id", "lang", 7)
    b = sampling.hash_bucket(F.col("doc_id"))
    w = Window.partitionBy("lang").orderBy(b, "doc_id")
    want = (docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 7).drop("rn"))
    assert ({(r.doc_id, r.lang) for r in got.collect()}
            == {(r.doc_id, r.lang) for r in want.collect()})
    # exactly 7 per stratum, deterministic across repartitioning
    counts = {r.lang: r["count"]
              for r in got.groupBy("lang").count().collect()}
    assert set(counts.values()) == {7}
    again = sampling.stratified_fixed_n(
        docs.repartition(11), "doc_id", "lang", 7)
    assert ({r.doc_id for r in got.collect()}
            == {r.doc_id for r in again.collect()})


def test_repetition_features_hand_case(spark):
    d = spark.createDataFrame([
        Row(doc_id=0, text="a a a a"),        # fully repeated
        Row(doc_id=1, text="a b c d"),        # all distinct
        Row(doc_id=2, text="x"),              # single token edge
    ])
    rows = {r.doc_id: r
            for r in text_ops.repetition_features(d).collect()}
    assert rows[0].dup_token_frac == 0.75      # 1 - 1/4
    assert rows[0].dup_2gram_frac == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert rows[0].top_token_frac == 1.0
    assert rows[1].dup_token_frac == 0.0
    assert rows[1].dup_2gram_frac == 0.0
    assert rows[1].top_token_frac == 0.25
    assert rows[2].dup_token_frac == 0.0
    assert rows[2].dup_2gram_frac == 0.0       # no bigrams -> 0, not NULL
    assert rows[2].top_token_frac == 1.0


def test_decontaminate_hand_case(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import dedup
    from build_a_market_data_etl_strategy_backtesting_engine_spark import plans

    train = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps"),   # shares grams
        Row(doc_id=2, text="completely different words here"),
        Row(doc_id=3, text="the quick brown cat"),          # 1 shared gram
    ])
    ev = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox runs")])
    hits = dedup.decontaminate(train, ev, n=3)
    got = {r.doc_id: r.n_shared for r in hits.collect()}
    # doc1 shares 'the quick brown' + 'quick brown fox'; doc3 one gram;
    # doc2 clean (absent — anti-join semantics)
    assert got == {1: 2, 3: 1}
    assert plans.has_broadcast_join(hits)  # eval grams ride a broadcast


def test_mixture_rates_temperature():
    counts = {"en": 8000, "fr": 1500, "zh": 500}
    # T=1: natural proportions -> every rate is target/total
    r1 = sampling.mixture_rates(counts, temperature=1.0, target_total=5000)
    assert all(v == pytest.approx(0.5) for v in r1.values())
    # higher temperature boosts low-resource strata relative to en
    r1b = sampling.mixture_rates(counts, temperature=1.0, target_total=3000)
    r2 = sampling.mixture_rates(counts, temperature=2.0, target_total=3000)
    assert r2["zh"] > r1b["zh"] and r2["en"] < r1b["en"]
    # expected kept size respects the budget when no stratum caps at 1.0
    assert max(r2.values()) < 1.0
    kept = sum(r2[k] * counts[k] for k in counts)
    assert kept == pytest.approx(3000, rel=1e-9)
    # cap: uniform limit with tiny stratum saturates at 1.0
    r3 = sampling.mixture_rates(counts, temperature=100.0,
                                target_total=9000)
    assert r3["zh"] == 1.0
    with pytest.raises(ValueError):
        sampling.mixture_rates(counts, temperature=0.0)


def test_tick_rule_signs_and_ofi(spark):
    import datetime as dt

    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        microstructure as micro,
    )

    def t(m):
        return dt.datetime(2024, 1, 1, 9, 0, m)

    ticks = spark.createDataFrame(
        [("A", t(0), 10.0, 5.0, 1),
         ("A", t(1), 11.0, 2.0, 2),   # uptick  +1
         ("A", t(2), 11.0, 3.0, 3),   # zero tick -> inherit +1
         ("A", t(3), 10.5, 4.0, 4),   # downtick -1
         ("A", t(4), 10.5, 1.0, 5)],  # zero tick -> inherit -1
        "symbol string, ts timestamp, price double, volume double,"
        " seq long")
    signed = micro.tick_rule_signs(ticks)
    got = {r.seq: r.trade_sign for r in signed.collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: -1, 5: -1}
    bar = micro.ofi_bars(signed, "15min").collect()
    assert len(bar) == 1
    b = bar[0]
    # signed vol = 0*5 + 2 + 3 - 4 - 1 = 0 ; volume = 15
    assert b.signed_volume == 0.0 and b.volume == 15.0 and b.ofi == 0.0


def test_daily_risk_measures_hand_case(spark):
    import datetime as dt
    import math

    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        microstructure as micro,
    )

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    bars_df = spark.createDataFrame(
        [("A", t(9), 100.0, 10.0),
         ("A", t(10), 110.0, 20.0),
         ("A", t(11), 99.0, 0.0),     # zero volume: excluded from amihud
         ("B", t(9), 50.0, 5.0),
         ("B", t(10), 0.0, 5.0),      # invalid close: no return defined
         ("B", t(11), 60.0, 5.0)],
        "symbol string, ts timestamp, close double, volume double")
    rows = {r.symbol: r for r in micro.daily_risk_measures(bars_df).collect()}
    a = rows["A"]
    r1, r2 = 0.1, 99.0 / 110.0 - 1
    assert a.realized_var == pytest.approx(r1 ** 2 + r2 ** 2, rel=1e-12)
    assert a.bipower_var == pytest.approx(
        math.pi / 2 * abs(r2) * abs(r1), rel=1e-12)
    # only the 10:00 bar contributes to amihud (11:00 has zero volume)
    assert a.amihud_x1e6 == pytest.approx(
        r1 / (110.0 * 20.0) * 1e6, rel=1e-12)
    # B: both returns undefined (into and out of the zero close)
    assert "B" not in rows or rows["B"].n_bars == 0


def test_roll_spread_hand_case(spark):
    import datetime as dt
    import math

    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        microstructure as micro,
    )

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    # bid-ask bounce around 100 with spread 2: closes alternate 99, 101
    bounce = [("A", t(9, 5 * i), 99.0 if i % 2 else 101.0)
              for i in range(10)]
    trend = [("B", t(9, 5 * i), 100.0 + i) for i in range(10)]
    bars_df = spark.createDataFrame(
        bounce + trend, "symbol string, ts timestamp, close double")
    rows = {r.symbol: r for r in micro.roll_spread(bars_df).collect()}
    # perfect alternation: dp = +/-2, cov(dp, dp_prev) = -4*(n/(n-1)) ~ -4
    assert rows["A"].serial_cov < 0
    assert rows["A"].roll_spread == pytest.approx(
        2 * math.sqrt(-rows["A"].serial_cov), rel=1e-12)
    assert 3.5 < rows["A"].roll_spread < 4.8  # ~2*sqrt(4.57)
    # monotone trend: dp constant +1 -> cov 0 -> estimator undefined
    assert rows["B"].roll_spread is None


def test_vpin_hand_case(spark):
    import datetime as dt

    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        microstructure as micro,
    )

    def t(m):
        return dt.datetime(2024, 1, 1, 9, 0, m)

    # prices strictly rising -> every classified tick is a buy
    ticks = spark.createDataFrame(
        [("A", t(i), 100.0 + i, 10.0, i) for i in range(10)],
        "symbol string, ts timestamp, price double, volume double,"
        " seq long")
    signed = micro.tick_rule_signs(ticks)
    out = sorted(micro.vpin(signed, bucket_volume=30.0,
                            window_buckets=2).collect(),
                 key=lambda r: r.vbucket)
    # 100 total volume in 30-volume buckets -> buckets 0..3
    assert [r.vbucket for r in out] == [0, 1, 2, 3]
    assert sum(r.total_vol for r in out) == 100.0
    # bucket 0 holds the unclassified first tick: imbalance 20/30
    assert out[0].imbalance == pytest.approx(2 / 3)
    # all later buckets are pure buys -> imbalance 1.0
    assert all(r.imbalance == 1.0 for r in out[1:])
    # trailing-2 mean: bucket 1 averages (2/3 + 1)/2
    assert out[1].vpin == pytest.approx((2 / 3 + 1) / 2)
    assert out[3].vpin == 1.0


def test_corwin_schultz_properties(spark):
    import datetime as dt

    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        microstructure as micro,
    )

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    # wide constant-range bars (bounce) vs hairline-range bars: the
    # estimator must read a larger spread from the wide-range series
    wide = [("W", t(9 + i), 102.0, 98.0) for i in range(6)]
    tight = [("T", t(9 + i), 100.02, 99.98) for i in range(6)]
    invalid = [("X", t(9), 10.0, 0.0), ("X", t(10), 10.0, -1.0)]
    bars_df = spark.createDataFrame(
        wide + tight + invalid,
        "symbol string, ts timestamp, high double, low double")
    rows = {r.symbol: r for r in micro.corwin_schultz(bars_df).collect()}
    assert rows["W"].n_pairs == 5 and rows["T"].n_pairs == 5
    assert rows["W"].cs_spread > rows["T"].cs_spread >= 0.0
    # non-positive lows are invalid data: no pair survives for X
    assert "X" not in rows


def test_intraday_profile_shares_sum_to_one(spark):
    import datetime as dt

    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        microstructure as micro,
    )

    bars_df = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, d, 9, 15 * s), float(10 * (s + 1)))
         for d in (1, 2, 3) for s in range(4)],
        "symbol string, ts timestamp, volume double")
    out = micro.intraday_profile(bars_df).collect()
    assert len(out) == 4  # four 15-min slots
    # shares sum to 1 and rank with the slot volumes (10,20,30,40)
    assert sum(r.volume_share for r in out) == pytest.approx(1.0)
    by_slot = sorted(out, key=lambda r: r.slot_min)
    assert [r.avg_volume for r in by_slot] == [10.0, 20.0, 30.0, 40.0]
    assert by_slot[-1].volume_share == pytest.approx(0.4)
    assert all(r.n_bars == 3 for r in out)  # 3 days per slot
