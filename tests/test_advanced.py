"""Tests for order book simulation, event-driven engine, portfolio
optimization, dedup/similarity, risk, ml, multimodal, config."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark.config import Config
from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    dedup,
    ml,
    multimodal,
    orderbook,
    portfolio_opt,
    risk,
    similarity,
    text,
)


# ------------------------------------------------------------- order book

def _ts(s):
    import datetime

    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_order_book_market_and_limit_matching(spark):
    """Port of the reference flow tests (test_order_book.py:209-356):
    market fill at last +/- slippage; marketable limit fills immediately;
    resting limit fills when a tick crosses it."""
    schema = ("order_id string, ts timestamp, symbol string, side string, "
              "order_type string, quantity double, price double, "
              "stop_price double")
    orders = spark.createDataFrame([
        # market buy after first tick
        ("o1", _ts(1), "A", "buy", "market", 10.0, None, None),
        # resting buy limit below market
        ("o2", _ts(1), "A", "buy", "limit", 5.0, 99.0, None),
        # marketable sell limit (price <= last)
        ("o3", _ts(3), "A", "sell", "limit", 3.0, 99.5, None),
        # market order before any tick -> rejected
        ("o4", _ts(0), "B", "buy", "market", 1.0, None, None),
    ], schema)
    ticks = spark.createDataFrame([
        Row(ts=_ts(0), symbol="A", price=100.0),
        Row(ts=_ts(2), symbol="A", price=100.5),
        Row(ts=_ts(4), symbol="A", price=98.5),   # crosses o2's 99 limit
    ])
    fills = orderbook.simulate_order_book(orders, ticks, slippage_pct=0.001)
    got = {r.order_id: r for r in fills.collect()}
    assert got["o1"].price == pytest.approx(100.0 * 1.001)
    assert got["o1"].side == "buy" and got["o1"].quantity == 10.0
    assert got["o3"].price == 99.5  # marketable limit at its limit price
    assert got["o2"].price == 99.0  # resting limit filled on the 98.5 tick
    assert "o4" not in got  # rejected, no reference price


def test_order_book_order_vs_order_crossing(spark):
    """cross_orders=True: continuous-double-auction matching between resting
    orders (extension beyond the reference's tick-only matching,
    order_book.py:391-460) — price-time priority, partial fills, trades
    print at the resting order's price."""
    schema = ("order_id string, ts timestamp, symbol string, side string, "
              "order_type string, quantity double, price double, "
              "stop_price double")
    orders = spark.createDataFrame([
        # two resting asks, price-time priority: s1 @101 before s2 @102
        ("s1", _ts(1), "A", "sell", "limit", 10.0, 101.0, None),
        ("s2", _ts(2), "A", "sell", "limit", 10.0, 102.0, None),
        # aggressive buy 15 @102: sweeps s1 fully (10@101), s2 partially
        # (5@102) — nothing rests
        ("b1", _ts(3), "A", "buy", "limit", 15.0, 102.0, None),
        # market buy 3: takes s2's remaining 5 partially at 102
        ("b2", _ts(4), "A", "buy", "market", 3.0, None, None),
    ], schema)
    ticks = spark.createDataFrame([
        Row(ts=_ts(0), symbol="A", price=100.0),
    ])
    fills = orderbook.simulate_order_book(
        orders, ticks, slippage_pct=0.001, cross_orders=True)
    rows = fills.collect()
    by_order: dict[str, list] = {}
    for r in rows:
        by_order.setdefault(r.order_id, []).append(r)
    # b1 sweeps: 10 @101 (s1's price) then 5 @102 (s2's price)
    b1 = sorted(by_order["b1"], key=lambda r: r.price)
    assert [(r.quantity, r.price) for r in b1] == [(10.0, 101.0), (5.0, 102.0)]
    # counterparties fill at the same prices
    assert [(r.quantity, r.price) for r in by_order["s1"]] == [(10.0, 101.0)]
    s2 = sorted(by_order["s2"], key=lambda r: r.quantity)
    assert [(r.quantity, r.price) for r in s2] == [(3.0, 102.0), (5.0, 102.0)]
    # market buy b2 hit the book (s2's remaining), not last+slippage
    assert [(r.quantity, r.price) for r in by_order["b2"]] == [(3.0, 102.0)]
    # every trade has both counterparties: total bought == total sold
    bought = sum(r.quantity for r in rows if r.side == "buy")
    sold = sum(r.quantity for r in rows if r.side == "sell")
    assert bought == sold == 18.0


def test_order_book_crossing_remainder_rests(spark):
    """Unfilled remainder of a crossing limit rests in the book and still
    fills off the tick tape later; the marketable-vs-last shortcut is
    disabled in crossing mode."""
    schema = ("order_id string, ts timestamp, symbol string, side string, "
              "order_type string, quantity double, price double, "
              "stop_price double")
    orders = spark.createDataFrame([
        ("s1", _ts(1), "A", "sell", "limit", 4.0, 101.0, None),
        # buy 10 @101: fills 4 from s1, remainder 6 rests @101 even though
        # 101 > last (no marketable-vs-last immediate fill in cross mode)
        ("b1", _ts(2), "A", "buy", "limit", 10.0, 101.0, None),
    ], schema)
    ticks = spark.createDataFrame([
        Row(ts=_ts(0), symbol="A", price=100.0),
        Row(ts=_ts(3), symbol="A", price=100.5),  # crosses resting b1 @101
    ])
    fills = orderbook.simulate_order_book(
        orders, ticks, slippage_pct=0.001, cross_orders=True)
    b1 = sorted((r for r in fills.collect() if r.order_id == "b1"),
                key=lambda r: r.quantity)
    assert [(r.quantity, r.price) for r in b1] == [(4.0, 101.0), (6.0, 101.0)]


def test_event_driven_engine_cash_accounting(spark):
    """Buy reduces cash by shares*price*(1+slip) + fee; equity = cash +
    position*price (test_backtest_engine.py:70-83)."""
    bars = spark.createDataFrame([
        Row(symbol="A", ts=_ts(0), close=100.0, signal=1),
        Row(symbol="A", ts=_ts(1), close=101.0, signal=1),
        Row(symbol="A", ts=_ts(2), close=102.0, signal=0),
    ])
    out = (orderbook.event_driven_backtest(
        bars, initial_cash=100_000.0, commission=0.001, slippage=0.0005,
        shares_per_unit=100.0)
        .toPandas().sort_values("ts").reset_index(drop=True))
    exec_px = 100.0 * 1.0005
    cost = 100 * exec_px
    fee = cost * 0.001
    assert out.loc[0, "cash"] == pytest.approx(100_000.0 - cost - fee)
    assert out.loc[0, "position"] == 100.0
    assert out.loc[0, "equity"] == pytest.approx(
        out.loc[0, "cash"] + 100 * 100.0)
    # flat at the end: position sold at 102*(1-slip)
    assert out.loc[2, "position"] == 0.0
    sell_px = 102.0 * 0.9995
    exp_cash = (out.loc[1, "cash"] + 100 * sell_px
                - 100 * sell_px * 0.001)
    assert out.loc[2, "cash"] == pytest.approx(exp_cash)


def test_event_driven_insufficient_cash_rejected(spark):
    bars = spark.createDataFrame([
        Row(symbol="A", ts=_ts(0), close=1000.0, signal=1),
    ])
    out = orderbook.event_driven_backtest(
        bars, initial_cash=100.0, shares_per_unit=100.0).collect()[0]
    assert out.position == 0.0 and out.cash == 100.0


def test_event_vs_vectorized_accuracy(spark):
    """Reference claim (README.md:257): vectorized == event-driven for
    simple strategies. Compare equity paths on buy&hold with zero costs."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        backtest,
        signals,
    )

    rng = np.random.default_rng(5)
    n = 50
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=n, freq="1D"),
        "close": 100 * np.exp(np.cumsum(rng.normal(0, 0.01, n))),
    })
    bars = signals.buy_and_hold_signal(spark.createDataFrame(pdf))
    vec = (backtest.backtest_signals(bars, commission=0.0, slippage=0.0,
                                     initial_cash=10_000.0)
           .toPandas().sort_values("ts"))
    ev = (orderbook.event_driven_backtest(
        bars, initial_cash=10_000.0, commission=0.0, slippage=0.0,
        shares_per_unit=100.0)
        .toPandas().sort_values("ts"))
    # event-driven holds 100 shares; vectorized holds 1x notional returns.
    # Compare normalized equity curves of the invested fraction.
    vec_growth = vec.equity.values / 10_000.0
    invested = 100 * pdf.close.iloc[0]
    ev_growth = ((ev.equity.values - (10_000.0 - invested)) / invested)
    np.testing.assert_allclose(vec_growth, ev_growth, rtol=1e-9)


# ----------------------------------------------------- portfolio optimization

@pytest.fixture(scope="module")
def returns_sdf(spark):
    rng = np.random.default_rng(42)
    n = 252
    frames = []
    for sym, mu, sd in [("AAPL", 0.0008, 0.012), ("MSFT", 0.0006, 0.010),
                        ("GOOGL", 0.0009, 0.018), ("AMZN", 0.0004, 0.015)]:
        frames.append(pd.DataFrame({
            "ts": pd.date_range("2024-01-01", periods=n, freq="1D"),
            "symbol": sym, "ret": rng.normal(mu, sd, n),
        }))
    return spark.createDataFrame(pd.concat(frames)).repartition(4)


def test_covariance_matches_pandas(spark, returns_sdf):
    symbols, cov = portfolio_opt.covariance_matrix(returns_sdf)
    pdf = returns_sdf.toPandas().pivot(index="ts", columns="symbol",
                                       values="ret")
    exp = pdf[symbols].cov().values * 252
    np.testing.assert_allclose(cov, exp, rtol=1e-9)


def test_weights_simplex_and_risk_parity(spark, returns_sdf):
    """Weights sum to 1 within bounds; risk parity equalizes contributions
    (test_portfolio_optimization.py:70-147)."""
    for obj in ["max_sharpe", "min_volatility", "risk_parity"]:
        symbols, w, stats = portfolio_opt.optimize(returns_sdf, obj)
        assert abs(w.sum() - 1) < 1e-9
        assert (w >= -1e-12).all() and (w <= 1 + 1e-12).all()
        assert stats["vol"] > 0
    _, cov = portfolio_opt.covariance_matrix(returns_sdf)
    w = portfolio_opt.risk_parity_weights(cov)
    rc = w * (cov @ w) / (w @ cov @ w)
    assert rc.max() / rc.min() < 1.05  # near-equal contributions


def test_min_vol_beats_equal_weight(spark, returns_sdf):
    _, cov = portfolio_opt.covariance_matrix(returns_sdf)
    w = portfolio_opt.min_volatility_weights(cov)
    eq = np.full(len(w), 1 / len(w))
    assert w @ cov @ w <= eq @ cov @ eq + 1e-12


def test_efficient_frontier_monotone_risk(spark, returns_sdf):
    symbols, cov = portfolio_opt.covariance_matrix(returns_sdf)
    mu_rows = portfolio_opt.expected_returns(returns_sdf).collect()
    mu = np.array([{r["symbol"]: r["exp_ret"] for r in mu_rows}[s]
                   for s in symbols])
    pts = portfolio_opt.efficient_frontier(mu, cov, n_points=20)
    vols = [p["vol"] for p in pts]
    assert vols[0] == min(vols)  # starts at the GMV portfolio
    # above the GMV return the frontier is non-decreasing in risk
    assert all(b >= a - 1e-10 for a, b in zip(vols, vols[1:]))


def test_frontier_slsqp_parity_kkt(spark, returns_sdf):
    """Each frontier point must be the exact optimum of the constrained QP
    the reference solves per point with SLSQP (portfolio_optimization.py:
    203-228): min wᵀΣw s.t. Σw=1, μᵀw=target, w in [0,1]. For a convex QP
    the KKT conditions are necessary AND sufficient, so verifying them is a
    solver-independent parity proof; interior points are additionally
    checked against the closed-form KKT solution to 1e-8."""
    symbols, cov = portfolio_opt.covariance_matrix(returns_sdf)
    mu_rows = portfolio_opt.expected_returns(returns_sdf).collect()
    mu = np.array([{r["symbol"]: r["exp_ret"] for r in mu_rows}[s]
                   for s in symbols])
    k = len(mu)
    E = np.vstack([np.ones(k), mu])
    pts = portfolio_opt.efficient_frontier(mu, cov, n_points=25)
    n_interior = 0
    for p in pts:
        w = np.array(p["weights"])
        target = p["ret"]
        # feasibility
        assert abs(w.sum() - 1.0) < 1e-8
        assert abs(w @ mu - target) < 1e-8
        assert (w >= -1e-10).all() and (w <= 1 + 1e-10).all()
        # KKT stationarity: Σw = Eᵀν + λ, λ_i = 0 where w_i > 0, λ >= 0
        free = w > 1e-10
        if free.sum() >= 2:
            nu, *_ = np.linalg.lstsq(E[:, free].T, (cov @ w)[free],
                                     rcond=None)
            g = cov @ w - E.T @ nu
            assert np.abs(g[free]).max() < 1e-8      # stationary on support
            if (~free).any():
                assert g[~free].min() > -1e-8        # multipliers >= 0
        else:
            # vertex: the feasible set is a single point (target == mu_i is
            # the extreme attainable return) — feasibility alone is optimality
            i = int(np.argmax(free))
            assert abs(mu[i] - target) < 1e-8
            assert abs(mu[i] - mu.max()) < 1e-8
        if free.all():
            n_interior += 1
            d = np.array([1.0, target])
            w_cf = np.linalg.solve(cov, E.T) @ np.linalg.solve(
                E @ np.linalg.solve(cov, E.T), d)
            np.testing.assert_allclose(w, w_cf, atol=1e-8)
    assert n_interior >= 1  # the closed-form branch actually ran


# ------------------------------------------------------------ dedup / text

def test_exact_substring_spans(spark):
    """ExactSubstr semantics on a constructed fixture: shared window-size
    runs are detected, overlapping windows merge into one maximal span,
    and unique text produces no rows."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        text as text_ops,
    )

    shared = "a b c d e f"                      # 6 shared tokens
    docs = spark.createDataFrame([
        # doc 1: shared run at the start, unique tail
        (1, shared + " u1 u2 u3 u4 u5 u6"),
        # doc 2: unique head, the same shared run at the end
        (2, "v1 v2 v3 v4 v5 v6 " + shared),
        # doc 3: fully unique, same length
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in
           text_ops.exact_substring_spans(docs, window=4, min_dup=2)
           .collect()}
    assert set(out) == {1, 2}                   # doc 3 untouched
    # 6-token shared run with window 4 -> 3 duplicated windows merging
    # into ONE maximal span of exactly 6 tokens
    for d in (1, 2):
        assert out[d].n_dup_windows == 3
        assert out[d].n_spans == 1
        assert out[d].dup_tokens == 6
        assert out[d].n_tokens == 12
        assert out[d].dup_frac == 0.5
    # two disjoint shared runs in one doc -> two spans, not one
    docs2 = spark.createDataFrame([
        (1, "a b c d x1 x2 x3 e f g h"),
        (2, "a b c d y1 y2 y3 e f g h"),
    ], "doc_id long, text string")
    out2 = {r.doc_id: r for r in
            text_ops.exact_substring_spans(docs2, window=4, min_dup=2)
            .collect()}
    assert out2[1].n_spans == 2 and out2[1].dup_tokens == 8


def test_exact_and_near_dup(spark):
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
        (3, "the quick brown fox leaps over the lazy dog"),   # near dup
        (4, "completely different content about spark engines"),
    ], "doc_id long, text string")
    ex = dedup.exact_duplicates(docs).collect()
    assert len(ex) == 1 and sorted(ex[0].doc_ids) == [1, 2]
    kept = dedup.distinct_by_content(docs)
    assert kept.count() == 3

    pairs = dedup.minhash_dedup(docs, num_hashes=16, bands=8, k=5,
                                threshold=0.5)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got
    assert not any({a, b} == {1, 4} for a, b in got)


def test_simhash_hamming(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame([
        (1, base),
        (2, base),                       # identical -> hamming 0, guaranteed
        (3, base.replace("tok7", "zzz")),  # near dup, low hamming
        (4, " ".join(f"other{i}" for i in range(40))),  # unrelated
    ], "doc_id long, text string")
    hashes = dedup.simhash(docs)
    # pigeonhole recall guarantee: hamming < chunks always found
    pairs = dedup.simhash_near_dups(hashes, max_hamming=7, chunks=8)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0
    assert (1, 4) not in got and (2, 4) not in got
    # the near dup has a much smaller distance than unrelated text
    h = {r.doc_id: r.simhash for r in hashes.collect()}
    mask = (1 << 64) - 1
    d13 = bin((h[1] ^ h[3]) & mask).count("1")
    d14 = bin((h[1] ^ h[4]) & mask).count("1")
    assert d13 < d14


def test_embedding_neardup_and_topk(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = [
        (0, [float(x) for x in base], 0),
        (1, [float(x) for x in base + rng.standard_normal(16) * 0.01], 0),
        (2, [float(x) for x in rng.standard_normal(16)], 1),
        (3, [float(x) for x in rng.standard_normal(16)], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    top = similarity.brute_force_topk(emb, [float(x) for x in base], k=2)
    ids = [r.vec_id for r in top.collect()]
    assert ids[0] == 0 and ids[1] == 1
    near = dedup.embedding_near_dups(emb, threshold=0.95, n_planes=6,
                                     seed=1)
    got = {(r.id_a, r.id_b) for r in near.collect()}
    assert (0, 1) in got


def test_ivf_index_recall(spark):
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)], 0)
            for i in range(100)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    cents = similarity.kmeans_centroids(emb, n_cells=4, iterations=3)
    index = similarity.ivf_index(emb, cents)
    assert index.select("cell").distinct().count() <= 4
    q = rows[7][1]
    exact = [r.vec_id for r in
             similarity.brute_force_topk(emb, q, k=1).collect()]
    approx = [r.vec_id for r in
              similarity.ivf_topk(index, cents, q, k=1, n_probe=4).collect()]
    assert approx == exact  # n_probe = all cells -> exact


def test_language_id(spark):
    docs = spark.createDataFrame([
        (1, "the cat sat on the mat and it is a fine day"),
        (2, "der hund ist nicht zu hause und das ist gut"),
        (3, "le chat est sur la table et les livres"),
        (4, "xyzzy plugh quux"),
    ], "doc_id long, text string")
    got = {r.doc_id: r.lang for r in docs.select(
        "doc_id", text.predict_language("text").alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
    assert got[4] == "unknown"


def test_winnowing_fingerprints_overlap(spark):
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "prefix words then the quick brown fox jumps over the lazy dog"),
        (3, "entirely unrelated text with no shared substrings at all"),
    ], "doc_id long, text string")
    fps = text.rolling_hash_fingerprints(docs, k=8, window=4)
    a = {r.fp for r in fps.filter("doc_id = 1").collect()}
    b = {r.fp for r in fps.filter("doc_id = 2").collect()}
    c = {r.fp for r in fps.filter("doc_id = 3").collect()}
    assert len(a & b) > 0
    assert len(a & c) == 0


# ----------------------------------------------------------------- risk/ml

def test_var_cvar_ordering(spark):
    rng = np.random.default_rng(42)
    pdf = pd.DataFrame({"net_returns": rng.normal(0, 0.02, 500)})
    sdf = spark.createDataFrame(pdf)
    out = risk.conditional_var(sdf, 0.95).collect()[0]
    assert out.cvar <= out.var <= 0  # CVaR <= VaR (test_risk_monitor.py:61-69)
    exp_var = pdf.net_returns.quantile(0.05)
    assert abs(out.var - exp_var) < 1e-12


def test_trailing_stop_monotone(spark):
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=6, freq="1D"),
        "close": [100.0, 110.0, 105.0, 120.0, 115.0, 90.0],
    })
    out = (risk.trailing_stops(spark.createDataFrame(pdf), 0.05)
           .toPandas().sort_values("ts"))
    assert (np.diff(out.stop_price.values) >= -1e-12).all()  # ratchet
    assert bool(out.stop_hit.iloc[-1])  # 90 <= 120*0.95


def test_kelly_bounds(spark):
    df = spark.createDataFrame(
        [(0.6, 0.02, -0.01), (0.2, 0.01, -0.02), (0.99, 0.05, -0.001)],
        "p double, aw double, al double")
    out = df.select(
        risk.kelly_fraction(F.col("p"), F.col("aw"), F.col("al")).alias("k")
    ).toPandas()
    assert ((out.k >= 0) & (out.k <= 0.25)).all()


def test_walk_forward_no_overlap(spark):
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=120, freq="1D"),
        "close": np.linspace(100, 120, 120),
    })
    sdf = spark.createDataFrame(pdf)
    folds = ml.walk_forward_splits(sdf, n_splits=3)
    assert len(folds) == 3
    for train, test in folds:
        tmax = train.agg(F.max("ts")).first()[0]
        tmin = test.agg(F.min("ts")).first()[0]
        assert tmax < tmin
        assert test.count() > 0


def test_predict_bridge_and_ensemble(spark):
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=60, freq="1D"),
        "close": 100 + np.arange(60) * 0.5,
    })
    feats = ml.engineer_features(spark.createDataFrame(pdf))
    scored = ml.predict_with_model(
        feats, lambda x: (x["ret_1"] > 0).astype(float), ["ret_1"])
    assert scored.filter(F.col("prediction") == 1.0).count() > 0
    two = scored.withColumn("s1", (F.col("prediction") * 2 - 1).cast("int")) \
                .withColumn("s2", F.lit(1))
    ens = ml.ensemble_signal(two, ["s1", "s2"], [1.0, 1.0], threshold=0.5)
    assert set(r.signal for r in ens.select("signal").distinct().collect()) \
        <= {-1, 0, 1}


def test_numpy_fit_end_to_end(spark):
    """Full train_model parity loop (ml_strategy.py:73-104): Spark features
    -> labels -> time split -> numpy fit -> predict_with_model -> signal.
    The synthetic fixture is linearly separable on ret_1, so accuracy on
    the held-out tail is pinned high."""
    rng = np.random.default_rng(7)
    n = 400
    # price path whose next-step direction follows the last return ~85% of
    # the time -> ret_1 is genuinely predictive of the label.
    steps = []
    last = 1.0
    for _ in range(n):
        keep = rng.random() < 0.85
        last = last if keep else -last
        steps.append(last * 0.005)
    close = 100 * np.cumprod(1 + np.array(steps))
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=n, freq="1h"),
        "close": close,
        "volume": 1000.0,
    })
    feats = ml.engineer_features(spark.createDataFrame(pdf))
    labeled = ml.make_labels(feats).na.drop(
        subset=["ret_1", "label"]).filter(F.col("label") != 0)
    train, test = ml.time_split(labeled, 0.8)
    model = ml.train_model(train, ["ret_1", "ret_5"], "label")
    assert model.coef_ is not None and model.coef_[0] > 0  # momentum learned
    scored = ml.predict_with_model(test, model.predict, ["ret_1", "ret_5"])
    agree = scored.select(
        F.avg((F.col("prediction") == F.col("label")).cast("double"))
    ).first()[0]
    assert agree > 0.7, agree
    # deterministic: second fit is bit-identical
    model2 = ml.train_model(train, ["ret_1", "ret_5"], "label")
    assert np.array_equal(model.coef_, model2.coef_)
    imp = model.feature_importance()
    assert list(imp.columns) == ["feature", "importance"]
    assert abs(imp["importance"].sum() - 1.0) < 1e-12


# ------------------------------------------------------- multimodal / config

def test_multimodal_plumbing(spark):
    media = multimodal.synthetic_media(spark, 12)
    feats = multimodal.media_features(media).toPandas()
    assert len(feats) == 12
    assert (feats.n_bytes == 256).all()
    assert feats.sha256.nunique() == 12
    assert ((feats.feature_norm >= 0) & (feats.feature_norm <= 1)).all()
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    per_video = plan.groupBy("media_id").count().collect()
    assert all(r["count"] == 5 for r in per_video)  # 5000ms / 1000ms


def test_multimodal_real_decoder_stub(spark):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"notanimage")


def test_multimodal_resize_plumbing(spark):
    """resize_images stub path: binary payloads round-trip Arrow byte-exact,
    images get target dims + resized flag, non-images pass through."""
    media = multimodal.synthetic_media(spark, 12)
    src = {r.media_id: (r.kind, bytes(r.content), r.width, r.height)
           for r in media.select(
               "media_id", "kind", "content", "width", "height").collect()}
    out = multimodal.resize_images(media, 224, 224).collect()
    assert len(out) == 12
    for r in out:
        kind, content, w, h = src[r.media_id]
        assert bytes(r.content) == content  # byte-exact Arrow round-trip
        if kind == "image":
            assert (r.width, r.height) == (224, 224)
            assert r.resized  # synthetic media is 64x48, never at target
        else:
            assert (r.width, r.height) == (w, h)
            assert not r.resized
    # real-decoder path raises without PIL, same as decode_image
    with pytest.raises(Exception):
        multimodal.resize_images(
            media, use_real_decoder=True).collect()


def test_config_dot_notation(tmp_path):
    cfg = Config({"backtesting": {"commission": 0.002}})
    assert cfg.commission == 0.002
    assert cfg.slippage == 0.0005  # default preserved by deep merge
    assert cfg.get("etl.queue_size") == 10000
    assert cfg.get("missing.key", "dflt") == "dflt"
    cfg.set("custom.nested.value", 7)
    assert cfg.get("custom.nested.value") == 7


# ------------------------------------------------------------------ report

def test_report_and_pandas_strategy_hook(spark, tmp_path):
    from build_a_market_data_etl_strategy_backtesting_engine_spark import report
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        backtest,
        metrics as metrics_ops,
        signals,
    )

    rng = np.random.default_rng(11)
    n = 120
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=n, freq="1D"),
        "close": 100 * np.exp(np.cumsum(rng.normal(0, 0.01, n))),
    })
    bars_df = spark.createDataFrame(pdf)

    # user pandas strategy through the GROUPED_MAP hook (strategy.py:34-41)
    def my_strategy(g: pd.DataFrame) -> pd.Series:
        ma = g["close"].rolling(10).mean()
        return (g["close"] > ma).astype(int)

    sig = signals.apply_pandas_strategy(bars_df, my_strategy)
    assert set(r.signal for r in sig.select("signal").distinct().collect()) \
        <= {0, 1}
    res = backtest.backtest_signals(sig, initial_cash=10_000.0)
    m = metrics_ops.compute_metrics(res)
    out = report.create_report(res, m, str(tmp_path / "r.html"))
    txt = open(out).read()
    assert "<table>" in txt and "svg" in txt and "drawdown" in txt
    assert report.summary_table([r.asDict() for r in m.collect()])


def test_interactive_report(spark, tmp_path):
    """plot_interactive parity (visualization.py:246-347): three shared-x
    panels, linked hover, single self-contained file with no external
    script/CDN dependency."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark import report
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        backtest,
        signals,
    )

    rng = np.random.default_rng(3)
    n = 90
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=n, freq="1D"),
        "close": 100 * np.exp(np.cumsum(rng.normal(0, 0.01, n))),
    })
    sig = signals.momentum_signal(
        spark.createDataFrame(pdf), lookback=10, threshold=0.0)
    res = backtest.backtest_signals(sig, initial_cash=10_000.0)
    out = report.create_interactive_report(res, str(tmp_path / "i.html"))
    txt = open(out).read()
    assert "Equity Curve" in txt and "Drawdown" in txt and "Position" in txt
    assert "mousemove" in txt and "data-cross" in txt  # linked hover wiring
    assert "<script src" not in txt and "http" not in txt.split("</title>")[1]
    # the embedded data really is the curve: first equity value present
    first_eq = res.filter("symbol = 'A'").orderBy("ts").first().equity
    assert f"{first_eq}"[:8] in txt
    # pure-python twin renders without Spark
    doc = report.interactive_html(["t0", "t1", "t2"], [1.0, 2.0, 1.5])
    assert "Equity Curve" in doc and "Drawdown" in doc


def test_futures_math(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.functions import (
        derivatives as deriv,
    )

    df = spark.createDataFrame(
        [(100.0, 105.0, 2.0, 50.0)],
        "entry double, current double, contracts double, mult double")
    r = df.select(
        deriv.futures_pnl(F.col("entry"), F.col("current"),
                          F.col("contracts"), F.col("mult")).alias("pnl_long"),
        deriv.futures_pnl(F.col("entry"), F.col("current"),
                          F.col("contracts"), F.col("mult"),
                          long=False).alias("pnl_short"),
        deriv.futures_basis(F.col("current"), F.col("entry")).alias("basis"),
        deriv.cost_of_carry(F.col("entry"), F.lit(0.05), F.lit(0.01),
                            F.lit(1.0)).alias("fair"),
    ).collect()[0]
    assert r.pnl_long == 500.0 and r.pnl_short == -500.0
    assert r.basis == 5.0
    assert r.fair == pytest.approx(100.0 * np.exp(0.06))


def test_bpe_ish_token_count(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        text as text_ops,
    )

    df = spark.createDataFrame([("hello, world! (test)",)], "t string")
    n = df.select(text_ops.bpe_ish_token_count("t").alias("n")).first().n
    # hello , world ! ( test )  -> 7
    assert n == 7


# -------------------------------------------------------- time-series joins

def test_asof_join_matches_pandas_merge_asof(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import joins

    rng = np.random.default_rng(17)
    left = pd.DataFrame({
        "symbol": ["A"] * 50 + ["B"] * 50,
        "ts": list(pd.date_range("2024-01-01", periods=50, freq="37s")) * 2,
        "px": rng.normal(100, 1, 100),
    })
    right = pd.DataFrame({
        "symbol": ["A"] * 10 + ["B"] * 10,
        "ts": list(pd.date_range("2024-01-01", periods=10, freq="3min")) * 2,
        "quote": rng.normal(50, 1, 20),
    })
    got = (joins.asof_join(spark.createDataFrame(left),
                           spark.createDataFrame(right),
                           on="ts", by="symbol", value_cols=["quote"])
           .toPandas().sort_values(["symbol", "ts"]).reset_index(drop=True))
    exp_frames = []
    for sym in ["A", "B"]:
        lg = left[left.symbol == sym].sort_values("ts")
        rg = right[right.symbol == sym].sort_values("ts")
        exp_frames.append(pd.merge_asof(lg, rg.drop(columns=["symbol"]),
                                        on="ts"))
    exp = (pd.concat(exp_frames).sort_values(["symbol", "ts"])
           .reset_index(drop=True))
    np.testing.assert_allclose(got["quote"], exp["quote"])

    # cogrouped merge_asof twin with tolerance
    got2 = (joins.asof_join_pandas(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by="symbol", tolerance=pd.Timedelta("2min"))
        .toPandas().sort_values(["symbol", "ts"]).reset_index(drop=True))
    exp2_frames = []
    for sym in ["A", "B"]:
        lg = left[left.symbol == sym].sort_values("ts")
        rg = right[right.symbol == sym].sort_values("ts")
        exp2_frames.append(pd.merge_asof(
            lg, rg.drop(columns=["symbol"]), on="ts",
            tolerance=pd.Timedelta("2min")))
    exp2 = (pd.concat(exp2_frames).sort_values(["symbol", "ts"])
            .reset_index(drop=True))
    np.testing.assert_allclose(got2["quote"].fillna(-1), exp2["quote"].fillna(-1))


def test_range_join_containment(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import joins

    points = spark.createDataFrame(pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01 00:00", periods=12, freq="30min"),
        "v": range(12),
    }))
    intervals = spark.createDataFrame(pd.DataFrame({
        "symbol": "A",
        "start": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 02:00"]),
        "end": pd.to_datetime(["2024-01-01 01:00", "2024-01-01 05:00"]),
        "label": ["x", "y"],
    }))
    got = (joins.range_join(points, intervals, bucket_seconds=1800)
           .toPandas())
    by_label = got.groupby("label")["v"].apply(sorted).to_dict()
    assert by_label["x"] == [0, 1]          # 00:00, 00:30 in [0,1h)
    assert by_label["y"] == [4, 5, 6, 7, 8, 9]  # [2h,5h)


def test_stop_orders_and_book_snapshots(spark):
    schema = ("order_id string, ts timestamp, symbol string, side string, "
              "order_type string, quantity double, price double, "
              "stop_price double")
    orders = spark.createDataFrame([
        # sell stop at 99: triggers when last <= 99 -> market sell w/ slip
        ("s1", _ts(1), "A", "sell", "stop", 4.0, None, 99.0),
        # buy stop-limit: triggers at >= 101, becomes limit buy at 100.4
        ("s2", _ts(1), "A", "buy", "stop_limit", 2.0, 100.4, 101.0),
        # resting limit for depth
        ("s3", _ts(1), "A", "buy", "limit", 1.0, 90.0, None),
    ], schema)
    ticks = spark.createDataFrame([
        Row(ts=_ts(0), symbol="A", price=100.0),
        Row(ts=_ts(2), symbol="A", price=101.5),  # triggers s2
        Row(ts=_ts(3), symbol="A", price=98.5),   # triggers s1
        Row(ts=_ts(4), symbol="A", price=100.3),  # fills s2's resting 100.4 limit
    ])
    fills = orderbook.simulate_order_book(orders, ticks, slippage_pct=0.001)
    got = {r.order_id: r for r in fills.collect()}
    assert got["s1"].price == pytest.approx(98.5 * 0.999)  # stop -> market sell
    # s2 triggered at 101.5 but limit 100.4 not marketable -> rests, fills
    # later when price crosses down to 100.3 (<= limit 100.4)
    assert got["s2"].price == 100.4
    snaps = (orderbook.simulate_order_book(
        orders, ticks, slippage_pct=0.001, emit="snapshots")
        .toPandas().sort_values("ts").reset_index(drop=True))
    assert len(snaps) == 4
    assert pd.isna(snaps.loc[0, "best_bid"])  # book empty before orders land
    # at ts=2 s2 triggered -> rests at 100.4 above s3's 90
    assert snaps.loc[1, "best_bid"] == 100.4
    assert snaps.loc[1, "bid_depth"] == 2
    # at ts=3 s2's limit filled (100.4 >= 98.5) -> only s3 remains
    assert snaps.loc[2, "best_bid"] == 90.0
    assert snaps.loc[2, "bid_depth"] == 1


def test_walk_forward_with_numpy_model(spark):
    """Full walk-forward loop with a trainable model (numpy logistic
    regression — no sklearn in env): per-fold train -> broadcast ->
    Arrow-batched predict -> accuracy. The ml_strategy.py:437-488 surface."""
    rng = np.random.default_rng(21)
    n = 400
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=n, freq="1h"),
        "close": 100 * np.exp(np.cumsum(rng.normal(0.0002, 0.008, n))),
    })
    feats = ml.engineer_features(spark.createDataFrame(pdf))
    labeled = ml.make_labels(feats, horizon=1).na.drop(
        subset=["ret_1", "ret_5", "label"])
    cols = ["ret_1", "ret_5", "sma_ratio_10"]

    def train_logreg(x, y, iters=200, lr=0.5):
        w = np.zeros(x.shape[1] + 1)
        xb = np.hstack([x, np.ones((len(x), 1))])
        for _ in range(iters):
            p = 1 / (1 + np.exp(-xb @ w))
            w -= lr * xb.T @ (p - y) / len(y)
        return w

    accs = []
    for train, test in ml.walk_forward_splits(labeled, n_splits=3):
        tr = train.select(*cols, "label").toPandas().fillna(0.0)
        if tr.empty or tr.label.nunique() < 2:
            continue
        y = (tr["label"] > 0).astype(float).values
        w = train_logreg(tr[cols].values, y)

        def predict(x, w=w):
            xb = np.hstack([x.values, np.ones((len(x), 1))])
            return (1 / (1 + np.exp(-xb @ w)) > 0.5).astype(float)

        scored = ml.predict_with_model(test, predict, cols).toPandas()
        if len(scored):
            acc = ((scored["prediction"] > 0.5)
                   == (scored["label"] > 0)).mean()
            accs.append(acc)
    assert len(accs) >= 2
    assert all(0.0 <= a <= 1.0 for a in accs)


def test_build_sequences(spark):
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=12, freq="1h"),
        "close": np.arange(12, dtype=float),
    })
    out = (ml.build_sequences(spark.createDataFrame(pdf), ["close"],
                              seq_len=4)
           .toPandas().sort_values("ts").reset_index(drop=True))
    assert out.loc[2, "sequence"] is None  # warm-up
    seq = out.loc[5, "sequence"]
    assert [s["close"] for s in seq] == [2.0, 3.0, 4.0, 5.0]


def test_asof_join_preserves_matched_nulls(spark):
    """A legitimately-NULL value field on the MATCHED right row must stay
    NULL — not be filled through with an older row's value (merge_asof
    parity; ADVICE struct-ffill fix)."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import joins

    left = pd.DataFrame({
        "symbol": "A",
        "ts": pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:15"]),
        "px": [1.0, 2.0],
    })
    right = pd.DataFrame({
        "symbol": "A",
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10"]),
        "quote": [50.0, np.nan],
    })
    got = (joins.asof_join(spark.createDataFrame(left),
                           spark.createDataFrame(right),
                           on="ts", by="symbol", value_cols=["quote"])
           .toPandas().sort_values("ts").reset_index(drop=True))
    exp = pd.merge_asof(left.sort_values("ts"),
                        right.drop(columns=["symbol"]).sort_values("ts"),
                        on="ts")
    # row 1 matches the 00:10 right row whose quote is NULL -> stays NULL
    assert got.quote.iloc[0] == 50.0
    assert pd.isna(got.quote.iloc[1]) and pd.isna(exp.quote.iloc[1])
    # matched-ts is still the 00:10 row
    assert got.ts_right.iloc[1] == pd.Timestamp("2024-01-01 00:10")


def test_range_join_boundary_and_degenerate_intervals(spark):
    """End-exclusive bucketing is exact integer logic: an interval ending
    exactly on a bucket boundary owns only buckets below it, and an empty
    interval (end <= start) must not blow up sequence() or match points."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import joins

    points = spark.createDataFrame(pd.DataFrame({
        "symbol": "A",
        "ts": pd.to_datetime(["2024-01-01 00:59:59", "2024-01-01 01:00:00"]),
        "v": [0, 1],
    }))
    intervals = spark.createDataFrame(pd.DataFrame({
        "symbol": "A",
        "start": pd.to_datetime(["2024-01-01 00:00:00",
                                 "2024-01-01 02:00:00"]),
        "end": pd.to_datetime(["2024-01-01 01:00:00",     # boundary end
                               "2024-01-01 02:00:00"]),   # empty interval
        "label": ["x", "empty"],
    }))
    got = (joins.range_join(points, intervals, bucket_seconds=3600)
           .toPandas())
    assert sorted(got.v) == [0]            # 01:00:00 excluded (end-exclusive)
    assert "empty" not in set(got.label)   # degenerate interval matches none


def test_position_stops_match_sequential_manager(spark):
    """Parity vs a sequential port of the reference StopLossManager
    (risk_monitor.py:415-538; mirrors test_risk_monitor.py:263-288 plus
    entry-stop and short-side cases): per row, set_initial_stop at entry,
    update_trailing_stop, check_stop_hit — the vectorized window algebra
    must reproduce the state machine exactly."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import risk as risk_ops

    ip, tp = 0.05, 0.03
    paths = {
        # long: rises (ratchet arms, moves up), then crashes through stop
        ("A", 0, "long"): [100, 104, 110, 108, 112, 107, 106.5, 120],
        # long: never beats entry -> initial stop only; grazes it
        ("A", 1, "long"): [100, 99, 96, 95.0, 97],
        # short: falls (ratchet arms, moves down), then rips through stop
        ("B", 0, "short"): [200, 195, 185, 188, 180, 187, 200],
        # short: never below entry -> initial stop only
        ("B", 1, "short"): [200, 204, 209, 210.0, 206],
    }
    rows = []
    for (sym, pid, side), prices in paths.items():
        for i, p in enumerate(prices):
            rows.append((sym, pid, side,
                         pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i),
                         float(p)))
    pdf = pd.DataFrame(rows, columns=["symbol", "position_id", "side",
                                      "ts", "close"])
    got = (
        risk_ops.position_stops(
            spark.createDataFrame(pdf).repartition(4),
            initial_stop_pct=ip, trailing_stop_pct=tp)
        .toPandas()
        .sort_values(["symbol", "position_id", "ts"])
        .reset_index(drop=True)
    )

    # sequential reference port
    exp_stop, exp_hit = [], []
    for (sym, pid, side), prices in paths.items():
        entry = prices[0]
        stop = entry * (1 - ip) if side == "long" else entry * (1 + ip)
        extreme = entry
        for p in prices:
            if side == "long":
                if p > extreme:
                    extreme = p
                    new = p * (1 - tp)
                    if new > stop:
                        stop = new
                hit = p <= stop
            else:
                if p < extreme:
                    extreme = p
                    new = p * (1 + tp)
                    if new < stop:
                        stop = new
                hit = p >= stop
            exp_stop.append(stop)
            exp_hit.append(hit)

    exp = pd.DataFrame(rows, columns=["symbol", "position_id", "side",
                                      "ts", "close"])
    exp["stop_price"] = exp_stop
    exp["stop_hit"] = exp_hit
    exp = (exp.sort_values(["symbol", "position_id", "ts"])
           .reset_index(drop=True))
    np.testing.assert_allclose(got.stop_price, exp.stop_price, rtol=1e-12)
    assert (got.stop_hit == exp.stop_hit).all()

    # first_hit / active bookkeeping: A/0's stop ratchets to 112*0.97 =
    # 108.64, first pierced by the 107 print (index 5); inactive from there
    a0 = got[(got.symbol == "A") & (got.position_id == 0)]
    assert a0.first_hit_ts.notna().all()
    assert a0.active.tolist() == [True] * 5 + [False] * 3
    # A/1 grazes exactly 95.0 == initial stop -> hit (<=)
    a1 = got[(got.symbol == "A") & (got.position_id == 1)]
    assert a1.stop_hit.tolist() == [False, False, False, True, False]


def test_rl_strategy_signals_match_sequential(spark):
    """rl_strategy_signals must reproduce the reference loop
    (ml_strategy.py:293-309): zeros through warm-up, then
    agent.predict(last state_size returns) per row."""
    rng = np.random.default_rng(11)
    n = 60
    pdf = pd.DataFrame({
        "symbol": ["A"] * n + ["B"] * n,
        "ts": list(pd.date_range("2024-01-01", periods=n, freq="1h")) * 2,
        "close": np.concatenate([
            100 * np.exp(np.cumsum(rng.normal(0, 0.01, n))),
            50 * np.exp(np.cumsum(rng.normal(0, 0.02, n))),
        ]),
    })

    class MeanSignAgent:
        def predict(self, state):
            m = state.mean()
            return 1 if m > 0 else (-1 if m < 0 else 0)

    got = (
        ml.rl_strategy_signals(
            spark.createDataFrame(pdf).repartition(4), MeanSignAgent(),
            state_size=10)
        .toPandas().sort_values(["symbol", "ts"]).reset_index(drop=True)
    )
    exp = []
    agent = MeanSignAgent()
    for sym, g in pdf.groupby("symbol", sort=True):
        g = g.sort_values("ts")
        rets = g.close.pct_change().fillna(0.0).to_numpy()
        for i in range(len(g)):
            if i < 10:
                exp.append(0)
            else:
                exp.append(agent.predict(rets[i - 10:i].reshape(1, -1)))
    assert got.signal.tolist() == exp
    assert (got.signal.iloc[:10] == 0).all()


def test_dashboard_http_surface():
    """Route parity with the reference Flask dashboard (dashboard.py:44-110)
    on the stdlib server: /, /api/<section>, /api/summary, POST /api/update."""
    import json
    import urllib.request

    from build_a_market_data_etl_strategy_backtesting_engine_spark.dashboard import Dashboard

    d = Dashboard()
    d.update(
        performance=[{"equity": 101000.0}],
        risk={"max_drawdown": -0.02},
        metrics_rows=[{"symbol": "A", "total_return": 0.01}],
        curves={"A": [1.0, 1.01, 1.02]},
    )
    port = d.start(port=0)
    base = f"http://127.0.0.1:{port}"
    try:
        perf = json.load(urllib.request.urlopen(f"{base}/api/performance"))
        assert perf == [{"equity": 101000.0}]
        summ = json.load(urllib.request.urlopen(f"{base}/api/summary"))
        assert summ["risk"] == {"max_drawdown": -0.02}
        assert summ["orders"] == []
        html_doc = urllib.request.urlopen(f"{base}/").read().decode()
        assert "svg" in html_doc and "A" in html_doc
        # POST /api/update replaces a section
        req = urllib.request.Request(
            f"{base}/api/update",
            data=json.dumps({"orders": [{"id": 1}]}).encode(),
            method="POST")
        assert json.load(urllib.request.urlopen(req)) == {"status": "ok"}
        got = json.load(urllib.request.urlopen(f"{base}/api/orders"))
        assert got == [{"id": 1}]
        # unknown endpoint -> 404
        try:
            urllib.request.urlopen(f"{base}/api/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        d.stop()


def test_order_book_cancel(spark):
    """Cancel removes a resting limit / armed stop before it can fill
    (order_book.py:109-123 remove_order semantics)."""
    schema = ("order_id string, ts timestamp, symbol string, side string, "
              "order_type string, quantity double, price double, "
              "stop_price double")
    orders = spark.createDataFrame([
        # resting buy limit, cancelled before the crossing tick
        ("o1", _ts(1), "A", "buy", "limit", 5.0, 99.0, None),
        ("c1", _ts(2), "A", None, "cancel", None, None, None),
        # armed stop, cancelled before its trigger
        ("o2", _ts(1), "B", "sell", "stop", 5.0, None, 95.0),
        ("c2", _ts(2), "B", None, "cancel", None, None, None),
        # identical uncancelled orders that DO fill
        ("o3", _ts(1), "C", "buy", "limit", 5.0, 99.0, None),
    ], schema)
    # cancel rows reference their target via order_id: rewrite c1/c2
    orders = orders.withColumn(
        "order_id",
        F.when(F.col("order_id") == "c1", "o1")
        .when(F.col("order_id") == "c2", "o2")
        .otherwise(F.col("order_id")))
    ticks = spark.createDataFrame([
        Row(ts=_ts(0), symbol=s, price=100.0) for s in "ABC"
    ] + [
        Row(ts=_ts(3), symbol=s, price=94.0) for s in "ABC"  # would trigger
    ])
    fills = orderbook.simulate_order_book(orders, ticks, slippage_pct=0.001)
    got = {(r.symbol, r.order_id) for r in fills.collect()}
    assert ("C", "o3") in got          # uncancelled twin fills
    assert ("A", "o1") not in got      # cancelled limit never fills
    assert ("B", "o2") not in got      # cancelled stop never triggers


def test_audio_features_pcm_decode(spark):
    """audio_features is a REAL decode: a synthesized int16 sine wave must
    come back with rms ~ A/sqrt(2), peak ~ A, exact sample count."""
    import math
    import struct

    import numpy as np

    sr = 16000
    n = sr // 4  # 250 ms
    amp = 0.5
    wave = [int(amp * 32767 * math.sin(2 * math.pi * 440 * i / sr))
            for i in range(n)]
    payload = struct.pack(f"<{n}h", *wave)
    from build_a_market_data_etl_strategy_backtesting_engine_spark.schemas import (
        MEDIA_SCHEMA,
    )

    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload), "t/a", None, None, None, {}),
         (2, "audio", bytearray(b""), "t/b", None, None, None, {}),
         (3, "image", bytearray(b"xx"), "t/c", None, None, None, {})],
        MEDIA_SCHEMA)
    rows = {r.media_id: r
            for r in multimodal.audio_features(media, sr).collect()}
    assert set(rows) == {1, 2}  # image row filtered out
    got = rows[1]
    assert got.n_samples == n
    assert got.duration_s == pytest.approx(0.25)
    assert got.rms == pytest.approx(amp / np.sqrt(2), rel=2e-3)
    assert got.peak == pytest.approx(amp, rel=2e-3)
    assert rows[2].n_samples == 0 and rows[2].rms == 0.0


def test_embedding_near_dups_empty_input(spark):
    # an empty corpus slice (legitimate in chunked/sampled runs —
    # found live by tools/qpair_chunk_sample.py on an sf1 chunk with
    # no vectors) must yield an empty pair frame, not a NoneType crash
    # on the dimension probe
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int")
    near = dedup.embedding_near_dups(emb, threshold=0.5, n_planes=4)
    assert near.columns == ["id_a", "id_b", "cosine"]
    assert near.count() == 0
