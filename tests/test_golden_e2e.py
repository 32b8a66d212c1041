"""Seeded golden end-to-end test (SURVEY §5.2.3): the reference's
``example.py`` pipeline — generate -> clean -> 1min OHLCV -> resample ->
mean-reversion backtest -> metrics — with pinned expected values.

Any semantic drift in ANY stage (generator hashing, dedup ordering, bucket
alignment, warm-up gating, kernel algebra, metric formulas) breaks these
pins. Tolerances: exact for counts/streaks, 1e-9 relative for
cumprod-derived floats (FIXTURES.md tolerance table)."""

from __future__ import annotations

import pytest

from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    backtest,
    bars,
    cleaner,
    metrics,
    signals,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.sources.generator import (
    generate_mock_ticks,
)

# (symbol, n_periods, total_return, sharpe, max_dd, trades, win_rate,
#  max_wins, max_losses) — pinned from the seeded run
GOLDEN = {
    "AAPL": (223, -0.06153084797661901, -0.8781249466803082,
             -0.09243919565044854, 28, 0.2926829268292683, 2, 7),
    "MSFT": (223, -0.07120156920563359, -1.6863663336665131,
             -0.09870143652636217, 26, 0.25, 1, 5),
}


@pytest.fixture(scope="module")
def golden_metrics(spark):
    ticks = generate_mock_ticks(
        spark, {"AAPL": 150.0, "MSFT": 300.0}, n_ticks=200_000,
        tick_interval_ms=1000, volatility=0.0005, trend=0.0, seed=42,
    )
    clean = cleaner.clean_pipeline(
        ticks, dedup_subset=["symbol", "ts"], outlier_method="iqr",
        outlier_k=3.0,
    )
    b1 = bars.ticks_to_ohlcv(clean, "1min", tiebreaker="seq")
    b15 = bars.resample_ohlcv(b1, "15min")
    sig = signals.mean_reversion_signal(b15, n=20, num_std=2.0)
    res = backtest.backtest_signals(sig, initial_cash=100_000.0)
    return {m.symbol: m for m in metrics.compute_metrics(res).collect()}


def test_golden_pipeline_values(golden_metrics):
    assert set(golden_metrics) == set(GOLDEN)
    for sym, (n, tr, sharpe, dd, trades, wr, mw, ml) in GOLDEN.items():
        m = golden_metrics[sym]
        assert m.n_periods == n
        assert m.total_return == pytest.approx(tr, rel=1e-9)
        assert m.sharpe_ratio == pytest.approx(sharpe, rel=1e-9)
        assert m.max_drawdown == pytest.approx(dd, rel=1e-9)
        assert m.num_trades == trades
        assert m.win_rate == pytest.approx(wr, rel=1e-12)
        assert m.max_consecutive_wins == mw
        assert m.max_consecutive_losses == ml


def test_golden_sanity_invariants(golden_metrics):
    for m in golden_metrics.values():
        assert m.max_drawdown <= 0
        assert 0 <= m.win_rate <= 1
        assert 0 <= m.exposure <= 1
