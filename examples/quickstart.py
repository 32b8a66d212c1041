#!/usr/bin/env python3
"""Quickstart: the reference's ``example.py`` pipeline on this engine.

generate seeded ticks -> clean -> 1min OHLCV -> resample 15min ->
mean-reversion backtest -> metrics -> HTML report.

Run:  python examples/quickstart.py [output.html]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_a_market_data_etl_strategy_backtesting_engine_spark import get_spark, report
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


def main(out_path: str = "/tmp/backtest_report.html") -> None:
    spark = get_spark("quickstart", shuffle_partitions=8)

    # 1. seeded synthetic ticks (deterministic across any parallelism)
    # trend=0: a per-tick drift compounds over 200k ticks into an e^20
    # price explosion the IQR fence would then shred — drift belongs at
    # bar scale, not tick scale, for long horizons.
    ticks = generate_mock_ticks(
        spark, {"AAPL": 150.0, "MSFT": 300.0}, n_ticks=200_000,
        tick_interval_ms=1000, volatility=0.0005, trend=0.0, seed=42,
    )

    # 2. clean: dedup -> price validation -> IQR outlier fence
    clean = cleaner.clean_pipeline(
        ticks, dedup_subset=["symbol", "ts"], outlier_method="iqr",
        outlier_k=3.0,
    )

    # 3. bars: ticks -> 1min OHLCV -> 15min
    b15 = bars.resample_ohlcv(
        bars.ticks_to_ohlcv(clean, "1min", tiebreaker="seq"), "15min")

    # 4. signal + vectorized backtest + metrics
    sig = signals.mean_reversion_signal(b15, n=20, num_std=2.0)
    res = backtest.backtest_signals(sig, initial_cash=100_000.0)
    m = metrics.compute_metrics(res)

    print(report.summary_table([r.asDict() for r in m.collect()]))
    report.create_report(res, m, out_path)
    print(f"\nHTML report: {out_path}")
    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/backtest_report.html"]))
