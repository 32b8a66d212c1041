"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (ticks -> clean -> OHLCV ->
mean-reversion backtest -> metrics) on sf0.001. ``queries()`` /
``oracle_sql()`` expose the operator-coverage pairs from
``build_a_market_data_etl_strategy_backtesting_engine_spark.queries`` — each Spark query is built from engine
operators and hash-compared by the driver against the DuckDB SQL at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from build_a_market_data_etl_strategy_backtesting_engine_spark import queries as _q  # noqa: E402
from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (  # noqa: E402
    backtest,
    bars,
    cleaner,
    metrics,
    signals,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (  # noqa: E402
    events_as_ticks,
    load_tables,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: raw ticks -> clean ->
    1H OHLCV -> 20-bar/1.5σ mean-reversion -> vectorized backtest ->
    per-symbol performance metrics."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t = load_tables(spark, "/root/testdata/sf0.001", ["events"])
    ticks = events_as_ticks(t["events"])
    clean = cleaner.clean_pipeline(
        ticks, price_col="price", dedup_subset=["symbol", "ts"],
        min_price=0.01, outlier_method="iqr", outlier_k=3.0,
    )
    b = bars.ticks_to_ohlcv(clean, "1H", tiebreaker="seq")
    import pyspark.sql.functions as F

    px = b.withColumn("px", F.lit(100.0) + F.col("close") / F.lit(10.0))
    sig = signals.mean_reversion_signal(px, n=20, num_std=1.5, price_col="px")
    res = backtest.backtest_signals(sig, initial_cash=100_000.0, price_col="px")
    return metrics.compute_metrics(res)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query."""
    return _q.oracle_queries()
