"""PySpark-native market-data ETL + strategy-backtesting engine.

A ground-up re-expression of the capabilities of the reference engine
(``ambicuity/Build-a-Market-Data-ETL-Strategy-Backtesting-Engine``) on idiomatic
Spark: DataFrame/SQL logical plans optimized by Catalyst, window functions for
the per-symbol time-series algebra, Structured Streaming for live ingest, and
Pandas UDFs only where built-ins cannot express the semantics (EWM smoothing,
event-driven simulation).

Layout
------
- ``session``    : SparkSession builder with scale-ready defaults (AQE, Arrow).
- ``schemas``    : every table shape declared once as an explicit StructType.
- ``sources``    : normalizer (raw JSON feed -> ticks), seeded tick generator,
                   batch readers/writers.
- ``operators``  : cleaning, tick->OHLCV bars, signal generation, the
                   vectorized backtest kernel, performance metrics, risk,
                   dedup / similarity / text analysis for large-scale corpus
                   pipelines, event-driven simulation.
- ``functions``  : scalar column expression libraries (Black-Scholes, math,
                   EWM helpers) registered as SQL functions.
- ``streaming``  : Structured Streaming ingest + streaming OHLCV.
- ``plans``      : plan-inspection helpers (pushdown/codegen assertions).

Everything operates on long-format DataFrames ``(symbol, ts, ...)``; wide
matrices appear only at driver edges (portfolio optimization's k x k
covariance).
"""

__version__ = "0.1.0"

from build_a_market_data_etl_strategy_backtesting_engine_spark.session import get_spark  # noqa: F401
