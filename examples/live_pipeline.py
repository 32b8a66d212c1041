"""Ticks -> bars -> signal -> backtest as a LIVE composed pipeline.

Both chained queries (streaming/pipeline.py) start TOGETHER on
processing-time triggers against a live rate-source feed — the
production shape with a durable bar log in the middle. Watch the equity
curve extend per micro-batch.

Run:  python examples/live_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_a_market_data_etl_strategy_backtesting_engine_spark.session import get_spark
from build_a_market_data_etl_strategy_backtesting_engine_spark.sources.normalizer import (
    normalize_trades,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming import pipeline
from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming.ingest import (
    rate_tick_source,
)


def main():
    spark = get_spark("live-pipeline", master="local[8]")
    wd = tempfile.mkdtemp(prefix="live_pipe_")
    raw = rate_tick_source(spark, rows_per_second=500)
    ticks = normalize_trades(raw)
    # 5s bars, 0s watermark (rate source is in-order); both queries live
    q1 = pipeline.start_bar_stage(
        ticks, wd, freq="5 seconds", watermark="0 seconds",
        trigger={"processingTime": "2 seconds"})
    q2 = pipeline.start_backtest_stage(
        spark, wd, query_name="live_equity",
        trigger={"processingTime": "2 seconds"})
    try:
        for _ in range(10):
            time.sleep(3)
            n = spark.sql("SELECT count(*) c FROM live_equity").first().c
            print(f"backtest rows so far: {n}")
        print("\nlatest equity per symbol:")
        spark.sql(
            "SELECT symbol, max_by(equity, ts) AS equity, count(*) AS bars"
            " FROM live_equity GROUP BY symbol ORDER BY symbol").show()
    finally:
        q2.stop()
        q1.stop()
        spark.stop()


if __name__ == "__main__":
    main()
