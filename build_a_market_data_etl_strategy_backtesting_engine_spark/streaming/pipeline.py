"""Live end-to-end pipeline: ticks -> bars -> signal -> backtest, streaming.

The reference's full loop (feed -> clean -> bars -> strategy -> portfolio,
``example.py`` / ``paper_trading.py``) as Structured Streaming. Spark does
NOT allow an arbitrary stateful operator (`applyInPandasWithState`) after
a streaming aggregation in append mode, so the composition is the standard
production shape: TWO chained queries with a durable, replayable
intermediate (parquet here; Kafka/Delta on a cluster):

    query 1: raw ticks --streaming_ohlcv (watermarked agg)--> bars sink
    query 2: bars sink --signal (stateless)--> streaming_backtest -> out

Each stage is exactly the operator the batch path uses, so the composed
stream equals the composed batch pipeline row-for-row (pinned in
tests/test_streaming.py::test_live_pipeline_matches_batch). Bars finalize
when the watermark passes their window end — a quiescent feed holds back
its last window until a newer event (or a heartbeat tick) advances the
watermark; that is append-mode semantics, not a defect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming.ohlcv import (
    streaming_ohlcv,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming.stateful import (
    streaming_backtest,
)

BAR_SCHEMA = ("symbol string, ts timestamp, open double, high double, "
              "low double, close double, volume double, n_ticks long")


def start_bar_stage(
    ticks: DataFrame,
    workdir: str,
    freq: str = "1min",
    watermark: str = "0 seconds",
    trigger: dict | None = None,
):
    """Query 1: watermarked streaming OHLCV appended to the durable bar
    log at ``workdir/bars`` (checkpoint alongside)."""
    bars = streaming_ohlcv(ticks, freq, watermark=watermark)
    writer = (
        bars.writeStream.format("parquet")
        .option("path", os.path.join(workdir, "bars"))
        .option("checkpointLocation", os.path.join(workdir, "ckpt_bars"))
        .outputMode("append")
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()


def start_backtest_stage(
    spark: SparkSession,
    workdir: str,
    signal_expr=None,
    query_name: str = "live_backtest",
    trigger: dict | None = None,
    **kernel_kwargs,
):
    """Query 2: tail the bar log, annotate the (stateless) signal, run the
    stateful vectorized kernel, land results in a memory sink.

    ``signal_expr``: a Column over the bar columns (default: up-bar long /
    down-bar short). Stateless by construction — windowed signals belong
    in the bar stage where the watermark governs them."""
    # both queries can start together on a live trigger: the file-stream
    # source requires the path to exist before query 1 commits its first
    # micro-batch
    os.makedirs(os.path.join(workdir, "bars"), exist_ok=True)
    bars = (
        spark.readStream.schema(BAR_SCHEMA)
        .parquet(os.path.join(workdir, "bars"))
    )
    if signal_expr is None:
        signal_expr = F.when(F.col("close") > F.col("open"), 1.0) \
            .otherwise(-1.0)
    sig = bars.withColumn("signal", signal_expr)
    out = streaming_backtest(sig, **kernel_kwargs)
    writer = (
        out.writeStream.format("memory").queryName(query_name)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_bt"))
        .outputMode("append")
    )
    return writer.trigger(**(trigger or {"availableNow": True})).start()
