"""Explicit StructType schemas for every table shape in the engine.

The reference is convention-based (columns looked up by name at runtime,
``/root/reference/data_processing/resampler.py:48-57``); we declare schemas
once at the ingest boundary and keep the reference's column-optional behavior
by building aggregation expression lists from ``df.columns``.

Shapes from SURVEY.md §1.1 / reference citations:
- tick:   etl/normalizer.py:57-62, etl/database_writer.py:74-82
- quote:  etl/normalizer.py:90-97
- ohlcv:  data_processing/tick_to_ohlcv.py:51-57
- backtest results frame: backtesting/portfolio.py:209-218
- order:  backtesting/order_book.py:36-58
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TICK_SCHEMA = StructType([
    StructField("ts", TimestampType(), False),
    StructField("symbol", StringType(), False),
    StructField("price", DoubleType(), False),
    StructField("volume", DoubleType(), True),
])

QUOTE_SCHEMA = StructType([
    StructField("ts", TimestampType(), False),
    StructField("symbol", StringType(), False),
    StructField("bid_price", DoubleType(), True),
    StructField("ask_price", DoubleType(), True),
    StructField("bid_size", DoubleType(), True),
    StructField("ask_size", DoubleType(), True),
])

OHLCV_SCHEMA = StructType([
    StructField("symbol", StringType(), False),
    StructField("ts", TimestampType(), False),  # bar start, tumbling epoch-aligned
    StructField("open", DoubleType(), True),
    StructField("high", DoubleType(), True),
    StructField("low", DoubleType(), True),
    StructField("close", DoubleType(), True),
    StructField("volume", DoubleType(), True),
])

BACKTEST_RESULT_SCHEMA = StructType([
    StructField("symbol", StringType(), False),
    StructField("ts", TimestampType(), False),
    StructField("price", DoubleType(), True),
    StructField("signal", IntegerType(), True),
    StructField("position", DoubleType(), True),
    StructField("trade", DoubleType(), True),
    StructField("returns", DoubleType(), True),
    StructField("strategy_returns", DoubleType(), True),
    StructField("costs", DoubleType(), True),
    StructField("net_returns", DoubleType(), True),
    StructField("equity", DoubleType(), True),
])

ORDER_SCHEMA = StructType([
    StructField("order_id", StringType(), False),
    StructField("ts", TimestampType(), False),
    StructField("symbol", StringType(), False),
    StructField("side", StringType(), False),        # buy | sell
    StructField("order_type", StringType(), False),  # market | limit | stop | stop_limit
    StructField("quantity", DoubleType(), False),
    StructField("price", DoubleType(), True),
    StructField("stop_price", DoubleType(), True),
])

TRADE_SCHEMA = StructType([
    StructField("trade_id", StringType(), False),
    StructField("ts", TimestampType(), False),
    StructField("symbol", StringType(), False),
    StructField("side", StringType(), False),
    StructField("quantity", DoubleType(), False),
    StructField("price", DoubleType(), False),
    StructField("buy_order_id", StringType(), True),
    StructField("sell_order_id", StringType(), True),
])

RISK_ALERT_SCHEMA = StructType([
    StructField("ts", TimestampType(), False),
    StructField("alert_type", StringType(), False),
    StructField("level", StringType(), False),   # info | warning | critical
    StructField("symbol", StringType(), True),
    StructField("value", DoubleType(), True),
    StructField("threshold", DoubleType(), True),
    StructField("message", StringType(), True),
])

DOCUMENT_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("source", StringType(), True),
    StructField("n_chars", LongType(), True),
])

EMBEDDING_SCHEMA = StructType([
    StructField("vec_id", LongType(), False),
    StructField("embedding", ArrayType(FloatType()), True),
    StructField("label", IntegerType(), True),
])

# Multimodal: media payloads ride as opaque binary + typed metadata; decode /
# feature extraction happens in Arrow-batched pandas UDFs (operators/multimodal).
from pyspark.sql.types import BinaryType, MapType  # noqa: E402

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),          # image | audio | video
    StructField("content", BinaryType(), True),        # raw encoded bytes
    StructField("mime_type", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("meta", MapType(StringType(), StringType()), True),
])
