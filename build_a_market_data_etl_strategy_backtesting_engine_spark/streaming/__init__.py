"""Structured Streaming: live ingest, streaming OHLCV, stateful ops."""
