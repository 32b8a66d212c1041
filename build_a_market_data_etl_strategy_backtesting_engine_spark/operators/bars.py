"""Tick -> OHLCV bucketing and bar resampling.

Reference semantics (``/root/reference/data_processing/tick_to_ohlcv.py:23-108``,
``resampler.py:25-109``): bucket rows into fixed tumbling, epoch-aligned time
windows; per bucket open=first(price), high=max, low=min, close=last(price),
volume=sum; empty buckets dropped.

Spark design notes
------------------
- ``F.window(ts, freq)`` gives the identical epoch-aligned tumbling bucketing
  as pandas ``resample`` / polars ``group_by_dynamic`` defaults. Empty buckets
  simply never materialize (matches the reference's ``dropna``).
- first/last-in-bucket MUST NOT use ``F.first/F.last`` (order-nondeterministic
  under shuffle); we use ``min_by/max_by`` over a ``(ts, tiebreaker)`` struct,
  which is deterministic, shuffle-safe and stays in whole-stage codegen.
- One hash-aggregate, one shuffle on ``(symbol, window)`` — at 100TB this is a
  map-side-combinable aggregation, the cheapest shape Spark has. No windows,
  no sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# freq strings of the reference (tick_to_ohlcv.py:128-132) -> Spark intervals
FREQ_MAP = {
    "1min": "1 minute",
    "5min": "5 minutes",
    "15min": "15 minutes",
    "30min": "30 minutes",
    "1H": "1 hour",
    "1h": "1 hour",
    "4H": "4 hours",
    "1D": "1 day",
    "1d": "1 day",
    "1W": "1 week",
}


def to_interval(freq: str) -> str:
    """Map a pandas-style freq string (or pass through a Spark interval)."""
    return FREQ_MAP.get(freq, freq)


def _order_key(ts_col: str, tiebreaker: str | None) -> Column:
    if tiebreaker:
        return F.struct(F.col(ts_col), F.col(tiebreaker))
    return F.col(ts_col)


def ticks_to_ohlcv(
    ticks: DataFrame,
    freq: str = "1min",
    ts_col: str = "ts",
    symbol_col: str = "symbol",
    price_col: str = "price",
    volume_col: str | None = "volume",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Aggregate raw ticks into OHLCV bars.

    Output: ``(symbol, ts=bar start, open, high, low, close, volume, n_ticks)``.
    ``tiebreaker`` (e.g. a monotonic ingest id) makes first/last deterministic
    when two ticks share a timestamp — pandas keeps file order there
    (SURVEY §7.7.3); we require an explicit column instead.
    """
    key = _order_key(ts_col, tiebreaker)
    aggs = [
        F.min_by(price_col, key).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, key).alias("close"),
    ]
    if volume_col and volume_col in ticks.columns:
        aggs.append(F.sum(volume_col).alias("volume"))
    else:
        aggs.append(F.lit(0.0).alias("volume"))
    aggs.append(F.count(F.lit(1)).alias("n_ticks"))
    out = (
        ticks.groupBy(F.col(symbol_col).alias("symbol"),
                      F.window(ts_col, to_interval(freq)).alias("w"))
        .agg(*aggs)
        .select(
            "symbol",
            F.col("w.start").alias("ts"),
            "open", "high", "low", "close", "volume", "n_ticks",
        )
    )
    return out


# Default agg semantics for resampling already-barred data
# (resampler.py:37-45): first(open), max(high), min(low), last(close),
# sum(volume) — auto-restricted to the columns that exist.
def resample_ohlcv(
    bars: DataFrame,
    freq: str = "5min",
    ts_col: str = "ts",
    symbol_col: str = "symbol",
    agg_exprs: list[Column] | None = None,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Downsample OHLCV bars to a coarser frequency.

    ``agg_exprs`` lets callers inject custom aggregates exactly like the
    reference's ``agg_dict`` / ``agg_exprs`` hooks (resampler.py:29,68).
    """
    key = _order_key(ts_col, tiebreaker)
    if agg_exprs is None:
        agg_exprs = []
        cols = set(bars.columns)
        if "open" in cols:
            agg_exprs.append(F.min_by("open", key).alias("open"))
        if "high" in cols:
            agg_exprs.append(F.max("high").alias("high"))
        if "low" in cols:
            agg_exprs.append(F.min("low").alias("low"))
        if "close" in cols:
            agg_exprs.append(F.max_by("close", key).alias("close"))
        if "volume" in cols:
            agg_exprs.append(F.sum("volume").alias("volume"))
        if not agg_exprs:
            raise ValueError("no OHLCV columns found and no agg_exprs given")
    agged = bars.groupBy(
        F.col(symbol_col).alias("symbol"),
        F.window(ts_col, to_interval(freq)).alias("w"),
    ).agg(*agg_exprs)
    value_cols = [c for c in agged.columns if c not in ("symbol", "w")]
    return agged.select("symbol", F.col("w.start").alias("ts"), *value_cols)


def downsample_ohlcv(bars: DataFrame, freq: str, **kw) -> DataFrame:
    """Validation wrapper mirroring ``resampler.downsample_ohlcv``
    (resampler.py:239-262): requires the four price columns present."""
    missing = {"open", "high", "low", "close"} - set(bars.columns)
    if missing:
        raise ValueError(f"missing OHLCV columns: {sorted(missing)}")
    return resample_ohlcv(bars, freq=freq, **kw)
