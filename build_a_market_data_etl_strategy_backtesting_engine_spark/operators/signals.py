"""Indicators + trading-signal generation as pure window expressions.

Reference: ``/root/reference/backtesting/strategy.py`` (mean-reversion :69-111,
MA-cross :114-153, momentum :178-194, buy&hold :197-215) and the indicator set
of ``backtesting/ml_strategy.py:125-175`` (RSI, MACD, Bollinger, rolling vol,
volume ratio).

pandas-parity rules (SURVEY §7.7.7):
- ``rolling(N)`` yields NaN for the first N-1 rows and NaN comparisons are
  False in signal masks. Spark's ``avg().over(rowsBetween(-(N-1),0))`` yields
  partial-window values instead, so every rolling expression is gated with
  ``row_number() >= N`` -> NULL during warm-up; ``when`` treats NULL
  comparisons as false exactly like the pandas NaN masks.
- every window has an explicit orderBy; all state is per-symbol
  (``partitionBy(symbol)``) so a thousand symbols parallelize across the
  cluster and one sort per symbol-partition is the only shuffle.

A "strategy" in this engine is any function ``DataFrame -> DataFrame`` adding
a ``signal`` int column in {-1, 0, 1}; these are the built-ins, and arbitrary
user pandas logic plugs in through ``apply_pandas_strategy`` (the reference's
``BaseStrategy.generate_signals`` subclass hook, strategy.py:34-41).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sym_window(symbol_col: str = "symbol", ts_col: str = "ts") -> Window:
    return Window.partitionBy(symbol_col).orderBy(ts_col)


def _rn(w) -> Column:
    return F.row_number().over(w)


def rolling_mean(col: str, n: int, w) -> Column:
    """pandas ``rolling(n).mean()``: NULL for the first n-1 rows."""
    frame = w.rowsBetween(-(n - 1), 0)
    return F.when(_rn(w) >= n, F.avg(col).over(frame))


def rolling_std(col: str, n: int, w) -> Column:
    """pandas ``rolling(n).std()`` (sample std), NULL warm-up."""
    frame = w.rowsBetween(-(n - 1), 0)
    return F.when(_rn(w) >= n, F.stddev_samp(col).over(frame))


def rolling_sum(col: str, n: int, w) -> Column:
    frame = w.rowsBetween(-(n - 1), 0)
    return F.when(_rn(w) >= n, F.sum(col).over(frame))


def pct_change(col: str, w, periods: int = 1) -> Column:
    """``col / lag(col, n) - 1`` — NULL on warm-up rows like pandas.

    A zero lag value follows pandas float semantics (x/0 -> ±inf,
    0/0 -> NaN) instead of throwing under ANSI mode (Spark 4 default —
    found by the parameter fuzzer on an all-zero-volume window, the
    same crash class as with_volume_ratio)."""
    prev = F.lag(col, periods).over(w)
    c = F.col(col)
    return (
        F.when(prev != 0, c / prev - 1)
        .when(prev.isNull(), F.lit(None).cast("double"))
        .when(c > 0, F.lit(float("inf")))
        .when(c < 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )


def _fresh(df: DataFrame, *bases: str) -> list[str]:
    """Collision-free staging-column names: suffix with a counter while
    the candidate is taken (r8 ADVICE — withColumn+drop on a FIXED temp
    name silently destroys a same-named caller column)."""
    taken = set(df.columns)
    out = []
    for b in bases:
        name, i = b, 0
        while name in taken:
            i += 1
            name = f"{b}{i}"
        taken.add(name)
        out.append(name)
    return out


def with_pct_change(df: DataFrame, col: str, w, periods: int = 1,
                    out_col: str = "_pct") -> DataFrame:
    """:func:`pct_change` with the lag hoisted into a projection: the
    Column form references ``lag`` in three CASE branches and Catalyst
    computes a separate window expression for each reference, so callers
    that then reference the result twice pay 6 lags. Materializing
    ``lag`` once makes the CASE pure scalar codegen over it."""
    (pc_prev,) = _fresh(df, "_pc_prev")
    prev = F.col(pc_prev)
    c = F.col(col)
    expr = (
        F.when(prev != 0, c / prev - 1)
        .when(prev.isNull(), F.lit(None).cast("double"))
        .when(c > 0, F.lit(float("inf")))
        .when(c < 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )
    return (df.withColumn(pc_prev, F.lag(col, periods).over(w))
              .withColumn(out_col, expr).drop(pc_prev))


def simple_returns(df: DataFrame, price_col: str = "close",
                   symbol_col: str = "symbol", ts_col: str = "ts",
                   out_col: str = "returns", fill_first: bool = True) -> DataFrame:
    """Per-symbol simple returns; first row 0 where the reference fills
    (portfolio.py:193 ``pct_change().fillna(0)``)."""
    w = sym_window(symbol_col, ts_col)
    df = with_pct_change(df, price_col, w, out_col=out_col)
    if fill_first:
        df = df.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0.0)))
    return df


# ---------------------------------------------------------------- indicators

def with_rsi(df: DataFrame, n: int = 14, price_col: str = "close",
             symbol_col: str = "symbol", ts_col: str = "ts",
             out_col: str = "rsi") -> DataFrame:
    """Simple-average RSI (NOT Wilder smoothing), matching
    ``ml_strategy.py:144-149``: gain = mean_n(max(delta,0)),
    loss = mean_n(max(-delta,0)), rsi = 100 - 100/(1+gain/loss)."""
    w = sym_window(symbol_col, ts_col)
    # hoist every window result before the CASEs (each Column reference
    # is a separate window expression to Catalyst: the inlined form paid
    # 6 lags + 10 rn/avg pairs; this pays 1 lag + 2 rn + 2 avg)
    c_prev, c_gain, c_loss, c_g, c_l = _fresh(
        df, "_rsi_prev", "_gain", "_loss", "_g", "_l")
    df = df.withColumn(c_prev, F.lag(price_col, 1).over(w))
    delta = F.col(price_col) - F.col(c_prev)
    df = df.withColumns({
        c_gain: F.when(delta > 0, delta).otherwise(
            F.when(delta.isNotNull(), F.lit(0.0))),
        c_loss: F.when(delta < 0, -delta).otherwise(
            F.when(delta.isNotNull(), F.lit(0.0))),
    })
    # pandas: delta has 1 NaN then rolling(n) -> first valid at row n+1
    frame = w.rowsBetween(-(n - 1), 0)
    df = df.withColumns({
        c_g: F.when(_rn(w) >= n + 1, F.avg(c_gain).over(frame)),
        c_l: F.when(_rn(w) >= n + 1, F.avg(c_loss).over(frame)),
    })
    gain, loss = F.col(c_g), F.col(c_l)
    rs = gain / loss
    rsi = F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + rs)
    # loss == 0, gain > 0 -> rs = inf -> pandas RSI = 100; but a fully flat
    # stretch (gain == 0 AND loss == 0) is pandas 0/0 = NaN -> NULL here,
    # not 100 — emitting 100 would flip overbought signals on constant prices.
    rsi = (
        F.when((loss == 0) & (gain == 0), F.lit(None).cast("double"))
        .when(loss == 0, F.lit(100.0))
        .otherwise(rsi)
    )
    return df.withColumn(out_col, rsi).drop(c_prev, c_gain, c_loss, c_g, c_l)


def with_bollinger(df: DataFrame, n: int = 20, k: float = 2.0,
                   price_col: str = "close", symbol_col: str = "symbol",
                   ts_col: str = "ts") -> DataFrame:
    """SMA_n +/- k*STD_n (ml_strategy.py:157-161)."""
    w = sym_window(symbol_col, ts_col)
    # bb_mid is reused by both bands: reference the materialized column
    # (inlining recomputes the avg window expression 3x and std 2x)
    (c_sd,) = _fresh(df, "_bb_sd")
    df = df.withColumns({"bb_mid": rolling_mean(price_col, n, w),
                         c_sd: rolling_std(price_col, n, w)})
    mid, sd = F.col("bb_mid"), F.col(c_sd)
    return (df.withColumns({"bb_upper": mid + k * sd,
                            "bb_lower": mid - k * sd})
              .drop(c_sd))


def with_rolling_volatility(df: DataFrame, n: int = 20,
                            price_col: str = "close",
                            symbol_col: str = "symbol", ts_col: str = "ts",
                            out_col: str = "volatility") -> DataFrame:
    """``pct_change().rolling(n).std()`` (ml_strategy.py:174-175)."""
    w = sym_window(symbol_col, ts_col)
    (c_r,) = _fresh(df, "_r")
    df = with_pct_change(df, price_col, w, out_col=c_r)
    # pandas: 1 NaN from pct_change, so first valid at row n+1
    frame = w.rowsBetween(-(n - 1), 0)
    vol = F.when(_rn(w) >= n + 1, F.stddev_samp(c_r).over(frame))
    return df.withColumn(out_col, vol).drop(c_r)


def with_volume_ratio(df: DataFrame, n: int = 20, volume_col: str = "volume",
                      symbol_col: str = "symbol", ts_col: str = "ts",
                      out_col: str = "volume_ratio") -> DataFrame:
    """volume / rolling(n).mean(volume) (ml_strategy.py:167-168).

    The window includes the current row, so mean == 0 implies
    volume == 0 — pandas emits 0/0 = NaN there; the bare division
    throws under ANSI mode (found by the parameter fuzzer: two
    consecutive zero-volume bars at n=2)."""
    w = sym_window(symbol_col, ts_col)
    (c_m,) = _fresh(df, "_vr_m")
    df = df.withColumn(c_m, rolling_mean(volume_col, n, w))
    m = F.col(c_m)  # hoisted: 3 CASE references = 1 window expr
    ratio = (F.when(m != 0, F.col(volume_col) / m)
             .when(m == 0, F.lit(float("nan"))))
    return df.withColumn(out_col, ratio).drop(c_m)


# ---------------------------------------------------------------- strategies

def mean_reversion_signal(df: DataFrame, n: int = 20, num_std: float = 2.0,
                          price_col: str = "close", symbol_col: str = "symbol",
                          ts_col: str = "ts", out_col: str = "signal") -> DataFrame:
    """z = (close - SMA_n)/STD_n; +1 if z < -k, -1 if z > k, else 0
    (strategy.py:69-111)."""
    w = sym_window(symbol_col, ts_col)
    # Materialize the window results ONCE: Catalyst does not dedup equal
    # window-expression instances, so inlining sd/mid into the z CASE and
    # z into the signal CASE computes stddev 4x and row_number 6x in the
    # Window operator (measured r8; the CASE itself is required — ANSI
    # mode throws DIVIDE_BY_ZERO even for doubles).
    c_sd, c_mid = _fresh(df, "_mr_sd", "_mr_mid")
    # one withColumns batch = one Catalyst analysis pass for both
    # independent window results (r12, guide §7.3)
    df = df.withColumns({c_sd: rolling_std(price_col, n, w),
                         c_mid: rolling_mean(price_col, n, w)})
    sd = F.col(c_sd)
    # sd == 0 (constant window) implies price == mean, so pandas z is
    # 0/0 = NaN and both comparisons are False -> signal 0. Emit NULL z
    # there: ANSI mode would throw on the division, and Spark's
    # NaN-sorts-greatest comparison rule would otherwise flip the
    # signal to -1 where pandas says 0.
    z = F.when(sd != 0, (F.col(price_col) - F.col(c_mid)) / sd)
    sig = (F.when(z < -num_std, 1).when(z > num_std, -1).otherwise(0)
           .cast("int"))
    return df.withColumn(out_col, sig).drop(c_sd, c_mid)


def ma_cross_signal(df: DataFrame, fast: int = 10, slow: int = 50,
                    price_col: str = "close", symbol_col: str = "symbol",
                    ts_col: str = "ts", out_col: str = "signal") -> DataFrame:
    """+1 while SMA_fast > SMA_slow else 0 (strategy.py:114-153)."""
    w = sym_window(symbol_col, ts_col)
    f_ma = rolling_mean(price_col, fast, w)
    s_ma = rolling_mean(price_col, slow, w)
    sig = F.when(f_ma > s_ma, 1).otherwise(0).cast("int")
    return df.withColumn(out_col, sig)


def momentum_signal(df: DataFrame, lookback: int = 20, threshold: float = 0.0,
                    price_col: str = "close", symbol_col: str = "symbol",
                    ts_col: str = "ts", out_col: str = "signal") -> DataFrame:
    """N-period momentum: +1 if pct_change(lookback) > threshold, -1 if
    < -threshold (strategy.py:178-194)."""
    w = sym_window(symbol_col, ts_col)
    # hoisted: the Column-form pct_change referenced twice costs 6 lag
    # window expressions; this is 1 lag + scalar CASEs.
    (c_mom,) = _fresh(df, "_mom")
    df = with_pct_change(df, price_col, w, periods=lookback,
                         out_col=c_mom)
    mom = F.col(c_mom)
    sig = (F.when(mom > threshold, 1).when(mom < -threshold, -1).otherwise(0)
           .cast("int"))
    return df.withColumn(out_col, sig).drop(c_mom)


def buy_and_hold_signal(df: DataFrame, out_col: str = "signal") -> DataFrame:
    """Constant long (strategy.py:197-215)."""
    return df.withColumn(out_col, F.lit(1).cast("int"))


BUILTIN_STRATEGIES: dict[str, Callable[..., DataFrame]] = {
    "mean_reversion": mean_reversion_signal,
    "ma_cross": ma_cross_signal,
    "momentum": momentum_signal,
    "buy_and_hold": buy_and_hold_signal,
}


def apply_pandas_strategy(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.Series],
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    out_col: str = "signal",
) -> DataFrame:
    """User-extension hook: run arbitrary pandas signal logic per symbol.

    ``fn`` receives one symbol's bars as a ts-sorted pandas DataFrame and
    returns an int Series of signals — the Spark equivalent of subclassing
    ``BaseStrategy.generate_signals`` (strategy.py:34-41). Executes as an
    Arrow-batched GROUPED_MAP; each symbol is one group, so a wide universe
    scales out while any single symbol stays exact and sequential.
    """
    schema_str = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", `{out_col}` int"

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        pdf[out_col] = pd.Series(fn(pdf)).fillna(0).astype("int32")
        return pdf

    return df.groupBy(symbol_col).applyInPandas(_run, schema=schema_str)
