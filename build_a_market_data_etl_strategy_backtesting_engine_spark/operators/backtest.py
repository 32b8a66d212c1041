"""The vectorized backtest kernel — the engine's flagship composite query.

Reference dataflow (``/root/reference/backtesting/portfolio.py:169-220``,
9 steps, SURVEY §2.5):

1. left-join signals onto the price spine, missing -> 0
2. positions = signal * position_size
3. trades    = diff(position), first row = position
4. returns   = pct_change(price), first row -> 0
5. strategy_returns = lag(position) * returns          (no look-ahead)
6. costs     = abs(trades) * (commission + slippage)
7. net_returns = strategy_returns - costs
8. equity    = cumprod(1 + net_returns) * initial_cash
9. emit the results frame

Spark design: the whole kernel is ONE select over per-symbol windows — a
single sort-shuffle on ``(symbol)``, then every step runs inside whole-stage
codegen. cumprod has no native window aggregate; the standard idiom is
``exp(sum(log1p(x)) over unbounded-preceding)`` (valid because net returns are
> -1 by construction; SURVEY §7.7.1 — FP tolerance ~1e-9 relative vs an exact
sequential product).

The multi-asset variant keeps long format and adds one tiny aggregation by ts
(one row per bar), mirroring ``portfolio.py:222-271``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_COMMISSION = 0.001
DEFAULT_SLIPPAGE = 0.0005
DEFAULT_INITIAL_CASH = 1_000_000.0


def backtest_signals(
    prices: DataFrame,
    signals: DataFrame | None = None,
    position_size: float = 1.0,
    commission: float = DEFAULT_COMMISSION,
    slippage: float = DEFAULT_SLIPPAGE,
    initial_cash: float = DEFAULT_INITIAL_CASH,
    price_col: str = "close",
    signal_col: str = "signal",
    symbol_col: str = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """Run the 9-step vectorized kernel.

    ``prices``: long-format bars ``(symbol, ts, close, ...)``.
    ``signals``: either None (then ``prices`` must already carry
    ``signal_col``) or a frame ``(symbol, ts, signal)`` which is left-joined
    onto the price spine with missing signals -> 0 (portfolio.py:186).

    Returns the per-bar results frame
    ``(symbol, ts, price, signal, position, trade, returns, strategy_returns,
    costs, net_returns, equity)``.
    """
    if signals is not None:
        sig = signals.select(
            F.col(symbol_col).alias(symbol_col),
            F.col(ts_col).alias(ts_col),
            F.col(signal_col).alias("_sig_in"),
        )
        base = prices.join(sig, on=[symbol_col, ts_col], how="left")
        sig_expr = F.coalesce(F.col("_sig_in"), F.lit(0))
    else:
        base = prices
        sig_expr = F.coalesce(F.col(signal_col), F.lit(0))

    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    position = (sig_expr * F.lit(float(position_size))).cast("double")
    out = base.select(
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("ts"),
        F.col(price_col).cast("double").alias("price"),
        sig_expr.cast("int").alias("signal"),
        position.alias("position"),
    )
    trade = F.col("position") - F.coalesce(F.lag("position", 1).over(w), F.lit(0.0))
    returns = F.coalesce(F.col("price") / F.lag("price", 1).over(w) - 1, F.lit(0.0))
    out = (
        out.withColumn("trade", trade)
        .withColumn("returns", returns)
        .withColumn(
            "strategy_returns",
            F.coalesce(F.lag("position", 1).over(w), F.lit(0.0)) * F.col("returns"),
        )
        .withColumn(
            "costs",
            F.abs(F.col("trade")) * F.lit(float(commission) + float(slippage)),
        )
        .withColumn("net_returns", F.col("strategy_returns") - F.col("costs"))
        .withColumn(
            "equity",
            F.exp(F.sum(F.log1p("net_returns")).over(w_all))
            * F.lit(float(initial_cash)),
        )
    )
    return out


def backtest_multi_asset(
    prices: DataFrame,
    signals: DataFrame | None = None,
    weights: DataFrame | None = None,
    commission: float = DEFAULT_COMMISSION,
    slippage: float = DEFAULT_SLIPPAGE,
    initial_cash: float = DEFAULT_INITIAL_CASH,
    price_col: str = "close",
    signal_col: str = "signal",
    symbol_col: str = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """Portfolio-level backtest over many symbols (portfolio.py:222-271).

    ``weights``: optional ``(symbol, weight)`` frame; default equal weight
    1/n_symbols (portfolio.py:238-245). Broadcast-joined (tiny dim table).

    Per-symbol steps 2-7 run in parallel per symbol; the cross-asset row sum
    is a ``groupBy(ts)`` over (n_symbols) rows per bar; the final portfolio
    cumprod orders a single tiny series (one row per bar).

    Returns ``(ts, strategy_returns, costs, net_returns, equity)``.
    """
    if weights is None:
        n = prices.select(symbol_col).distinct().count()
        per_asset = backtest_signals(
            prices, signals, position_size=1.0 / n,
            commission=commission, slippage=slippage, initial_cash=initial_cash,
            price_col=price_col, signal_col=signal_col,
            symbol_col=symbol_col, ts_col=ts_col,
        )
    else:
        wdf = weights.select(F.col(symbol_col), F.col("weight"))
        joined = prices.join(F.broadcast(wdf), on=symbol_col, how="left")
        joined = joined.withColumn("weight", F.coalesce("weight", F.lit(0.0)))
        # fold the weight into the signal path by pre-scaling the signal
        per_asset = backtest_signals(
            joined.withColumn("_wsig", F.col(signal_col) * F.col("weight")),
            None, position_size=1.0,
            commission=commission, slippage=slippage, initial_cash=initial_cash,
            price_col=price_col, signal_col="_wsig",
            symbol_col=symbol_col, ts_col=ts_col,
        )
    port = (
        per_asset.groupBy("ts")
        .agg(
            F.sum("strategy_returns").alias("strategy_returns"),
            F.sum("costs").alias("costs"),
        )
        .withColumn("net_returns", F.col("strategy_returns") - F.col("costs"))
    )
    w_all = (
        Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return port.withColumn(
        "equity",
        F.exp(F.sum(F.log1p("net_returns")).over(w_all)) * F.lit(float(initial_cash)),
    )
