"""Corporate-action price adjustment: split and cash-dividend
back-adjustment of OHLCV series (CRSP-style multiplicative factors).

Beyond-reference operator (the reference backtests raw closes; any
multi-year equity backtest needs split/dividend-adjusted series or every
split day looks like a -50% return). The adjustment is the standard
backward-cumulative factor method:

- split ``ratio`` r effective at time t: every bar strictly BEFORE t is
  divided by r (a 2:1 split halves all pre-split prices);
- cash dividend d effective at t (ex-date): every bar strictly before t
  is multiplied by ``1 - d / close_prev`` where ``close_prev`` is the
  last close before the ex-date (the proportional price-drop factor).

Shape at 100 TB: corporate actions are an inherently tiny dimension
(thousands of rows for a whole market), so action rows are UNIONED into
the bar stream and the per-bar factor is ``exp(sum(log r))`` over the
bar's future rows within a per-symbol window — the same union-and-window
as-of idiom as ``joins.asof_join``: one (symbol, ts) sort of the fact
table, no inequality join, no join-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_factors(
    actions: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "effective_ts",
    ratio_col: str = "ratio",
) -> DataFrame:
    """Per-action cumulative adjustment factor: for each action, the
    product of its own and all LATER ratios for the symbol (a bar is
    divided by the factor of the next action at-or-after it). Actions
    tables are small — the window sort is per-symbol over a handful of
    rows."""
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(F.col(ts_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return actions.withColumn(
        "cum_factor", F.exp(F.sum(F.log(ratio_col)).over(w))
    )


def adjust_for_splits(
    bars: DataFrame,
    splits: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_cols: tuple[str, ...] = ("close",),
    split_ts_col: str = "effective_ts",
    ratio_col: str = "ratio",
) -> DataFrame:
    """Back-adjust ``price_cols`` for splits: each bar is divided by the
    product of all split ratios with ``effective_ts > bar.ts`` (a bar AT
    the effective instant is already post-split). Same union-and-window
    as-of idiom as the dividend path: split rows are unioned into the bar
    stream and the factor is ``exp(sum(log ratio))`` over each bar's
    future rows — ONE per-symbol window sort of the fact table, no
    inequality join, no second shuffle. Emits the input columns +
    ``factor`` + ``adj_<col>``."""
    b = bars.select(
        "*", F.lit(None).cast("double").alias("_ratio"),
        F.lit(1).alias("_is_bar"),
    )
    s = splits.select(
        F.col(symbol_col), F.col(split_ts_col).alias(ts_col),
        F.col(ratio_col).cast("double").alias("_ratio"),
        F.lit(0).alias("_is_bar"),
    )
    # bar payload columns ride the union as NULLs on split rows, so the
    # factor attaches without any join-back — one window sort total
    u = b.unionByName(s, allowMissingColumns=True)
    # split rows sort before bar rows at the same ts (_is_bar asc) so a
    # bar at the effective instant sees the split as "not after"
    w_after = (
        Window.partitionBy(symbol_col).orderBy(ts_col, "_is_bar")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    out = (
        u.withColumn(
            "factor",
            F.coalesce(
                F.exp(F.sum(F.log("_ratio")).over(w_after)), F.lit(1.0)
            ),
        )
        .where(F.col("_is_bar") == 1)
        .drop("_ratio", "_is_bar")
    )
    for c in price_cols:
        out = out.withColumn(f"adj_{c}", F.col(c) / F.col("factor"))
    return out


def adjust_for_dividends(
    bars: DataFrame,
    dividends: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_cols: tuple[str, ...] = ("close",),
    div_ts_col: str = "ex_ts",
    amount_col: str = "amount",
    close_col: str = "close",
) -> DataFrame:
    """Back-adjust for cash dividends with the proportional factor
    ``1 - amount / close_prev`` (close_prev = last close strictly before
    the ex-date, resolved with a per-symbol window over the union — the
    as-of idiom, one sort, no inequality join on the fact table). Bars
    before an ex-date are MULTIPLIED by its factor (adjusted prices are
    lower, total-return convention). Emits input columns + ``div_factor``
    + ``adj_<col>``. Dividends with no prior close (nothing to divide by)
    are skipped. Both windows share ONE (symbol, ts) sort — no join-back,
    one shuffle total."""
    b = bars.select(
        "*", F.lit(None).cast("double").alias("_amount"),
        F.lit(1).alias("_is_bar"),
    )
    d = dividends.select(
        F.col(symbol_col), F.col(div_ts_col).alias(ts_col),
        F.col(amount_col).cast("double").alias("_amount"),
        F.lit(0).alias("_is_bar"),
    )
    u = b.unionByName(d, allowMissingColumns=True)
    # dividend rows sort before bar rows at the same ts (_is_bar asc) so
    # "strictly before" holds even on ts collisions
    w_past = (
        Window.partitionBy(symbol_col).orderBy(ts_col, "_is_bar")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fac = u.withColumn(
        "_prev_close", F.last(close_col, ignorenulls=True).over(w_past)
    ).withColumn(
        "_f",
        F.when(
            (F.col("_is_bar") == 0) & (F.col("_prev_close") > 0),
            1.0 - F.col("_amount") / F.col("_prev_close"),
        ),
    )
    # per bar: product of factors of all LATER dividends for the symbol
    w_after = (
        Window.partitionBy(symbol_col).orderBy(ts_col, "_is_bar")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    out = (
        fac.withColumn(
            "div_factor",
            F.coalesce(
                F.exp(F.sum(F.log("_f")).over(w_after)), F.lit(1.0)
            ),
        )
        .where(F.col("_is_bar") == 1)
        .drop("_amount", "_is_bar", "_prev_close", "_f")
    )
    for c in price_cols:
        out = out.withColumn(
            f"adj_{c}", F.col(c) * F.col("div_factor")
        )
    return out
