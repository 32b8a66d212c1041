"""Risk monitoring: VaR/CVaR, alert rules, position sizing, trailing stops.

Reference: ``/root/reference/backtesting/risk_monitor.py`` — VaR (:56-73),
CVaR (:75-93), drawdown series (:95-106), position-limit alert (:120-153),
drawdown-breach alert (:155-186), daily-loss alert (:188-222), combined
monitor (:224-276), Kelly (:332-358), volatility targeting (:360-383),
fixed-risk sizing (:385-412), trailing-stop state machine (:415-538).

Spark design: VaR uses the exact interpolating ``percentile`` (pandas-parity,
SURVEY §7.7.8); alerts are ``when``-filters emitting rows of an alerts
DataFrame (RISK_ALERT_SCHEMA); the trailing-stop ratchet vectorizes as a
running max — no state machine needed in batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_at_risk(
    returns: DataFrame,
    confidence: float = 0.95,
    returns_col: str = "net_returns",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """VaR = quantile(returns, 1 - confidence), exact linear interpolation
    (risk_monitor.py:56-73)."""
    qexpr = F.expr(f"percentile({returns_col}, {1.0 - confidence!r})").alias("var")
    if group_cols:
        return returns.groupBy(*group_cols).agg(qexpr)
    return returns.agg(qexpr)


def conditional_var(
    returns: DataFrame,
    confidence: float = 0.95,
    returns_col: str = "net_returns",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """CVaR = mean of returns <= VaR (risk_monitor.py:75-93). Two-pass:
    the VaR scalar(s) broadcast back onto the returns."""
    v = value_at_risk(returns, confidence, returns_col, group_cols)
    if group_cols:
        joined = returns.join(F.broadcast(v), on=group_cols)
        return joined.groupBy(*group_cols).agg(
            F.min("var").alias("var"),
            F.avg(F.when(F.col(returns_col) <= F.col("var"),
                         F.col(returns_col))).alias("cvar"),
        )
    joined = returns.crossJoin(F.broadcast(v))
    return joined.agg(
        F.min("var").alias("var"),
        F.avg(F.when(F.col(returns_col) <= F.col("var"),
                     F.col(returns_col))).alias("cvar"),
    )


# ------------------------------------------------------------------ alerts

def position_limit_alerts(
    positions: DataFrame,
    portfolio_value: float,
    max_position_pct: float = 0.25,
    value_col: str = "position_value",
    symbol_col: str = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """abs(position_value)/portfolio > limit -> warning; > 1.5x -> critical
    (risk_monitor.py:120-153)."""
    frac = F.abs(F.col(value_col)) / F.lit(float(portfolio_value))
    level = (
        F.when(frac > max_position_pct * 1.5, F.lit("critical"))
        .when(frac > max_position_pct, F.lit("warning"))
    )
    return (
        positions.withColumn("level", level)
        .filter(F.col("level").isNotNull())
        .select(
            F.col(ts_col).alias("ts"),
            F.lit("position_limit").alias("alert_type"),
            "level",
            F.col(symbol_col).alias("symbol"),
            frac.alias("value"),
            F.lit(float(max_position_pct)).alias("threshold"),
            F.concat(F.lit("position "), F.col(symbol_col),
                     F.lit(" exceeds limit")).alias("message"),
        )
    )


def drawdown_alerts(
    results: DataFrame,
    max_drawdown_pct: float = 0.20,
    equity_col: str = "equity",
    symbol_col: str | None = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """Drawdown breach per bar (risk_monitor.py:155-186): warning past the
    limit, critical past 1.5x."""
    group = [symbol_col] if symbol_col else []
    w_all = (
        Window.partitionBy(*group).orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runmax = F.max(equity_col).over(w_all)
    dd = (F.col(equity_col) - runmax) / runmax
    level = (
        F.when(dd < -max_drawdown_pct * 1.5, F.lit("critical"))
        .when(dd < -max_drawdown_pct, F.lit("warning"))
    )
    out = results.withColumn("_dd", dd).withColumn("level", level).filter(
        F.col("level").isNotNull()
    )
    return out.select(
        F.col(ts_col).alias("ts"),
        F.lit("drawdown").alias("alert_type"),
        "level",
        (F.col(symbol_col) if symbol_col else F.lit(None).cast("string"))
        .alias("symbol"),
        F.col("_dd").alias("value"),
        F.lit(-float(max_drawdown_pct)).alias("threshold"),
        F.lit("drawdown limit breached").alias("message"),
    )


def daily_loss_alerts(
    returns: DataFrame,
    max_daily_loss_pct: float = 0.05,
    returns_col: str = "net_returns",
    symbol_col: str | None = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-period loss breach (risk_monitor.py:188-222): loss beyond the
    limit -> warning, beyond 2x -> critical."""
    r = F.col(returns_col)
    level = (
        F.when(r < -max_daily_loss_pct * 2.0, F.lit("critical"))
        .when(r < -max_daily_loss_pct, F.lit("warning"))
    )
    out = returns.withColumn("level", level).filter(F.col("level").isNotNull())
    return out.select(
        F.col(ts_col).alias("ts"),
        F.lit("daily_loss").alias("alert_type"),
        "level",
        (F.col(symbol_col) if symbol_col else F.lit(None).cast("string"))
        .alias("symbol"),
        r.alias("value"),
        F.lit(-float(max_daily_loss_pct)).alias("threshold"),
        F.lit("daily loss limit breached").alias("message"),
    )


def monitor(
    results: DataFrame,
    max_drawdown_pct: float = 0.20,
    max_daily_loss_pct: float = 0.05,
    returns_col: str = "net_returns",
    equity_col: str = "equity",
    symbol_col: str | None = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """Combined alert stream (risk_monitor.py:224-276): union of rule outputs."""
    return drawdown_alerts(
        results, max_drawdown_pct, equity_col, symbol_col, ts_col
    ).unionByName(
        daily_loss_alerts(results, max_daily_loss_pct, returns_col,
                          symbol_col, ts_col)
    )


# --------------------------------------------------------- position sizing

def kelly_fraction(win_rate: Column, avg_win: Column, avg_loss: Column) -> Column:
    """Quarter-Kelly, capped at 25% (risk_monitor.py:332-358):
    f = (p*b - q)/b with b = avg_win/|avg_loss|, then f/4 clipped to [0, 0.25]."""
    b = avg_win / F.abs(avg_loss)
    f = (win_rate * b - (1 - win_rate)) / b
    quarter = f / 4.0
    return F.least(F.greatest(quarter, F.lit(0.0)), F.lit(0.25))


def volatility_target_size(
    target_vol: Column | float, realized_vol: Column, max_leverage: float = 2.0
) -> Column:
    """size = target_vol / realized_vol, capped (risk_monitor.py:360-383)."""
    t = F.lit(target_vol) if isinstance(target_vol, float) else target_vol
    return F.when(realized_vol > 0,
                  F.least(t / realized_vol, F.lit(float(max_leverage)))
                  ).otherwise(F.lit(0.0))


def fixed_risk_size(
    capital: Column | float, risk_pct: float, entry: Column, stop: Column
) -> Column:
    """shares = capital*risk_pct / |entry - stop| (risk_monitor.py:385-412)."""
    c = F.lit(capital) if isinstance(capital, float) else capital
    per_share = F.abs(entry - stop)
    return F.when(per_share > 0, c * F.lit(float(risk_pct)) / per_share
                  ).otherwise(F.lit(0.0))


def position_stops(
    prices: DataFrame,
    initial_stop_pct: float = 0.05,
    trailing_stop_pct: float = 0.03,
    price_col: str = "close",
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    position_col: str = "position_id",
    side_col: str | None = "side",
    entry_col: str | None = None,
) -> DataFrame:
    """Per-position stop-loss state machine (risk_monitor.py:415-538,
    StopLossManager), fully vectorized — the sequential set_initial_stop /
    update_trailing_stop / check_stop_hit loop collapses to window algebra
    over (symbol, position_id):

    - initial stop = entry * (1 - pct) long / (1 + pct) short
      (set_initial_stop, risk_monitor.py:434-457)
    - the trailing ratchet only arms once price beats the entry extreme
      (update_trailing_stop fires on current > highest only,
      risk_monitor.py:459-500), and never retreats — which is exactly
      running_max_since_entry * (1 - trail_pct) for longs (running min,
      1 + trail_pct for shorts)
    - effective stop = greatest(initial, armed trailing) long /
      least(...) short; hit when price crosses it (check_stop_hit,
      risk_monitor.py:502-528)

    ``side_col`` values are 'long'/'short' (None = all long). ``entry_col``
    names an explicit entry-price column; default is the position's first
    price. Emits ``entry_price, stop_price, stop_hit, first_hit_ts,
    active`` (active = no stop hit at or before this row, i.e. the position
    would still be held). One window sort per (symbol, position) partition —
    scales by partition count, no Python in the path."""
    w = Window.partitionBy(symbol_col, position_col).orderBy(ts_col)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = w.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    px = F.col(price_col)
    entry = (F.col(entry_col) if entry_col
             else F.first(price_col).over(w_all))
    is_long = (F.lit(True) if side_col is None
               else (F.col(side_col) == F.lit("long")))
    ip, tp = float(initial_stop_pct), float(trailing_stop_pct)
    init_stop = F.when(is_long, entry * (1.0 - ip)).otherwise(
        entry * (1.0 + ip))
    runmax = F.max(price_col).over(w_all)
    runmin = F.min(price_col).over(w_all)
    trail_long = F.when(runmax > entry, runmax * (1.0 - tp))
    trail_short = F.when(runmin < entry, runmin * (1.0 + tp))
    stop = F.when(is_long, F.greatest(init_stop, trail_long)).otherwise(
        F.least(init_stop, trail_short))
    out = (
        prices.withColumn("entry_price", entry)
        .withColumn("stop_price", stop)
        .withColumn(
            "stop_hit",
            F.when(is_long, px <= F.col("stop_price"))
            .otherwise(px >= F.col("stop_price")),
        )
    )
    first_hit = F.min(F.when(F.col("stop_hit"), F.col(ts_col))).over(w_full)
    return (
        out.withColumn("first_hit_ts", first_hit)
        .withColumn(
            "active",
            F.col("first_hit_ts").isNull()
            | (F.col(ts_col) < F.col("first_hit_ts")),
        )
    )


def trailing_stops(
    prices: DataFrame,
    trail_pct: float = 0.05,
    price_col: str = "close",
    symbol_col: str = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """Vectorized long-side, path-global trailing-stop ratchet:
    stop_t = running_max(price) * (1 - trail_pct); hit when price <= stop.
    This is the simple price-path ratchet only — for the reference's full
    per-position machine (entry-based initial stop + per-position trailing,
    risk_monitor.py:415-538) use :func:`position_stops`."""
    w_all = (
        Window.partitionBy(symbol_col).orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runmax = F.max(price_col).over(w_all)
    stop = runmax * F.lit(1.0 - float(trail_pct))
    return (
        prices.withColumn("stop_price", stop)
        .withColumn("stop_hit", (F.col(price_col) <= F.col("stop_price")))
    )


# ---------------------------------------------- component risk / VaR

#: 95% one-sided normal quantile (A&S 26.2.23-grade constant).
Z_95 = 1.6448536269514722


def component_risk(
    returns: DataFrame,
    weights: DataFrame | None = None,
    z: float = Z_95,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    returns_col: str = "ret",
) -> DataFrame:
    """Euler risk decomposition of portfolio volatility and parametric
    VaR — fully relational (no driver matrix, unlike
    ``portfolio_opt.covariance_matrix``): per symbol the marginal
    contribution ``mcr_i = (Sigma w)_i / sigma_p``, the risk
    contribution ``rc_i = w_i * mcr_i`` (sums exactly to ``sigma_p`` —
    Euler's theorem), its share ``pct_i``, and the component VaR
    ``z * rc_i``.

    ``weights`` is (symbol, weight); omitted -> equal weight, computed
    lazily (a count window over the distinct-symbol frame — no eager
    ``.count()`` driver action). Shape at 100 TB: the ts-self-join
    covariance is the one real shuffle; everything after operates on
    k x k pair rows and broadcasts a 1-row portfolio-variance frame.
    """
    r = returns.select(
        F.col(ts_col).alias("ts"),
        F.col(symbol_col).alias("sym"),
        F.col(returns_col).alias("r"),
    )
    if weights is None:
        wdf = (
            r.select("sym").distinct()
            .select(
                "sym",
                (
                    F.lit(1.0)
                    / F.count(F.lit(1)).over(
                        Window.rowsBetween(
                            Window.unboundedPreceding,
                            Window.unboundedFollowing,
                        )
                    )
                ).alias("weight"),
            )
        )
    else:
        wdf = weights.select(
            F.col(symbol_col).alias("sym"), "weight"
        )
    a = r.select("ts", F.col("sym").alias("sa"), F.col("r").alias("ra"))
    b = r.select("ts", F.col("sym").alias("sb"), F.col("r").alias("rb"))
    cov = (
        a.join(b, "ts")
        .groupBy("sa", "sb")
        .agg(F.covar_samp("ra", "rb").alias("cov"))
    )
    sw = (
        cov.join(
            F.broadcast(wdf.select(F.col("sym").alias("sb"),
                                   F.col("weight").alias("wb"))),
            "sb",
        )
        .groupBy("sa")
        .agg(F.sum(F.col("cov") * F.col("wb")).alias("sigma_w"))
    )
    joined = sw.join(
        F.broadcast(wdf.select(F.col("sym").alias("sa"), "weight")), "sa"
    )
    pv = joined.agg(
        F.sum(F.col("weight") * F.col("sigma_w")).alias("port_var")
    )
    out = joined.crossJoin(F.broadcast(pv))
    sigma_p = F.sqrt(F.col("port_var"))
    mcr = F.col("sigma_w") / sigma_p
    rc = F.col("weight") * mcr
    return out.select(
        F.col("sa").alias(symbol_col),
        "weight",
        sigma_p.alias("port_vol"),
        mcr.alias("mcr"),
        rc.alias("risk_contrib"),
        (rc / sigma_p).alias("pct_contrib"),
        (F.lit(float(z)) * rc).alias("component_var"),
    )
