"""Performance metrics — one-row-per-symbol aggregates over backtest results.

Reference: ``/root/reference/backtesting/metrics.py`` (PerformanceMetrics,
defaults risk_free_rate=0.02, periods_per_year=252, :11-34; full set
assembled by get_all_metrics :279-301). Each metric is a guarded aggregate
expression; the whole suite evaluates as ONE hash aggregation over the
results frame (plus a windowed pre-pass for the streak metrics, which need
gaps-and-islands).

Determinism: first/last-in-time use ``min_by/max_by(value, ts)``; the streak
islands use explicit window ordering.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RISK_FREE_RATE = 0.02
PERIODS_PER_YEAR = 252


def _sharpe(r: Column, rf_per_period: float, ppy: float) -> Column:
    ex_mean = F.avg(r - rf_per_period)
    ex_std = F.stddev_samp(r - rf_per_period)
    return F.when(ex_std > 0, ex_mean / ex_std * math.sqrt(ppy)).otherwise(F.lit(0.0))


def _sortino(r: Column, rf_per_period: float, ppy: float) -> Column:
    ex = r - rf_per_period
    downside = F.stddev_samp(F.when(ex < 0, ex))
    return F.when(downside > 0, F.avg(ex) / downside * math.sqrt(ppy)).otherwise(
        F.lit(0.0)
    )


def compute_metrics(
    results: DataFrame,
    returns_col: str = "net_returns",
    equity_col: str = "equity",
    position_col: str = "position",
    symbol_col: str | None = "symbol",
    ts_col: str = "ts",
    risk_free_rate: float = RISK_FREE_RATE,
    periods_per_year: int = PERIODS_PER_YEAR,
    include_streaks: bool = True,
) -> DataFrame:
    """Compute the full scalar metric suite.

    Accepts either ``net_returns`` or ``equity`` (derives the other like
    metrics.py:28-34). Output: one row per symbol with columns
    total_return, cagr, volatility, sharpe_ratio, sortino_ratio, max_drawdown,
    calmar_ratio, win_rate, profit_factor, num_trades, exposure, avg_win,
    avg_loss, n_periods [, max_consecutive_wins, max_consecutive_losses].
    """
    group = [symbol_col] if symbol_col else []
    cols = set(results.columns)
    df = results
    has_returns = returns_col in cols
    has_equity = equity_col in cols
    has_position = position_col in cols

    # Expression-set memo (r13, guide §4/§5 — the py4j boundary exists on
    # the driver): building this suite issues ~1,450 py4j round trips
    # (~0.4 s measured), and Columns are immutable unresolved trees, so
    # the SAME expression objects can be reused for every later call with
    # the same parameters in this application — no data, no plan, no
    # result is cached; only the unbound expression trees, exactly like
    # the load_tables plan memo (r12). Keyed on applicationId so a new
    # JVM/app never sees stale py4j refs.
    try:
        app = results.sparkSession.sparkContext.applicationId
    except Exception:
        app = None
    key = (app, returns_col, equity_col, position_col, symbol_col, ts_col,
           float(risk_free_rate), int(periods_per_year),
           bool(include_streaks), has_returns, has_equity, has_position)
    memo = _EXPR_MEMO.get(key) if app is not None else None
    if memo is None:
        memo = _build_metric_exprs(
            returns_col, equity_col, position_col, group, ts_col,
            risk_free_rate, periods_per_year, include_streaks,
            has_returns, has_equity, has_position)
        if app is not None:
            if len(_EXPR_MEMO) > 256:
                _EXPR_MEMO.clear()
            _EXPR_MEMO[key] = memo
    derived_returns, batch1, batch2, batch3, aggs = memo
    if derived_returns is not None:
        df = df.withColumn(returns_col, derived_returns)
    df = df.withColumns(batch1).withColumns(batch2).withColumns(batch3)
    return df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)


#: memoized (derived_returns, batch1..3, aggs) expression tuples; see
#: compute_metrics. Bounded like session._TABLE_MEMO.
_EXPR_MEMO: dict = {}


def _build_metric_exprs(
    returns_col: str,
    equity_col: str,
    position_col: str,
    group: list,
    ts_col: str,
    risk_free_rate: float,
    periods_per_year: int,
    include_streaks: bool,
    has_returns: bool,
    has_equity: bool,
    has_position: bool,
):
    """Construct the metric suite's staging batches and aggregates —
    expression code identical to the pre-r13 inline build."""
    derived_returns = None
    if not has_returns and has_equity:
        w = Window.partitionBy(*group).orderBy(ts_col)
        derived_returns = F.coalesce(
            F.col(equity_col) / F.lag(equity_col, 1).over(w) - 1,
            F.lit(0.0))

    w = Window.partitionBy(*group).orderBy(ts_col)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # (r12) staging columns are added in THREE withColumns batches (one
    # Catalyst analysis pass each) instead of seven withColumn calls —
    # each call re-analyzes the whole upstream lineage (the full backtest
    # kernel) and construction cost dominated execution at bench scale
    # (guide §7.3). Batch boundaries follow the window-dependency layers;
    # every expression and window spec is unchanged, and the aggregation
    # output is order-insensitive to staging-column placement.
    batch1: dict[str, Column] = {}
    batch2: dict[str, Column] = {}
    batch3: dict[str, Column] = {}

    # drawdown pre-pass: equity (or synthetic cumprod equity), running max
    if has_equity:
        eq = F.col(equity_col)
    else:
        eq = F.exp(F.sum(F.log1p(returns_col)).over(w_all))
    batch1["_eq"] = eq
    batch2["_runmax"] = F.max("_eq").over(w_all)
    batch3["_dd"] = (F.col("_eq") - F.col("_runmax")) / F.col("_runmax")

    # trade detection (metrics.py:194-206): position.diff() != 0
    if has_position:
        batch1["_trade_flag"] = (
            (F.col(position_col)
             - F.coalesce(F.lag(position_col, 1).over(w), F.lit(0.0)) != 0)
            .cast("int")
        )
        exposure_expr = (
            F.sum((F.col(position_col) != 0).cast("long")) / F.count(F.lit(1))
        )
        num_trades_expr = F.sum("_trade_flag")
    else:
        batch1["_trade_flag"] = F.lit(None).cast("int")
        exposure_expr = F.lit(1.0)
        num_trades_expr = F.sum((F.col(returns_col) != 0).cast("long"))

    r = F.col(returns_col)
    rf = risk_free_rate / periods_per_year
    n = F.count(F.lit(1))
    total_return = F.exp(F.sum(F.log1p(r))) - 1
    years = n / F.lit(float(periods_per_year))
    cagr = F.when(
        years > 0, F.pow(total_return + 1, F.lit(1.0) / years) - 1
    ).otherwise(F.lit(0.0))
    max_dd = F.min("_dd")

    aggs = [
        n.alias("n_periods"),
        total_return.alias("total_return"),
        cagr.alias("cagr"),
        (F.stddev_samp(r) * math.sqrt(periods_per_year)).alias("volatility"),
        _sharpe(r, rf, periods_per_year).alias("sharpe_ratio"),
        _sortino(r, rf, periods_per_year).alias("sortino_ratio"),
        max_dd.alias("max_drawdown"),
        F.when(F.abs(max_dd) > 0, cagr / F.abs(max_dd)).otherwise(F.lit(0.0))
        .alias("calmar_ratio"),
        # win_rate: wins / non-zero periods (metrics.py:166-178)
        F.when(
            F.sum((r != 0).cast("long")) > 0,
            F.sum((r > 0).cast("long")) / F.sum((r != 0).cast("long")),
        ).otherwise(F.lit(0.0)).alias("win_rate"),
        # profit_factor: gross profit / |gross loss| (metrics.py:180-192)
        F.when(
            F.abs(F.sum(F.when(r < 0, r))) > 0,
            F.sum(F.when(r > 0, r)) / F.abs(F.sum(F.when(r < 0, r))),
        ).otherwise(
            F.when(F.sum(F.when(r > 0, r)) > 0, F.lit(float("inf")))
            .otherwise(F.lit(0.0))
        ).alias("profit_factor"),
        num_trades_expr.alias("num_trades"),
        exposure_expr.alias("exposure"),
        F.coalesce(F.avg(F.when(r > 0, r)), F.lit(0.0)).alias("avg_win"),
        F.coalesce(F.avg(F.when(r < 0, r)), F.lit(0.0)).alias("avg_loss"),
    ]
    if include_streaks:
        # Fold the gaps-and-islands streak computation into the SAME
        # single pass instead of joining consecutive_streaks() back (the
        # join formulation recomputed the entire upstream lineage - the
        # kernel, its scan, its windows - as a second plan subtree). The
        # island window partitions by (group, _grp): hash(group) already
        # satisfies that clustering, so both extra windows ride the ONE
        # existing exchange as additional sorts, and the streak maxes
        # join the main aggregation for free.
        flag = F.when(r > 0, 1).when(r < 0, -1).otherwise(0)
        batch1["_flag"] = flag
        changed = F.when(
            F.lag("_flag", 1).over(w).isNull()
            | (F.col("_flag") != F.lag("_flag", 1).over(w)), 1
        ).otherwise(0)
        batch2["_grp"] = F.sum(changed).over(w_all)
        w_island = Window.partitionBy(*group, "_grp").orderBy(ts_col)
        batch3["_streak"] = F.row_number().over(w_island)
        aggs += [
            F.coalesce(
                F.max(F.when(F.col("_flag") == 1, F.col("_streak"))),
                F.lit(0)).alias("max_consecutive_wins"),
            F.coalesce(
                F.max(F.when(F.col("_flag") == -1, F.col("_streak"))),
                F.lit(0)).alias("max_consecutive_losses"),
        ]
    return derived_returns, batch1, batch2, batch3, aggs


def consecutive_streaks(
    results: DataFrame,
    returns_col: str = "net_returns",
    group: Sequence[str] = ("symbol",),
    ts_col: str = "ts",
) -> DataFrame:
    """Max consecutive win / loss streaks via gaps-and-islands
    (metrics.py:208-238).

    flag = sign bucket of return; island id = running count of flag changes;
    streak length = row_number within (group, island); answer = max streak
    where flag says win (resp. loss).
    """
    group = list(group)
    w = Window.partitionBy(*group).orderBy(ts_col)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = F.col(returns_col)
    flag = F.when(r > 0, 1).when(r < 0, -1).otherwise(0)
    df = results.withColumn("_flag", flag)
    changed = (
        F.when(
            F.lag("_flag", 1).over(w).isNull()
            | (F.col("_flag") != F.lag("_flag", 1).over(w)),
            1,
        ).otherwise(0)
    )
    df = df.withColumn("_grp", F.sum(changed).over(w_all))
    w_island = Window.partitionBy(*group, "_grp").orderBy(ts_col)
    df = df.withColumn("_streak", F.row_number().over(w_island))
    aggs = [
        F.coalesce(F.max(F.when(F.col("_flag") == 1, F.col("_streak"))),
                   F.lit(0)).alias("max_consecutive_wins"),
        F.coalesce(F.max(F.when(F.col("_flag") == -1, F.col("_streak"))),
                   F.lit(0)).alias("max_consecutive_losses"),
    ]
    return df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)


def drawdown_series(
    results: DataFrame,
    equity_col: str = "equity",
    symbol_col: str | None = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-bar drawdown = (equity - running_max)/running_max
    (metrics.py:133-150, risk_monitor.py:95-106)."""
    group = [symbol_col] if symbol_col else []
    w_all = (
        Window.partitionBy(*group)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runmax = F.max(equity_col).over(w_all)
    return results.withColumn("running_max", runmax).withColumn(
        "drawdown", (F.col(equity_col) - runmax) / runmax
    )


def summary(metrics_row: dict) -> dict:
    """Shape a collected metrics row like ``BacktestEngine.get_summary``
    (engine.py:85-99)."""
    keys = [
        "total_return", "cagr", "volatility", "sharpe_ratio", "sortino_ratio",
        "max_drawdown", "calmar_ratio", "win_rate", "profit_factor",
        "num_trades", "exposure", "avg_win", "avg_loss",
    ]
    return {k: metrics_row.get(k) for k in keys}


def drawdown_episodes(
    df: DataFrame,
    top: int = 3,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    equity_col: str = "close",
) -> DataFrame:
    """Top-``top`` deepest drawdown episodes per symbol, as a table of
    (start, end, duration, depth) — the drawdown *table* a tear-sheet
    shows, vs the per-row drawdown series of ``with_drawdown``.

    Gaps-and-islands: a row is underwater when equity < running max
    (strict — the peak row itself is not underwater); an episode is a
    maximal run of underwater rows, identified by the running count of
    non-underwater rows (island id). Depth is the episode's worst
    equity/runmax - 1. Exact-equality FP note: runmax is a max over
    copies of the input values, so the strict < compares identical
    doubles — no tolerance needed.

    Shape: one (symbol, ts) window sort shared by runmax + island id,
    one map-combinable episode agg, one top-k window over episodes (rows
    per symbol = episode count, already tiny).
    """
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runmax = F.max(equity_col).over(w_all)
    base = df.select(
        symbol_col, ts_col, F.col(equity_col).alias("_eq"),
        runmax.alias("_runmax"),
    ).withColumn(
        "_under", F.col("_eq") < F.col("_runmax")
    ).withColumn(
        "_island",
        F.sum((~F.col("_under")).cast("long")).over(w_all),
    )
    eps = (
        base.where(F.col("_under"))
        .groupBy(symbol_col, "_island")
        .agg(
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            F.count(F.lit(1)).alias("duration"),
            F.min(F.col("_eq") / F.col("_runmax") - 1.0).alias("depth"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy(symbol_col).orderBy(
            F.asc("depth"), F.asc("start_ts")
        )
    )
    return (
        eps.withColumn("rank", rank)
        .where(F.col("rank") <= top)
        .select(symbol_col, "rank", "start_ts", "end_ts", "duration",
                "depth")
    )


def bootstrap_sharpe_ci(
    returns: DataFrame,
    n_boot: int = 200,
    alpha: float = 0.05,
    periods_per_year: int = 252,
    ts_col: str = "ts",
    returns_col: str = "r",
) -> DataFrame:
    """Bootstrap confidence interval for the annualized Sharpe ratio —
    the statistical-significance gate a backtest report should carry
    (a Sharpe whose CI straddles 0 is noise).

    I.i.d. bootstrap (documented simplification vs block bootstrap for
    autocorrelated series): resample b draws row index
    ``j = floor(u * n)`` with the deterministic md5 uniform keyed by
    (b, i) — every engine, executor and retry replays the identical
    resamples, so the CI is reproducible and oracle-verifiable. The CI
    is the exact interpolated percentile of the B resampled Sharpes
    (the VaR percentile discipline).

    Shape at 100 TB: the fan-out is rows x B via a map-side explode,
    the index join is a hash equi-join on the row index, each resample
    reduces map-combinably. For long series, bootstrap a bar-level
    aggregate, not the tape.
    """
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators.sampling import (
        portable_uniform,
    )

    r = returns.select(
        F.col(returns_col).alias("r"),
        (
            F.row_number().over(Window.orderBy(ts_col)) - 1
        ).alias("idx"),
    )
    n_frame = r.agg(F.count(F.lit(1)).alias("n"))
    b = F.explode(
        F.sequence(F.lit(1), F.lit(int(n_boot)))
    ).alias("b")
    i = F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("i")
    draws = (
        n_frame.select(b, "n").select("b", "n", i)
        .withColumn(
            "idx",
            F.floor(
                portable_uniform(
                    F.concat_ws("-", F.col("b"), F.col("i"))
                )
                * F.col("n")
            ).cast("long"),
        )
    )
    resampled = draws.join(r, "idx")
    ann = math.sqrt(float(periods_per_year))
    sharpes = resampled.groupBy("b").agg(
        (F.avg("r") / F.stddev_samp("r") * ann).alias("sharpe")
    )
    # exact interpolated percentiles over the B resamples
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    base = returns.agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.avg(returns_col) / F.stddev_samp(returns_col) * ann)
        .alias("sharpe_hat"),
    )
    ci = sharpes.agg(
        F.percentile("sharpe", F.lit(lo)).alias("ci_lo"),
        F.percentile("sharpe", F.lit(hi)).alias("ci_hi"),
        F.count(F.lit(1)).alias("n_boot"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        "n_obs", "sharpe_hat", "n_boot", "ci_lo", "ci_hi",
        (F.col("ci_lo") > 0).alias("significant"),
    )
