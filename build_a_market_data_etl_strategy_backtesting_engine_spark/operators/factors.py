"""Cross-sectional factor/regression analytics: market-model rolling beta
and pairs-trading screening.

Beyond-reference operators (the reference backtests single-asset signal
rules; a multi-asset platform also needs the market-model regression and
cointegration-screen primitives). Everything is window/agg moment algebra
— OLS slopes come from ``covar_samp / var_samp``, residual variance from
the moment identity ``var(a) - cov(a,b)^2 / var(b)`` — so both the rolling
and the full-sample paths stay JVM-side with no per-group Python.

Shuffle shape at 100 TB: inputs are OHLCV bars (already orders of
magnitude smaller than the tape). rolling_beta costs one groupBy(ts)
exchange for the index, one join back on ts, and the shared (symbol, ts)
window sort. pairs_screen is a self-equi-join on ts followed by one
map-combinable pair agg; with S symbols each bar row fans out S-1 ways, so
screen a chosen universe (e.g. one sector), not the full cross — the
operator takes the universe you hand it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bar_returns(
    bars: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Per-symbol simple returns from bar closes (NULL on each symbol's
    first bar — warm-up is explicit, not zero-filled)."""
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    prev = F.lag(close_col).over(w)
    return bars.withColumn(
        "r", F.when(prev > 0, F.col(close_col) / prev - 1.0)
    )


def index_returns(
    returns: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
) -> DataFrame:
    """Equal-weight market return per bar timestamp: mean of the symbol
    returns present at that ts (the market proxy when no index series is
    supplied)."""
    return returns.groupBy(ts_col).agg(
        F.avg("r").alias("r_mkt"),
        F.count("r").alias("n_constituents"),
    )


def rolling_beta(
    bars: DataFrame,
    window: int = 20,
    market: DataFrame | None = None,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Rolling market-model regression per symbol over the trailing
    ``window`` bars: ``beta = cov(r, r_mkt)/var(r_mkt)``,
    ``alpha = mean(r) - beta * mean(r_mkt)``, ``r2 = corr(r, r_mkt)^2``.

    ``market`` (ts, r_mkt) overrides the equal-weight index built from the
    input universe. Rows with fewer than ``window`` observations are
    warm-up-gated to NULL, matching the repo's rolling-stat convention.
    """
    r = bar_returns(bars, symbol_col, ts_col, close_col)
    mkt = market if market is not None else index_returns(
        r, symbol_col, ts_col
    )
    j = r.join(mkt.select(ts_col, "r_mkt"), ts_col).where(
        F.col("r").isNotNull() & F.col("r_mkt").isNotNull()
    )
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(ts_col)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    cov = F.covar_samp("r", "r_mkt").over(w)
    varm = F.var_samp("r_mkt").over(w)
    beta = F.when((n >= window) & (varm > 0), cov / varm)
    alpha = F.when(
        beta.isNotNull(),
        F.avg("r").over(w) - beta * F.avg("r_mkt").over(w),
    )
    r2 = F.when(beta.isNotNull(), F.pow(F.corr("r", "r_mkt").over(w), 2))
    return j.select(
        symbol_col, ts_col, "r", "r_mkt",
        beta.alias("beta"), alpha.alias("alpha"), r2.alias("r2"),
    )


def pairs_screen(
    bars: DataFrame,
    min_obs: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
    degenerate_eps: float = 1e-6,
) -> DataFrame:
    """Pairs-trading screen over a symbol universe: for every symbol pair
    (a < b) with >= ``min_obs`` aligned bars, the return correlation, the
    OLS hedge ratio ``beta = cov(r_a, r_b)/var(r_b)`` and the residual
    volatility ``sqrt(var(r_a) - cov^2/var(r_b))`` of the spread
    ``r_a - beta * r_b`` — low residual vol + high corr = cointegration
    candidate for a mean-reversion book.

    ``degenerate_eps``: residual variance below ``var(r_a) *
    degenerate_eps`` snaps to exactly 0. At |corr| -> 1 (duplicate return
    series — listings of the same instrument, or the scale rehearsal's
    symbol copies) the subtraction cancels catastrophically and the
    leftover is pure moment-aggregation float noise whose value depends on
    partition merge order; a pair with genuine 1 - corr^2 < 1e-6 carries
    no tradeable residual anyway.
    """
    r = bar_returns(bars, symbol_col, ts_col, close_col).where(
        F.col("r").isNotNull()
    ).select(symbol_col, ts_col, "r")
    a = r.select(
        F.col(symbol_col).alias("sym_a"), ts_col, F.col("r").alias("r_a")
    )
    b = r.select(
        F.col(symbol_col).alias("sym_b"),
        F.col(ts_col).alias("_ts_b"),
        F.col("r").alias("r_b"),
    )
    j = a.join(
        b,
        (F.col(ts_col) == F.col("_ts_b"))
        & (F.col("sym_a") < F.col("sym_b")),
    )
    g = j.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.corr("r_a", "r_b").alias("corr"),
        F.covar_samp("r_a", "r_b").alias("_cov"),
        F.var_samp("r_b").alias("_varb"),
        F.var_samp("r_a").alias("_vara"),
    )
    beta = F.when(F.col("_varb") > 0, F.col("_cov") / F.col("_varb"))
    resid_var = F.col("_vara") - F.pow(F.col("_cov"), 2) / F.col("_varb")
    resid = F.when(
        resid_var < F.col("_vara") * F.lit(degenerate_eps), F.lit(0.0)
    ).otherwise(F.sqrt(F.greatest(resid_var, F.lit(0.0))))
    return (
        g.where(F.col("n_obs") >= min_obs)
        .select(
            "sym_a", "sym_b", "n_obs", "corr",
            beta.alias("hedge_ratio"),
            F.when(F.col("_varb") > 0, resid).alias("resid_vol"),
        )
    )


def cross_sectional_momentum(
    bars: DataFrame,
    lookback: int = 5,
    n_tiles: int = 2,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Cross-sectional momentum long-short portfolio on (typically daily)
    bars: rank symbols each period by trailing ``lookback``-period return,
    long the top tile, short the bottom tile (equal weight), realize the
    NEXT period's return — the standard leak-free factor-portfolio
    backtest.

    Returns one row per period with long/short leg returns, the long-short
    spread, and membership counts. Ties rank deterministically by symbol.
    Shape at 100 TB: one (symbol) window sort for trailing/forward
    returns, one (ts) window for the cross-sectional ntile, one (ts) agg —
    bar-level data throughout.
    """
    wsym = Window.partitionBy(symbol_col).orderBy(ts_col)
    past = F.lag(close_col, lookback).over(wsym)
    nxt = F.lead(close_col).over(wsym)
    r = bars.select(
        symbol_col, ts_col,
        F.when(past > 0, F.col(close_col) / past - 1.0).alias("mom"),
        F.when(
            F.col(close_col) > 0, nxt / F.col(close_col) - 1.0
        ).alias("fwd_r"),
    ).where(F.col("mom").isNotNull() & F.col("fwd_r").isNotNull())
    wcs = Window.partitionBy(ts_col).orderBy(
        F.desc("mom"), F.asc(symbol_col)
    )
    tiled = r.withColumn("tile", F.ntile(n_tiles).over(wcs))
    return (
        tiled.groupBy(ts_col)
        .agg(
            F.avg(F.when(F.col("tile") == 1, F.col("fwd_r")))
            .alias("long_r"),
            F.avg(F.when(F.col("tile") == n_tiles, F.col("fwd_r")))
            .alias("short_r"),
            F.count(F.when(F.col("tile") == 1, 1)).alias("n_long"),
            F.count(F.when(F.col("tile") == n_tiles, 1)).alias("n_short"),
            F.count(F.lit(1)).alias("n_universe"),
        )
        .withColumn("ls_r", F.col("long_r") - F.col("short_r"))
    )


def lead_lag_corr(
    bars: DataFrame,
    max_lag: int = 2,
    bucket_seconds: int = 86400,
    min_obs: int = 10,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Lead-lag cross-correlation screen: for every unordered symbol pair
    (a < b) and lag in [-max_lag, max_lag], the Pearson correlation of
    a's bar return at t with b's at t + lag*bucket. A significant peak at
    nonzero lag is the classic price-discovery signal (one venue/asset
    leading another); corr(a,b,lag) = corr(b,a,-lag), so the a < b half
    is the full surface.

    ``bucket_seconds`` is the bar spacing (86400 for daily bars).
    Returns ``(sym_a, sym_b, lag, n_obs, xcorr)``; pairs/lags with fewer
    than ``min_obs`` aligned observations are dropped.

    Shape at 100 TB: returns are one (symbol, ts) window sort; the
    alignment is an equi-join on the shifted epoch key (each left row
    fans out 2*max_lag+1 ways — bars, not ticks, so tiny); the pair agg
    is map-combinable corr moments. No cross join, no window over an
    unpartitioned frame.
    """
    r = bar_returns(bars, symbol_col, ts_col, close_col).where(
        F.col("r").isNotNull()
    ).select(
        F.col(symbol_col).alias("_sym"),
        F.unix_timestamp(ts_col).alias("_epoch"),
        F.col("r"),
    )
    lags = F.explode(
        F.array(*[F.lit(l) for l in range(-max_lag, max_lag + 1)])
    ).alias("lag")
    left = r.select(
        F.col("_sym").alias("sym_a"),
        F.col("r").alias("r_a"),
        F.col("_epoch"),
        lags,
    ).withColumn(
        "_join_epoch", F.col("_epoch") + F.col("lag") * bucket_seconds
    )
    right = r.select(
        F.col("_sym").alias("sym_b"),
        F.col("r").alias("r_b"),
        F.col("_epoch").alias("_join_epoch"),
    )
    return (
        left.join(right, "_join_epoch")
        .where(F.col("sym_a") < F.col("sym_b"))
        .groupBy("sym_a", "sym_b", "lag")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.corr("r_a", "r_b").alias("xcorr"),
        )
        .where(F.col("n_obs") >= min_obs)
    )


def acf(
    bars: DataFrame,
    max_lag: int = 5,
    bucket_seconds: int = 86400,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Per-symbol return autocorrelation function at lags 1..``max_lag``
    plus the cumulative Ljung-Box portmanteau statistic.

    rho_l is the Pearson correlation of the aligned pairs
    (r_t, r_{t-l}) — the pairwise-aligned sample ACF; the Ljung-Box
    column is ``Q_l = n(n+2) * sum_{j<=l} rho_j^2 / (n-j)`` (cumulative
    in lag, chi^2_l under the white-noise null), with n the symbol's
    full return count.

    Shape: same shifted-epoch equi-join as :func:`lead_lag_corr`
    restricted to the symbol itself, one corr agg per (symbol, lag), a
    broadcast join of per-symbol n, and a tiny cumulative window over
    ``max_lag`` rows per symbol.
    """
    r = bar_returns(bars, symbol_col, ts_col, close_col).where(
        F.col("r").isNotNull()
    ).select(
        F.col(symbol_col).alias("_sym"),
        F.unix_timestamp(ts_col).alias("_epoch"),
        F.col("r"),
    )
    n_per = r.groupBy("_sym").agg(F.count(F.lit(1)).alias("n"))
    lags = F.explode(
        F.array(*[F.lit(l) for l in range(1, max_lag + 1)])
    ).alias("lag")
    cur = r.select("_sym", F.col("r").alias("r_t"), "_epoch", lags)
    prior = r.select(
        "_sym", F.col("r").alias("r_lag"),
        F.col("_epoch").alias("_prior_epoch"),
    )
    pairs = cur.withColumn(
        "_prior_epoch", F.col("_epoch") - F.col("lag") * bucket_seconds
    ).join(prior, ["_sym", "_prior_epoch"])
    per_lag = pairs.groupBy("_sym", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.corr("r_t", "r_lag").alias("acf"),
    )
    w = Window.partitionBy("_sym").orderBy("lag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = per_lag.join(F.broadcast(n_per), "_sym")
    lb_term = (
        F.col("acf") * F.col("acf")
        / (F.col("n") - F.col("lag")).cast("double")
    )
    return joined.select(
        F.col("_sym").alias(symbol_col), "lag", "n_pairs", "n", "acf",
        (
            F.col("n") * (F.col("n") + 2) * F.sum(lb_term).over(w)
        ).alias("ljung_box_q"),
    )


def variance_ratio(
    bars: DataFrame,
    horizons: list[int] = (2, 5, 10),
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Lo-MacKinlay variance-ratio test statistic (overlapping-sample
    form, no bias correction — documented simplification): for each
    horizon k, ``VR(k) = var_samp(k-period overlapping return sum) /
    (k * var_samp(1-period return))``. VR near 1 = random walk; > 1 =
    momentum / positive serial correlation; < 1 = mean reversion.

    One (symbol, ts) window sort builds all horizons' overlapping sums
    (each a rows-between window over the same sorted run), then one
    map-combinable variance agg per symbol — the per-horizon frames are
    unioned, so horizons stay a column, not a schema explosion.
    """
    r = bar_returns(bars, symbol_col, ts_col, close_col).where(
        F.col("r").isNotNull()
    )
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    outs = []
    for k in horizons:
        wk = w.rowsBetween(-(int(k) - 1), Window.currentRow)
        rk = F.when(
            F.count(F.lit(1)).over(wk) == int(k),
            F.sum("r").over(wk),
        )
        outs.append(
            r.select(
                F.col(symbol_col), F.col("r"),
                F.lit(int(k)).alias("k"), rk.alias("rk"),
            )
        )
    unioned = outs[0]
    for o in outs[1:]:
        unioned = unioned.unionByName(o)
    return (
        unioned.groupBy(symbol_col, "k")
        .agg(
            F.count("rk").alias("n_k"),
            (
                F.var_samp("rk") / (F.col("k") * F.var_samp("r"))
            ).alias("vr"),
        )
    )


def momentum_weights(
    bars: DataFrame,
    lookback: int = 5,
    n_tiles: int = 2,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Per-period target weights of the cross-sectional momentum
    long-short portfolio (the holdings view behind
    ``cross_sectional_momentum``'s returns view): top tile +1/n_long,
    bottom tile -1/n_short, middle 0. Same ranking/tiebreak rules."""
    wsym = Window.partitionBy(symbol_col).orderBy(ts_col)
    past = F.lag(close_col, lookback).over(wsym)
    r = bars.select(
        symbol_col, ts_col,
        F.when(past > 0, F.col(close_col) / past - 1.0).alias("mom"),
    ).where(F.col("mom").isNotNull())
    wcs = Window.partitionBy(ts_col).orderBy(
        F.desc("mom"), F.asc(symbol_col)
    )
    tiled = r.withColumn("tile", F.ntile(n_tiles).over(wcs))
    wagg = Window.partitionBy(ts_col)
    n_long = F.sum((F.col("tile") == 1).cast("long")).over(wagg)
    n_short = F.sum((F.col("tile") == n_tiles).cast("long")).over(wagg)
    w = (
        F.when(F.col("tile") == 1, 1.0 / n_long)
        .when(F.col("tile") == n_tiles, -1.0 / n_short)
        .otherwise(0.0)
    )
    return tiled.select(symbol_col, ts_col, w.alias("w"))


def portfolio_turnover(
    weights: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    weight_col: str = "w",
) -> DataFrame:
    """One-way turnover per rebalance: ``sum |w_t - w_{t-1}| / 2`` over
    the union of current and previous holdings (symbols entering or
    leaving count their full weight change — the full-outer alignment is
    the part naive lag-per-symbol misses).

    Periods are indexed by a dense rank over the distinct rebalance
    timestamps (tiny frame — one window over dates, not rows), then
    current and previous holdings full-outer join on (period, symbol).
    Returns (ts, n_positions, turnover).
    """
    periods = weights.select(ts_col).distinct().select(
        F.col(ts_col),
        (F.dense_rank().over(Window.orderBy(ts_col)) - 1).alias("pidx"),
    )
    w = weights.join(periods, ts_col)
    cur = w.select(
        "pidx", F.col(symbol_col).alias("sym"),
        F.col(weight_col).alias("w_cur"),
    )
    prev = w.select(
        (F.col("pidx") + 1).alias("pidx"),
        F.col(symbol_col).alias("sym"),
        F.col(weight_col).alias("w_prev"),
    )
    aligned = cur.join(prev, ["pidx", "sym"], "full_outer").where(
        F.col("pidx") > 0
    )
    per = aligned.groupBy("pidx").agg(
        F.count(F.lit(1)).alias("n_positions"),
        (
            F.sum(
                F.abs(
                    F.coalesce("w_cur", F.lit(0.0))
                    - F.coalesce("w_prev", F.lit(0.0))
                )
            )
            / 2.0
        ).alias("turnover"),
    )
    return per.join(periods, "pidx").select(
        ts_col, "n_positions", "turnover"
    )


def information_coefficient(
    bars: DataFrame,
    lookback: int = 5,
    min_universe: int = 3,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Per-period Spearman information coefficient of the momentum
    signal: rank symbols by trailing return and by NEXT-period realized
    return (leak-free forward alignment as in
    ``cross_sectional_momentum``), IC = Pearson corr of the two rank
    columns. Ranks use row_number with the symbol tiebreak, so rank
    values are deterministic integers on both engines.

    One (symbol, ts) window for trailing/forward returns, two (ts) rank
    windows over the same cross-sectional sort exchange, one corr agg
    per ts.
    """
    wsym = Window.partitionBy(symbol_col).orderBy(ts_col)
    past = F.lag(close_col, lookback).over(wsym)
    nxt = F.lead(close_col).over(wsym)
    r = bars.select(
        symbol_col, ts_col,
        F.when(past > 0, F.col(close_col) / past - 1.0).alias("mom"),
        F.when(
            F.col(close_col) > 0, nxt / F.col(close_col) - 1.0
        ).alias("fwd_r"),
    ).where(F.col("mom").isNotNull() & F.col("fwd_r").isNotNull())
    rank_mom = F.row_number().over(
        Window.partitionBy(ts_col).orderBy(F.desc("mom"), F.asc(symbol_col))
    )
    rank_fwd = F.row_number().over(
        Window.partitionBy(ts_col).orderBy(
            F.desc("fwd_r"), F.asc(symbol_col)
        )
    )
    ranked = r.select(
        ts_col,
        rank_mom.cast("double").alias("rm"),
        rank_fwd.cast("double").alias("rf"),
    )
    return (
        ranked.groupBy(ts_col)
        .agg(
            F.count(F.lit(1)).alias("n_universe"),
            F.corr("rm", "rf").alias("ic"),
        )
        .where(F.col("n_universe") >= min_universe)
    )


def seasonality_profile(
    bars: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Day-of-week return seasonality per symbol: mean/std/count of
    daily returns bucketed by weekday. The weekday is computed as
    ``(epoch_day + 3) % 7`` (0 = Monday — 1970-01-01 was a Thursday),
    pure integer arithmetic so both engines bucket identically
    (calendar dayofweek numbering differs across engines).
    """
    r = bar_returns(bars, symbol_col, ts_col, close_col).where(
        F.col("r").isNotNull()
    )
    dow = (
        (F.floor(F.unix_timestamp(ts_col) / 86400) + 3) % 7
    ).cast("int")
    return (
        r.withColumn("dow", dow)
        .groupBy(symbol_col, "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("r").alias("mean_r"),
            F.stddev_samp("r").alias("std_r"),
        )
    )


def hurst_exponent(
    bars: DataFrame,
    scales: tuple[int, ...] = (8, 16, 32),
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    close_col: str = "close",
) -> DataFrame:
    """Rescaled-range (R/S) Hurst exponent per symbol (Hurst 1951; the
    Mandelbrot/Wallis estimator): long-memory diagnostic for return series
    — H > 0.5 trending, < 0.5 mean-reverting (the regime gate between the
    momentum and mean-reversion signal families).

    Per symbol: log returns -> for each scale n, split the series into
    full n-length blocks; per block R = range of cumulative mean-deviation,
    S = population std; average R/S over blocks; H = OLS slope of
    ln(avg R/S) on ln(n) (closed form ``covar_pop / var_pop``).

    Everything is window/agg moment algebra sharing ONE (symbol, ts) sort:
    the scale fan-out is an ``explode`` (|scales| copies of the return
    rows, a constant factor, before the block agg collapses them), and the
    final regression is a per-symbol agg over |scales| points. No Python,
    no driver loop. Emits (symbol, n_scales, hurst).
    """
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    # idx is re-ranked AFTER the first-bar drop so blocks start at 0
    r = (
        bars.withColumn("_prev", F.lag(close_col).over(w))
        .where(F.col("_prev") > 0)
        .withColumn("r", F.log(F.col(close_col) / F.col("_prev")))
        .withColumn(
            "idx",
            F.row_number().over(
                Window.partitionBy(symbol_col).orderBy(ts_col)
            ) - 1,
        )
        .select(symbol_col, "r", "idx")
    )
    fan = r.select(
        symbol_col, "r", "idx",
        F.explode(F.array(*[F.lit(int(n)) for n in scales])).alias("n"),
    ).withColumn("block", F.floor(F.col("idx") / F.col("n")))
    per_block = (
        fan.withColumn(
            "mean_b",
            F.avg("r").over(
                Window.partitionBy(symbol_col, "n", "block")
            ),
        )
        .withColumn(
            "cumdev",
            F.sum(F.col("r") - F.col("mean_b")).over(
                Window.partitionBy(symbol_col, "n", "block")
                .orderBy("idx")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(symbol_col, "n", "block")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.max("cumdev") - F.min("cumdev")).alias("rng"),
            F.stddev_pop("r").alias("s"),
        )
        .where((F.col("cnt") == F.col("n")) & (F.col("s") > 0))
        .withColumn("rs", F.col("rng") / F.col("s"))
    )
    per_scale = per_block.groupBy(symbol_col, "n").agg(
        F.avg("rs").alias("avg_rs"),
        F.count(F.lit(1)).alias("n_blocks"),
    ).where(F.col("avg_rs") > 0)
    return (
        per_scale.withColumn("lnn", F.log(F.col("n").cast("double")))
        .withColumn("lnrs", F.log("avg_rs"))
        .groupBy(symbol_col)
        .agg(
            F.count(F.lit(1)).alias("n_scales"),
            (F.covar_pop("lnn", "lnrs") / F.var_pop("lnn")).alias("hurst"),
        )
        .where(F.col("n_scales") >= 2)
    )


def kalman_hedge(
    pairs: DataFrame,
    q_var: float = 1e-5,
    r_var: float = 1e-3,
    pair_col: str = "pair",
    ts_col: str = "ts",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Kalman-filter dynamic hedge ratio for pairs trading: the classic
    state-space upgrade of the static OLS hedge (state beta_t follows a
    random walk with variance ``q_var``; observation y_t = beta_t x_t +
    noise with variance ``r_var``). Per step:

        p_pred = p + q;  k = p_pred x / (x^2 p_pred + r)
        beta  += k (y - beta x);  p = (1 - k x) p_pred

    Inherently sequential per pair — implemented as an Arrow-batched
    ``applyInPandas`` loop in plain Python floats (the op ORDER is the
    cross-engine contract: the DuckDB oracle's recursive CTE spells the
    identical expressions, so results match bit-for-bit, q137). Pairs
    run in PARALLEL across groups — the 100 TB axis is the number of
    pairs, exactly like the per-symbol event engine. Emits per row:
    pair, ts, beta (post-update), p, spread = y - beta*x.
    """
    import pandas as pd

    schema = (f"{pair_col} string, {ts_col} timestamp, beta double, "
              f"p double, spread double")
    qv, rv = float(q_var), float(r_var)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        beta, p = 0.0, 1.0
        out = []
        for ts, x, y in zip(pdf[ts_col], pdf[x_col], pdf[y_col]):
            x, y = float(x), float(y)
            p_pred = p + qv
            k = p_pred * x / (x * x * p_pred + rv)
            beta = beta + k * (y - beta * x)
            p = (1.0 - k * x) * p_pred
            out.append((pdf[pair_col].iloc[0], ts, beta, p,
                        y - beta * x))
        return pd.DataFrame(
            out, columns=[pair_col, ts_col, "beta", "p", "spread"])

    return pairs.groupBy(pair_col).applyInPandas(run, schema)
