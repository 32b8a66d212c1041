"""Portfolio optimization: Spark computes the data-parallel statistics,
the driver optimizes the tiny k x k problem.

Reference: ``/root/reference/backtesting/portfolio_optimization.py`` —
expected returns (:36-42), covariance (:44-50), max-Sharpe (:87-134),
min-vol (:136-180), efficient frontier (:182-235), risk parity (:238-321).
The reference drives scipy SLSQP; this environment has no scipy, so the
driver-side solvers are numpy-only:

- min-variance / max-Sharpe: closed-form via the inverse covariance
  (w ∝ Σ⁻¹1, w ∝ Σ⁻¹μ_ex), then projection onto the long-only simplex and
  re-normalization — the standard analytic tangency/GMV portfolios with a
  no-shorting projection (iterative: clip negatives, re-solve on support).
- risk parity: multiplicative iteration w_i <- w_i * (target/RC_i)^0.5,
  normalized each step (converges for PD covariances).

Everything data-sized is Spark (returns matrix never collected — only the
k x k covariance and k-vector of means cross the driver boundary).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PERIODS_PER_YEAR = 252


def expected_returns(
    returns: DataFrame,
    method: str = "historical",
    span: int = 60,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    returns_col: str = "ret",
) -> DataFrame:
    """Annualized expected returns per symbol: historical mean * 252, or the
    last EWM(span) mean * 252 (portfolio_optimization.py:36-42).

    ``method="both"`` emits (exp_ret_hist, exp_ret_ewm) from ONE aggregation
    over the EWM-annotated frame — half the exchanges of running the two
    methods separately and joining (plan-measured: 3 vs 5)."""
    if method == "historical":
        return returns.groupBy(symbol_col).agg(
            (F.avg(returns_col) * PERIODS_PER_YEAR).alias("exp_ret")
        )
    if method in ("ewm", "both"):
        from build_a_market_data_etl_strategy_backtesting_engine_spark.functions.ewm import (
            ewm_mean,
        )

        e = ewm_mean(returns, span=span, value_col=returns_col,
                     symbol_col=symbol_col, ts_col=ts_col)
        if method == "ewm":
            return e.groupBy(symbol_col).agg(
                (F.max_by("ewm", ts_col) * PERIODS_PER_YEAR).alias("exp_ret")
            )
        return e.groupBy(symbol_col).agg(
            (F.avg(returns_col) * PERIODS_PER_YEAR).alias("exp_ret_hist"),
            (F.max_by("ewm", ts_col) * PERIODS_PER_YEAR)
            .alias("exp_ret_ewm"),
        )
    raise ValueError(f"unknown method {method!r}")


def covariance_matrix(
    returns: DataFrame,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    returns_col: str = "ret",
    annualize: bool = True,
):
    """Pairwise covariance of per-symbol return series, annualized * 252
    (portfolio_optimization.py:44-50).

    Computed relationally: self-join on ts (both sides partitioned by ts —
    one shuffle), ``covar_samp`` per symbol pair. Returns (symbols, k x k
    numpy array) — only k^2 scalars cross to the driver.
    """
    a = returns.select(F.col(ts_col).alias("ts"),
                       F.col(symbol_col).alias("sa"),
                       F.col(returns_col).alias("ra"))
    b = returns.select(F.col(ts_col).alias("ts"),
                       F.col(symbol_col).alias("sb"),
                       F.col(returns_col).alias("rb"))
    pairs = (
        a.join(b, "ts")
        .groupBy("sa", "sb")
        .agg(F.covar_samp("ra", "rb").alias("cov"))
        .collect()
    )
    symbols = sorted({r["sa"] for r in pairs})
    idx = {s: i for i, s in enumerate(symbols)}
    k = len(symbols)
    cov = np.zeros((k, k))
    for r in pairs:
        cov[idx[r["sa"]], idx[r["sb"]]] = r["cov"]
    if annualize:
        cov *= PERIODS_PER_YEAR
    return symbols, cov


def _project_long_only(w: np.ndarray) -> np.ndarray:
    w = np.clip(w, 0.0, None)
    s = w.sum()
    return w / s if s > 0 else np.full_like(w, 1.0 / len(w))


def min_volatility_weights(cov: np.ndarray, long_only: bool = True) -> np.ndarray:
    """Global-minimum-variance: w ∝ Σ⁻¹·1 (portfolio_optimization.py:136-180).
    Long-only via iterative support reduction (clip negative, re-solve)."""
    k = cov.shape[0]
    active = np.ones(k, dtype=bool)
    for _ in range(k):
        sub = cov[np.ix_(active, active)]
        ones = np.ones(active.sum())
        w_sub = np.linalg.solve(sub + 1e-12 * np.eye(len(ones)), ones)
        w_sub /= w_sub.sum()
        if not long_only or (w_sub >= -1e-12).all():
            w = np.zeros(k)
            w[active] = np.clip(w_sub, 0.0, None)
            return w / w.sum()
        drop = np.where(active)[0][w_sub.argmin()]
        active[drop] = False
        if active.sum() == 1:
            w = np.zeros(k)
            w[active] = 1.0
            return w
    return _project_long_only(np.linalg.solve(cov, np.ones(k)))


def max_sharpe_weights(
    mu: np.ndarray, cov: np.ndarray, risk_free: float = 0.02,
    long_only: bool = True,
) -> np.ndarray:
    """Tangency portfolio: w ∝ Σ⁻¹(μ - rf) (portfolio_optimization.py:87-134),
    long-only by projection + renormalize (exact when the unconstrained
    solution is interior; otherwise a standard heuristic)."""
    ex = mu - risk_free
    w = np.linalg.solve(cov + 1e-12 * np.eye(len(mu)), ex)
    if w.sum() <= 0:
        w = np.ones_like(w)
    w = w / w.sum()
    return _project_long_only(w) if long_only else w


def risk_parity_weights(cov: np.ndarray, iters: int = 200) -> np.ndarray:
    """Equal-risk-contribution weights by multiplicative iteration
    (portfolio_optimization.py:238-321): RC_i = w_i (Σw)_i / (wᵀΣw),
    w_i <- w_i * (1/k / RC_i)^0.5."""
    k = cov.shape[0]
    w = np.full(k, 1.0 / k)
    target = 1.0 / k
    for _ in range(iters):
        port_var = float(w @ cov @ w)
        rc = w * (cov @ w) / port_var
        w = w * np.sqrt(target / np.clip(rc, 1e-12, None))
        w = w / w.sum()
    return w


def portfolio_stats(
    w: np.ndarray, mu: np.ndarray, cov: np.ndarray, risk_free: float = 0.02
) -> dict:
    ret = float(w @ mu)
    vol = float(np.sqrt(w @ cov @ w))
    return {
        "ret": ret,
        "vol": vol,
        "sharpe": (ret - risk_free) / vol if vol > 0 else 0.0,
    }


def _eq_qp_on_support(cov: np.ndarray, E: np.ndarray, d: np.ndarray,
                      free: np.ndarray):
    """Solve min ½wᵀΣw s.t. Ew=d with the non-free coordinates pinned at 0,
    via the KKT system on the free block. Returns (w, ν)."""
    k = cov.shape[0]
    f = np.where(free)[0]
    m, ne = len(f), E.shape[0]
    K = np.zeros((m + ne, m + ne))
    K[:m, :m] = cov[np.ix_(f, f)]
    K[:m, m:] = E[:, f].T
    K[m:, :m] = E[:, f]
    rhs = np.zeros(m + ne)
    rhs[m:] = d
    sol = np.linalg.solve(K + 1e-14 * np.eye(m + ne), rhs)
    w = np.zeros(k)
    w[f] = sol[:m]
    return w, sol[m:]


def min_volatility_for_target(
    mu: np.ndarray, cov: np.ndarray, target: float
) -> np.ndarray:
    """Long-only minimum-volatility portfolio at a target return — the exact
    constrained problem the reference solves per frontier point with SLSQP
    (portfolio_optimization.py:203-228): min wᵀΣw s.t. Σw=1, μᵀw=target,
    0 <= w (<= 1 is implied by the simplex).

    Exact support enumeration: the optimum of this convex QP is the
    equality-constrained KKT solution on SOME support, so solving the tiny
    KKT system for every support and keeping the feasible minimum-variance
    candidate is globally exact — no scipy, no iteration-cycling risk.
    Driver cost O(2^k · k³) on the k collected assets (k is small by
    construction here — the k×k stats already crossed the driver boundary);
    fine through k ≈ 15."""
    from itertools import combinations

    k = len(mu)
    E = np.vstack([np.ones(k), mu])
    d = np.array([1.0, float(target)])
    best_w, best_var = None, np.inf
    # singleton supports: w_i = 1 feasible only when mu_i == target
    for i in range(k):
        if abs(mu[i] - target) < 1e-9 and cov[i, i] < best_var:
            w = np.zeros(k)
            w[i] = 1.0
            best_w, best_var = w, cov[i, i]
    for m in range(2, k + 1):
        for support in combinations(range(k), m):
            free = np.zeros(k, dtype=bool)
            free[list(support)] = True
            try:
                w, _ = _eq_qp_on_support(cov, E, d, free)
            except np.linalg.LinAlgError:
                continue
            if np.abs(E @ w - d).max() > 1e-8:
                continue  # near-singular KKT system, reject the solve
            if w[free].min() < -1e-10:
                continue
            var = float(w @ cov @ w)
            if var < best_var - 1e-15:
                best_w, best_var = np.clip(w, 0.0, None), var
    if best_w is None:  # target outside attainable range: nearest vertex
        i = int(np.argmin(np.abs(mu - target)))
        best_w = np.zeros(k)
        best_w[i] = 1.0
    return best_w


def efficient_frontier(
    mu: np.ndarray, cov: np.ndarray, n_points: int = 50,
    risk_free: float = 0.02,
) -> list[dict]:
    """Frontier sweep with SLSQP-parity semantics
    (portfolio_optimization.py:182-235): targets linspace from the
    min-volatility portfolio's return to max(μ); each point is the
    constrained min-vol QP solved exactly by the active-set method."""
    w_min = min_volatility_weights(cov)
    lo = float(w_min @ mu)
    hi = float(mu.max())
    out = []
    for target in np.linspace(lo, hi, n_points):
        w = min_volatility_for_target(mu, cov, target)
        vol = float(np.sqrt(w @ cov @ w))
        out.append({
            "ret": float(target),
            "vol": vol,
            "sharpe": (float(target) - risk_free) / vol if vol > 0 else 0.0,
            "weights": w.tolist(),
        })
    return out


def optimize(
    returns: DataFrame,
    objective: str = "max_sharpe",
    risk_free: float = 0.02,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    returns_col: str = "ret",
):
    """End-to-end: Spark stats -> driver solve. Returns (symbols, weights,
    stats) like the reference's optimize entry points."""
    symbols, cov = covariance_matrix(returns, symbol_col, ts_col, returns_col)
    mu_rows = expected_returns(returns, "historical",
                               symbol_col=symbol_col, ts_col=ts_col,
                               returns_col=returns_col).collect()
    mu_map = {r[symbol_col]: r["exp_ret"] for r in mu_rows}
    mu = np.array([mu_map[s] for s in symbols])
    if objective == "max_sharpe":
        w = max_sharpe_weights(mu, cov, risk_free)
    elif objective == "min_volatility":
        w = min_volatility_weights(cov)
    elif objective == "risk_parity":
        w = risk_parity_weights(cov)
    else:
        raise ValueError(f"unknown objective {objective!r}")
    return symbols, w, portfolio_stats(w, mu, cov, risk_free)
