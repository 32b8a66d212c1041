"""Seed-deterministic mock tick generation, distributed.

Reference (``/root/reference/tools/generate_mock_ticks.py:10-64``): geometric
random walk ``price = p0 * exp(cumsum(N(trend, vol)))``, 1% jump contamination,
log-normal volumes, fixed seed 42, fixed tick interval.

Spark design: ``spark.range(n)`` gives a distributed id spine; per-row normals
come from a seeded, id-keyed hash (deterministic regardless of partitioning —
``F.randn(seed)`` is NOT stable across partition counts, so we derive
uniforms from xxhash64(id, seed) instead and Box-Muller them). The cumulative
sum runs per symbol with a window. Distribution-equivalent to the reference,
not index-exact (documented divergence, SURVEY §2.9).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi
_U64_SPAN = 18446744073709551616.0  # 2^64


def _unif(col, seed: int, salt: int):
    """Deterministic U(0,1) from (id, seed, salt) — stable under any
    partitioning, unlike F.rand/randn whose draw depends on partition index."""
    h = F.xxhash64(col, F.lit(seed), F.lit(salt))
    # map int64 -> (0,1); shift avoids exact 0 which breaks log()
    return (h.cast("double") / F.lit(_U64_SPAN)) + F.lit(0.5 + 1e-18)


def _normal(col, seed: int, salt: int):
    """Box-Muller from two hash-derived uniforms."""
    u1 = _unif(col, seed, salt * 2 + 1)
    u2 = _unif(col, seed, salt * 2 + 2)
    u1 = F.when(u1 >= 1.0, F.lit(1.0 - 1e-12)).otherwise(u1)
    return F.sqrt(-2.0 * F.log(F.lit(1.0) - u1)) * F.cos(F.lit(TWO_PI) * u2)


def generate_mock_ticks(
    spark: SparkSession,
    symbols: dict[str, float] | None = None,
    n_ticks: int = 10_000,
    start_time: str = "2024-01-01 00:00:00",
    tick_interval_ms: int = 100,
    volatility: float = 0.02,
    trend: float = 0.0001,
    jump_prob: float = 0.01,
    jump_scale: float = 5.0,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_ticks`` per symbol of a seeded geometric random walk.

    Output: ``(ts, symbol, price, volume, seq)`` — strictly increasing ts per
    symbol at ``tick_interval_ms`` spacing like the reference generator.
    """
    symbols = symbols or {
        "AAPL": 180.0, "MSFT": 370.0, "GOOGL": 140.0,
        "AMZN": 145.0, "TSLA": 250.0,
    }
    sym_rows = [(s, float(p0), i) for i, (s, p0) in enumerate(sorted(symbols.items()))]
    sym_df = spark.createDataFrame(sym_rows, "symbol string, p0 double, sym_id int")

    ids = spark.range(0, n_ticks, 1, num_partitions or spark.sparkContext.defaultParallelism)
    base = ids.crossJoin(F.broadcast(sym_df))
    key = F.col("id") + F.col("sym_id") * F.lit(n_ticks)

    step = F.lit(trend) + F.lit(volatility) * _normal(key, seed, 1)
    is_jump = _unif(key, seed, 7) < F.lit(jump_prob)
    step = F.when(is_jump, step * F.lit(jump_scale)).otherwise(step)

    w = Window.partitionBy("symbol").orderBy("id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    log_price = F.log("p0") + F.sum(step).over(w_cum)
    volume = F.round(F.exp(F.lit(3.0) + _normal(key, seed, 3)) * 100.0)

    return base.select(
        (F.to_timestamp(F.lit(start_time))
         + F.make_dt_interval(
             F.lit(0), F.lit(0), F.lit(0),
             F.col("id") * F.lit(tick_interval_ms / 1000.0))
         ).alias("ts"),
        "symbol",
        F.exp(log_price).alias("price"),
        volume.alias("volume"),
        F.col("id").alias("seq"),
    )
