"""Data cleaning: dedup, price validation, outlier filters, gap fill.

Reference semantics in ``/root/reference/data_processing/cleaner.py``:
- validate_prices (:199-228): split (valid, invalid) on ``min_price <= p
  [<= max_price]``, min default 0.01.
- IQR outlier filter (:39-47): keep ``Q1 - k*IQR <= x <= Q3 + k*IQR`` with
  quartiles over the WHOLE column, k=3.0. pandas ``quantile`` linearly
  interpolates -> we use Spark's exact ``percentile`` (same interpolation),
  never ``percentile_approx``, in correctness paths (SURVEY §7.7.8).
- z-score filter (:49-52): keep ``abs(x-mean)/std < k``, sample std (ddof=1).
- deduplicate (:109-132): drop_duplicates(subset, keep in first|last|False).
- gap fill (:159-197): reindex onto a complete time spine, then ffill/bfill/
  linear interpolate.
- clean_pipeline (:230-266): dedup -> validate -> outliers (order observable).

Scale notes
-----------
Global statistics (quartiles / mean / std) are single-row aggregates; we attach
them with a broadcast cross-join so the whole clean stays one lazy plan — no
``collect`` in the data path, and the scan under both branches is shared.
Keyed dedup is one shuffle on the subset columns; ``keep=first`` uses a
``row_number`` window which AQE handles fine even with skewed keys (the
partition count tracks data volume).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def validate_prices(
    df: DataFrame,
    price_col: str = "price",
    min_price: float = 0.01,
    max_price: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return (valid, invalid) split by price bounds (cleaner.py:199-228)."""
    cond = F.col(price_col) >= F.lit(float(min_price))
    if max_price is not None:
        cond = cond & (F.col(price_col) <= F.lit(float(max_price)))
    return df.filter(cond), df.filter(~cond | F.col(price_col).isNull())


def _with_global_stats(df: DataFrame, stats: DataFrame) -> DataFrame:
    """Attach a 1-row stats frame to every row via broadcast cross-join."""
    return df.crossJoin(F.broadcast(stats))


def remove_outliers_iqr(
    df: DataFrame,
    col: str = "price",
    k: float = 3.0,
    group_cols: Sequence[str] | None = None,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Keep rows inside ``[Q1 - k*IQR, Q3 + k*IQR]``; quartiles exact,
    linearly interpolated (matches pandas / DuckDB quantile_cont).

    ``group_cols`` extends the reference (per-symbol bounds instead of global)
    — pass None for reference-exact global behavior.

    ``approx=True`` is the 100TB path: ``approx_percentile`` (one-pass
    KLL-style sketch, rank error <= 1/approx_accuracy) instead of the exact
    sort-based percentile. The filter bound shifts by at most that rank
    error — acceptable for a k-IQR fence, never used where an oracle
    compares values (FIXTURES.md tolerance table).
    """
    if approx:
        q = F.expr(f"approx_percentile({col}, array(0.25, 0.75),"
                   f" {int(approx_accuracy)})")
    else:
        q = F.expr(f"percentile({col}, array(0.25, 0.75))")
    if group_cols:
        stats = df.groupBy(*group_cols).agg(q.alias("_q"))
        joined = df.join(F.broadcast(stats), on=list(group_cols))
    else:
        stats = df.agg(q.alias("_q"))
        joined = _with_global_stats(df, stats)
    lo = F.col("_q")[0] - k * (F.col("_q")[1] - F.col("_q")[0])
    hi = F.col("_q")[1] + k * (F.col("_q")[1] - F.col("_q")[0])
    return joined.filter(F.col(col).between(lo, hi)).drop("_q")


def remove_outliers_zscore(
    df: DataFrame,
    col: str = "price",
    k: float = 3.0,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keep rows with ``abs(x - mean)/std_samp < k`` (cleaner.py:49-52)."""
    aggs = [F.avg(col).alias("_mu"), F.stddev_samp(col).alias("_sd")]
    if group_cols:
        stats = df.groupBy(*group_cols).agg(*aggs)
        joined = df.join(F.broadcast(stats), on=list(group_cols))
    else:
        stats = df.agg(*aggs)
        joined = _with_global_stats(df, stats)
    keep = (F.abs(F.col(col) - F.col("_mu")) / F.col("_sd")) < F.lit(float(k))
    return joined.filter(keep).drop("_mu", "_sd")


def deduplicate(
    df: DataFrame,
    subset: Sequence[str] | None = None,
    keep: str | bool = "first",
    order_col: str = "ts",
    tiebreaker: str | None = None,
) -> DataFrame:
    """``drop_duplicates(subset, keep)`` semantics (cleaner.py:109-132).

    keep='first'/'last' is positional in pandas; position must be an explicit
    ordering here (SURVEY §7.7.5): ``order_col`` (+ optional ``tiebreaker``).
    ``keep=False`` drops every member of a duplicate group.
    """
    if subset is None:
        if keep in ("first", "last"):
            # identical rows -> any representative is fine; one shuffle.
            return df.dropDuplicates()
        subset = df.columns
    subset = list(subset)
    order = [F.col(order_col)] + ([F.col(tiebreaker)] if tiebreaker else [])
    if keep == "first":
        w = Window.partitionBy(*subset).orderBy(*order)
    elif keep == "last":
        w = Window.partitionBy(*subset).orderBy(*[c.desc() for c in order])
    elif keep is False:
        w = Window.partitionBy(*subset)
        return (
            df.withColumn("_cnt", F.count(F.lit(1)).over(w))
            .filter(F.col("_cnt") == 1)
            .drop("_cnt")
        )
    else:
        raise ValueError(f"keep must be 'first', 'last' or False, got {keep!r}")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def fill_missing_timestamps(
    df: DataFrame,
    freq_seconds: int,
    method: str = "ffill",
    ts_col: str = "ts",
    symbol_col: str = "symbol",
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Reindex each symbol onto a complete time spine and fill gaps
    (cleaner.py:159-197).

    Spine = ``sequence(min_ts, max_ts, interval)`` exploded per symbol, then a
    left join of the data and windowed ffill/bfill. Linear interpolation
    carries both neighbor values + timestamps and lerps.

    The spine is built per symbol from that symbol's own min/max (matches the
    reference's per-frame ``date_range``). sequence+explode is generated
    JVM-side; no driver materialization.
    """
    value_cols = list(value_cols or [c for c in df.columns
                                     if c not in (ts_col, symbol_col)])
    interval = F.expr(f"INTERVAL {int(freq_seconds)} SECONDS")
    spine = (
        df.groupBy(symbol_col)
        .agg(F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi"))
        .select(symbol_col,
                F.explode(F.sequence("_lo", "_hi", interval)).alias(ts_col))
    )
    joined = spine.join(df, on=[symbol_col, ts_col], how="left")
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    w_back = (
        Window.partitionBy(symbol_col)
        .orderBy(ts_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_fwd = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = joined
    for c in value_cols:
        if method == "ffill":
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w_fwd))
        elif method == "bfill":
            out = out.withColumn(c, F.first(c, ignorenulls=True).over(w_back))
        elif method == "interpolate":
            prev_v = F.last(c, ignorenulls=True).over(w_fwd)
            next_v = F.first(c, ignorenulls=True).over(w_back)
            prev_t = F.last(F.when(F.col(c).isNotNull(), F.col(ts_col)),
                            ignorenulls=True).over(w_fwd)
            next_t = F.first(F.when(F.col(c).isNotNull(), F.col(ts_col)),
                             ignorenulls=True).over(w_back)
            span = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
            frac = F.when(span > 0,
                          (F.unix_timestamp(ts_col) - F.unix_timestamp(prev_t))
                          / span).otherwise(F.lit(0.0))
            lerp = prev_v + (next_v - prev_v) * frac
            out = out.withColumn(
                c,
                F.when(F.col(c).isNotNull(), F.col(c))
                .when(prev_v.isNull(), next_v)
                .when(next_v.isNull(), prev_v)
                .otherwise(lerp),
            )
        else:
            raise ValueError(f"unknown fill method {method!r}")
    return out


# Above this estimated input size the composed pipeline switches the IQR
# quartiles to the one-pass approx_percentile sketch: an exact global
# percentile is a full-column sort-aggregate — fine for oracle-sized data,
# a scale-killer at 100 TB (the fence only needs rank accuracy ~1e-4).
AUTO_APPROX_BYTES = 1 << 30


def _estimated_plan_bytes(df: DataFrame) -> int | None:
    """Catalyst's lazy size estimate for the plan's output (file sizes /
    range bounds — no job runs). None when the private API is unavailable
    (e.g. Spark Connect)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
    except Exception:
        return None


def clean_pipeline(
    df: DataFrame,
    price_col: str = "price",
    dedup_subset: Sequence[str] | None = None,
    min_price: float = 0.01,
    max_price: float | None = None,
    outlier_method: str | None = "iqr",
    outlier_k: float = 3.0,
    order_col: str = "ts",
    approx: bool | None = None,
) -> DataFrame:
    """Composed clean in the reference's observable order
    (cleaner.py:230-266): dedup -> validate -> outlier filter.

    ``approx`` controls the IQR quartile path: True = one-pass
    approx_percentile sketch (the 100 TB path), False = exact interpolated
    percentile (oracle parity), None (default) = auto — exact below
    ``AUTO_APPROX_BYTES`` of Catalyst-estimated input, sketch above, so the
    default composition is scale-safe without a config flag."""
    out = deduplicate(df, subset=dedup_subset, keep="first", order_col=order_col)
    if price_col in out.columns:
        out, _ = validate_prices(out, price_col, min_price, max_price)
        if outlier_method == "iqr":
            if approx is None:
                est = _estimated_plan_bytes(df)
                approx = est is not None and est > AUTO_APPROX_BYTES
            out = remove_outliers_iqr(out, price_col, k=outlier_k,
                                      approx=approx)
        elif outlier_method == "zscore":
            out = remove_outliers_zscore(out, price_col, k=outlier_k)
        elif outlier_method is not None:
            raise ValueError(f"unknown outlier method {outlier_method!r}")
    return out
