"""Time-series joins Spark lacks natively: as-of join and range join.

Beyond reference parity (SURVEY §2.7 flags as-of as the natural market-data
extension). Two scale-aware strategies:

- ``asof_join`` (union-and-ffill): tag and union both sides, one window
  sort per key, forward-fill the right side's values, keep left rows.
  Cost = ONE shuffle of left+right on the key — no range explosion, no
  skewed inequality join. The standard idiom for distributed as-of.
  Covers ALL merge_asof direction/tolerance combinations JVM-side (r4):
  forward is the mirrored window ordering, nearest picks per-row between
  the two fills off the same exchange, tolerance is a delta post-filter.
- ``asof_join_pandas`` (merge_asof twin): per-key ``applyInPandas`` running
  ``pd.merge_asof`` — kept as the differential reference for the JVM
  path (tests assert equality); prefer ``asof_join`` in pipelines.
- ``range_join``: interval containment via bucketed equi-join — each
  interval replicated to the time buckets it spans, points join their
  bucket, then the exact predicate filters. Turns an O(n*m) inequality join
  into an equi-join Spark shuffles hash-uniformly; AQE handles residual
  bucket skew.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tolerance_native(tolerance, on_type) -> float | int | None:
    """Normalize a tolerance (seconds number, pd.Timedelta, or duration
    string) to the native delta unit of the ``on`` column: microseconds
    for timestamps, the column's own units for numerics."""
    if tolerance is None:
        return None
    is_ts = on_type.typeName().startswith("timestamp")
    if isinstance(tolerance, str):
        tolerance = pd.Timedelta(tolerance)
    if isinstance(tolerance, pd.Timedelta):
        if not is_ts:
            raise ValueError("Timedelta tolerance on a numeric 'on' column")
        return int(tolerance.value // 1000)  # ns -> µs
    return float(tolerance) * 1_000_000 if is_ts else float(tolerance)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "symbol",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance=None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join, fully JVM-side (union-and-window idiom — ONE shuffle on
    ``by``, no Python, no inequality join), with pandas ``merge_asof``
    semantics for all direction/tolerance combinations:

    - ``backward`` (default): most recent right row with
      ``right.on <= left.on``;
    - ``forward``: earliest right row with ``right.on >= left.on``
      (the mirrored window ordering);
    - ``nearest``: whichever of the two is closer, ties to backward
      (pandas tie-break); both candidates come from the SAME single
      exchange — two window sorts, zero extra shuffles.

    ``tolerance``: seconds (number), ``pd.Timedelta``, or a duration
    string — a match farther than this is nulled out per side BEFORE the
    nearest choice (merge_asof parity: a backward match beyond tolerance
    still loses to a forward match within it).

    Returns left columns + right ``value_cols`` (suffixed on collision) +
    ``{on}{suffix}`` (the matched right timestamp, null if none).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    l_cols = left.columns
    out_names = {
        c: (c + suffix if c in l_cols else c) for c in value_cols
    }
    matched_ts = on + suffix

    # All right-side payload travels in ONE struct per right row.  The struct
    # is non-null on right rows even when individual value columns are NULL,
    # so last(ignorenulls=True) carries the *matched row* forward intact —
    # a legitimately-NULL field of the matched row stays NULL instead of
    # being filled through with an older row's value (merge_asof parity).
    rv_struct = F.struct(
        *[F.col(c).alias(out_names[c]) for c in value_cols],
        F.col(on).alias(matched_ts),
    )
    rv_type = right.select(rv_struct.alias("_rv")).schema["_rv"].dataType
    lhs = left.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"),
        *[F.col(c) for c in l_cols if c not in (on, by)],
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    rhs = right.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in l_cols if c not in (on, by)],
        rv_struct.alias("_rv"),
    )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction {direction!r}")
    # right rows sort BEFORE left rows at equal ts (_side 0 < 1) in BOTH
    # orderings, so backward AND forward matches are ts-inclusive, like
    # pandas merge_asof (allow_exact_matches=True).
    u = lhs.unionByName(rhs)
    on_type = left.schema[on].dataType
    is_ts = on_type.typeName().startswith("timestamp")
    tol = _tolerance_native(tolerance, on_type)

    def _units(c):
        return F.unix_micros(c) if is_ts else c.cast("double")

    def _within(struct_col):
        """Null out a matched struct whose |Δon| exceeds the tolerance."""
        if tol is None:
            return struct_col
        delta = F.abs(_units(F.col(on)) - _units(struct_col[matched_ts]))
        return F.when(delta <= F.lit(tol), struct_col)

    w_b = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(by)
        .orderBy(F.col(on).desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "backward":
        chosen = _within(F.last("_rv", ignorenulls=True).over(w_b))
    elif direction == "forward":
        chosen = _within(F.last("_rv", ignorenulls=True).over(w_f))
    else:
        back = _within(F.last("_rv", ignorenulls=True).over(w_b))
        fwd = _within(F.last("_rv", ignorenulls=True).over(w_f))
        bd = F.abs(_units(F.col(on)) - _units(back[matched_ts]))
        fd = F.abs(_units(fwd[matched_ts]) - _units(F.col(on)))
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(bd <= fd, back)          # tie -> backward (pandas)
            .otherwise(fwd)
        )
    filled = u.select("*", chosen.alias("_f_rv"))
    keep = [by, on] + [c for c in l_cols if c not in (on, by)]
    return filled.filter(F.col("_side") == 1).select(
        *keep,
        *[F.col("_f_rv")[out_names[c]].alias(out_names[c])
          for c in value_cols],
        F.col("_f_rv")[matched_ts].alias(matched_ts),
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "symbol",
    tolerance: "pd.Timedelta | None" = None,
    direction: str = "backward",
) -> DataFrame:
    """pandas ``merge_asof`` twin via cogrouped applyInPandas — exact pandas
    semantics (tolerance, forward/nearest directions)."""
    import pyspark.sql.types as T

    l_schema = left.schema
    r_fields = [f for f in right.schema.fields if f.name not in (on, by)]
    out_schema = T.StructType(
        list(l_schema.fields)
        + [T.StructField(f.name + ("_right" if f.name in left.columns else ""),
                         f.dataType) for f in r_fields]
    )

    def _merge(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        if lg.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        lg = lg.sort_values(on)
        rg = rg.sort_values(on)
        renames = {f.name: f.name + "_right" for f in r_fields
                   if f.name in lg.columns}
        rg = rg.rename(columns=renames)
        out = pd.merge_asof(lg, rg.drop(columns=[by], errors="ignore"),
                            on=on, tolerance=tolerance, direction=direction)
        return out[[f.name for f in out_schema.fields]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(_merge, out_schema)
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | None = "symbol",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join points to the intervals containing them
    (``start <= ts < end``) via time-bucket equi-join.

    Each interval explodes to the buckets it overlaps (bounded fan-out =
    interval_len / bucket; choose ``bucket_seconds`` ~ median interval
    length); points map to one bucket. The equi-join key
    ``(by, bucket)`` shuffles hash-uniformly — no O(n*m) inequality join,
    no broadcast requirement. Exact predicate applied post-join.
    """
    b = int(bucket_seconds)
    # Epoch seconds as double (keeps sub-second precision; unix_timestamp
    # would truncate).  End-exclusivity is exact integer logic, not an
    # epsilon: an interval ending exactly on a bucket boundary k*b owns
    # buckets up to k-1 only — ceil(end/b)-1 is k-1 there and floor(end/b)
    # everywhere else.  greatest() guards degenerate (empty) intervals so
    # sequence() never runs backwards.
    start_bk = F.floor(F.col(start_col).cast("double") / b).cast("long")
    end_bk = F.greatest(
        start_bk,
        (F.ceil(F.col(end_col).cast("double") / b) - F.lit(1)).cast("long"),
    )
    i_bucketed = intervals.withColumn(
        "_bk", F.explode(F.sequence(start_bk, end_bk))
    )
    p_bucketed = points.withColumn(
        "_bk", F.floor(F.col(point_ts).cast("double") / b).cast("long")
    )
    keys = ["_bk"] + ([by] if by else [])
    joined = p_bucketed.join(i_bucketed, on=keys, how=how)
    cond = (F.col(start_col) <= F.col(point_ts)) & (
        F.col(point_ts) < F.col(end_col)
    )
    return joined.filter(cond).drop("_bk")
