"""Event-stream analytics: gap-based sessionization and funnel analysis
over an ``events(ts, user_id, event_type, value, ...)`` table.

Sessionization uses Spark's native ``session_window`` — the same operator
(and therefore the same state-store implementation) that Structured
Streaming uses for streaming session windows, so the batch query here IS
the streaming query with ``readStream`` swapped in. The funnel is a chain
of per-user min-aggregations; every agg keys on user_id, so a single hash
partitioning is reused across all three stages (one real exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Group events into per-user sessions split at inactivity gaps of
    ``gap`` or more: two events belong to one session iff consecutive
    events are strictly less than ``gap`` apart.

    Native ``F.session_window`` keeps this identical between batch and
    streaming (watermark + session_window is the streaming twin). Emits
    per-session start/end event timestamps, event count and value sum —
    the observed bounds, not the window's padded ``end`` (which Spark
    defines as last_event + gap).
    """
    return (
        events.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("_w"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("value_sum"),
        )
        .drop("_w")
    )


def session_stats(sessions: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user session summary: session count, mean events/session, and
    mean session duration in seconds."""
    dur = F.col("session_end").cast("double") - F.col(
        "session_start"
    ).cast("double")
    return sessions.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.avg("n_events").alias("avg_events"),
        F.avg(dur).alias("avg_duration_s"),
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: per user, the earliest time each step completed
    GIVEN the previous step had already completed (step k counts only
    events at or after the user's step-k-1 completion time).

    One row per user with ``t_<step>`` completion timestamps (NULL once
    the funnel breaks). Each stage is a per-user min-agg on the same
    user_id key; Spark reuses the hash partitioning across stages, so the
    chain costs one shuffle of the events table plus vocabulary-sized
    joins.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = None
    for i, step in enumerate(steps):
        filt = events.where(F.col(type_col) == step)
        if cur is not None:
            prev_col = f"t_{steps[i - 1]}"
            filt = filt.join(
                cur.select(user_col, prev_col), user_col
            ).where(F.col(ts_col) >= F.col(prev_col))
        stage = filt.groupBy(user_col).agg(
            F.min(ts_col).alias(f"t_{step}")
        )
        if cur is None:
            cur = stage
        else:
            cur = cur.join(stage, user_col, "left")
    return cur


def funnel_summary(
    funnel_df: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Step-completion counts from a ``funnel`` result (one row)."""
    return funnel_df.agg(
        *[F.count(f"t_{s}").alias(f"n_{s}") for s in steps]
    )
