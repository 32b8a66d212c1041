"""Stream-stream as-of enrichment: trades joined to the prevailing quote.

The reference enriches trades against quotes only in batch (its
normalizer aligns them offline); live enrichment is the canonical
stream-stream problem — a trade must meet a quote that may arrive in an
EARLIER or LATER micro-batch. Structured Streaming's watermarked interval
join holds exactly the in-horizon slice of both streams in state and
pairs across micro-batch boundaries; a chained event-time-windowed
``max_by`` then elects the latest in-tolerance quote per trade (multiple
stateful operators per query — native Spark 4 capability, zero Python).

Semantics (identical to the batch ``operators/joins.asof_join`` with
``direction='backward'`` and a tolerance, pinned by test): for each trade
the last quote of the same symbol with ``quote.ts`` in
``[trade.ts - tolerance, trade.ts]``; trades with no such quote pass
through with null quote fields.

State bound: per symbol, the join buffers one tolerance + watermark
horizon of each stream; the election agg holds one open window per
(symbol, window). Both are watermark-evicted — no unbounded state.

Scale shape: ONE exchange per side on (symbol) for the join, the
election reuses the join's output partitioning. Skewed symbols salt the
same way batch ticks do (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_quote_enrich"]


def streaming_quote_enrich(
    trades: DataFrame,
    quotes: DataFrame,
    tolerance: str = "5 minutes",
    watermark: str = "10 seconds",
    window: str = "1 minute",
    ts_col: str = "ts",
    symbol_col: str = "symbol",
    seq_col: str = "seq",
) -> DataFrame:
    """Enrich each trade with the latest in-tolerance quote (bid/ask/mid,
    spread, quote age) via a watermarked stream-stream interval join.

    ``window`` buckets the election aggregate's event time (required for
    the chained stateful operator to be watermark-bounded); it does NOT
    affect semantics — the group key is the trade identity, the window
    merely scopes state eviction.

    Works identically on batch frames (the interval join degrades to a
    plain range join, the watermark is a no-op) — the batch==stream
    equivalence test relies on that.
    """
    t = trades.select(
        F.col(symbol_col).alias("symbol"),
        F.col(ts_col).alias("t_ts"),
        F.col(seq_col).alias("t_seq"),
        F.col("price"),
        F.col("volume"),
    )
    q = quotes.select(
        F.col(symbol_col).alias("q_symbol"),
        F.col(ts_col).alias("q_ts"),
        F.col("bid"),
        F.col("ask"),
    )
    if trades.isStreaming:
        t = t.withWatermark("t_ts", watermark)
    if quotes.isStreaming:
        q = q.withWatermark("q_ts", watermark)

    joined = t.join(
        q,
        (F.col("symbol") == F.col("q_symbol"))
        & (F.col("q_ts") <= F.col("t_ts"))
        & (F.col("q_ts") >= F.col("t_ts") - F.expr(f"INTERVAL {tolerance}")),
        "leftOuter",
    )

    # ordering key is struct(q_ts, bid, ask): latest quote wins, and two
    # quotes sharing an identical q_ts within tolerance resolve by the
    # lexicographic (bid, ask) tie-break instead of engine/run order —
    # the election is deterministic without requiring callers to
    # pre-dedupe quotes per (symbol, ts) (r5 ADVICE)
    best = F.max_by(
        F.struct("bid", "ask", "q_ts"),
        F.struct(F.col("q_ts"), F.col("bid"), F.col("ask")),
    ).alias("_q")
    # the trade instant rides through the aggregate as a PLAIN long
    # (unix micros): only window(t_ts) may remain an event-time column in
    # the chained stateful aggregate — grouping by the raw watermarked
    # t_ts as well makes the event-time column ambiguous and the query
    # fails at runtime
    enriched = (
        joined.withColumn("_t_us", F.unix_micros("t_ts"))
        .groupBy(
            F.window("t_ts", window).alias("_w"),
            "symbol", "t_seq", "_t_us", "price", "volume",
        )
        .agg(best)
        .select(
            "symbol",
            F.timestamp_micros("_t_us").alias("ts"),
            F.col("t_seq").alias("seq"),
            "price", "volume",
            F.col("_q.bid").alias("bid"),
            F.col("_q.ask").alias("ask"),
            F.round((F.col("_q.bid") + F.col("_q.ask")) / 2.0, 8)
            .alias("mid"),
            F.round(F.col("_q.ask") - F.col("_q.bid"), 8).alias("spread"),
            (F.col("_t_us") - F.unix_micros("_q.q_ts"))
            .alias("quote_age_us"),
        )
    )
    return enriched
