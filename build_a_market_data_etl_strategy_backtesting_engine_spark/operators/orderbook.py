"""Event-driven simulation: limit order book matching + sequential portfolio.

Reference semantics, ported exactly (cited per method):
- ``/root/reference/backtesting/order_book.py`` — Order/Trade dataclasses
  (:36-72), book heaps (:75-203), market-order fill with slippage (:268-300),
  marketable-limit immediate fill (:302-331), resting-limit match on tick
  (:391-460), rejection rules (:259-266).
- ``/root/reference/backtesting/engine.py:167-230`` — event-driven engine:
  desired-position diff -> market orders of 100 shares per signal unit
  (:194-195), cash check, mark-to-market per bar.
- ``/root/reference/backtesting/portfolio.py:39-92`` — execute_trade
  (commission+slippage, insufficient-cash rejection).

Spark design (SURVEY §3.4): these are inherently sequential per symbol —
the ONE operator family where imperative code is the correct answer. Batch:
``applyInPandas`` per symbol with the loop inside the group (cross-symbol
parallelism, exact within-symbol sequencing). Streaming: the same kernel
drops into ``transformWithStateInPandas`` keyed by symbol. A shared cash
account across symbols forces a single group — same limit as the reference
(documented divergence: we default to per-symbol cash budgets to stay
parallel; pass ``shared_cash=True`` to replicate global-cash coupling).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class _Book:
    """Per-symbol price-time-priority book (order_book.py:75-203)."""
    bids: list = field(default_factory=list)  # (-price, seq, order)
    asks: list = field(default_factory=list)  # (price, seq, order)
    seq: int = 0

    def add(self, order: dict) -> None:
        self.seq += 1
        if order["side"] == "buy":
            heapq.heappush(self.bids, (-order["price"], self.seq, order))
        else:
            heapq.heappush(self.asks, (order["price"], self.seq, order))

    def best_bid(self):
        return -self.bids[0][0] if self.bids else None

    def best_ask(self):
        return self.asks[0][0] if self.asks else None


def simulate_order_book(
    orders: DataFrame,
    ticks: DataFrame,
    slippage_pct: float = 0.001,
    symbol_col: str = "symbol",
    emit: str = "fills",
    cross_orders: bool = False,
) -> DataFrame:
    """Replay orders + ticks through the matching engine per symbol.

    Inputs: ``orders(order_id, ts, symbol, side, order_type, quantity,
    price, stop_price)`` and ``ticks(ts, symbol, price, ...)``; both streams
    are merged in time order per symbol (order events act before the tick at
    equal timestamps, matching the reference's submit-then-process flow).

    Output: trade fills ``(trade_id, ts, symbol, side, quantity, price,
    order_id)``.

    Matching rules (order_book.py):
    - market order: fill at last price +/- slippage_pct (buy pays up, sell
      receives less) (:268-300); rejected if no last price yet.
    - limit order: marketable (buy >= best ask / latest price, sell <=) ->
      immediate fill at the limit (conservative, :302-331); else rests.
    - stop / stop_limit (:333-360): rests until the tick crosses stop_price
      (sell: last <= stop, buy: last >= stop), then executes as a market
      (slippage) resp. limit order.
    - each tick: resting buy limits with price >= tick fill at limit; sells
      with price <= tick fill at limit (:427-460).

    ``emit='snapshots'`` returns per-tick book state instead of fills:
    ``(ts, symbol, last, best_bid, best_ask, spread, bid_depth, ask_depth)``
    — the get_order_book_snapshot surface (order_book.py:179-203).

    ``cross_orders=True`` enables continuous-double-auction matching BETWEEN
    resting orders — an extension beyond the reference, which only matches
    resting orders against the tick tape (order_book.py:391-460). An
    incoming limit order first sweeps the opposite side of the book in
    price-time priority, trading at each RESTING order's price with partial
    fills (both counterparties get a fill row sharing the trade price);
    any remainder rests (the marketable-vs-last shortcut is disabled — the
    book is the source of truth). A market order sweeps the book first and
    falls back to last-tick +/- slippage only for the unfilled remainder.
    Tick-tape matching and stop triggering are unchanged.
    """
    if emit == "snapshots":
        out_schema = ("ts timestamp, symbol string, last double, "
                      "best_bid double, best_ask double, spread double, "
                      "bid_depth long, ask_depth long")
    else:
        out_schema = ("trade_id string, ts timestamp, symbol string, "
                      "side string, quantity double, price double, "
                      "order_id string")
    slip = float(slippage_pct)

    o = orders.select(
        F.col("ts"), F.col(symbol_col).alias("symbol"),
        F.lit("order").alias("kind"), F.col("order_id"), F.col("side"),
        F.col("order_type"), F.col("quantity"),
        F.col("price").cast("double").alias("price"),
        F.col("stop_price").cast("double").alias("stop_price"),
    )
    t = ticks.select(
        F.col("ts"), F.col(symbol_col).alias("symbol"),
        F.lit("tick").alias("kind"), F.lit(None).cast("string").alias("order_id"),
        F.lit(None).cast("string").alias("side"),
        F.lit(None).cast("string").alias("order_type"),
        F.lit(None).cast("double").alias("quantity"),
        F.col("price").cast("double").alias("price"),
        F.lit(None).cast("double").alias("stop_price"),
    )
    merged = o.unionByName(t)

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        # orders (kind='order') sort before ticks at equal ts
        pdf = pdf.sort_values(["ts", "kind"]).reset_index(drop=True)
        book = _Book()
        last = None
        fills = []
        snaps = []
        stops = []  # resting stop / stop_limit orders
        n = 0

        def fill(order_id, side, qty, px, ts):
            nonlocal n
            n += 1
            fills.append((f"{pdf['symbol'].iloc[0]}-{n}", ts,
                          pdf["symbol"].iloc[0], side, qty, px, order_id))

        def cross(order_id, side, qty, limit_price, ts):
            """Sweep the opposite book in price-time priority; return the
            unfilled remainder. Trades print at the RESTING order's price;
            both counterparties get a fill row."""
            heap = book.asks if side == "buy" else book.bids
            while qty > 0 and heap:
                top_px = heap[0][0] if side == "buy" else -heap[0][0]
                if limit_price is not None and (
                    (side == "buy" and top_px > limit_price)
                    or (side == "sell" and top_px < limit_price)
                ):
                    break
                od = heap[0][2]
                traded = min(qty, od["quantity"])
                fill(order_id, side, traded, top_px, ts)
                fill(od["order_id"], od["side"], traded, top_px, ts)
                qty -= traded
                od["quantity"] -= traded
                if od["quantity"] <= 0:
                    heapq.heappop(heap)
            return qty

        def submit_limit(order_id, side, qty, price, ts):
            if cross_orders:
                qty = cross(order_id, side, qty, price, ts)
                if qty > 0:
                    book.add({"order_id": order_id, "side": side,
                              "quantity": qty, "price": price})
                return
            marketable = last is not None and (
                (side == "buy" and price >= last)
                or (side == "sell" and price <= last)
            )
            if marketable:
                fill(order_id, side, qty, price, ts)
            else:
                book.add({"order_id": order_id, "side": side,
                          "quantity": qty, "price": price})

        for row in pdf.itertuples(index=False):
            if row.kind == "tick":
                last = row.price
                # trigger resting stops (order_book.py:333-360)
                still = []
                for od in stops:
                    hit = (od["side"] == "sell" and last <= od["stop_price"]) \
                        or (od["side"] == "buy" and last >= od["stop_price"])
                    if hit:
                        if od["order_type"] == "stop":
                            px = last * (1 + slip) if od["side"] == "buy" \
                                else last * (1 - slip)
                            fill(od["order_id"], od["side"], od["quantity"],
                                 px, row.ts)
                        else:  # stop_limit -> becomes a limit order
                            submit_limit(od["order_id"], od["side"],
                                         od["quantity"], od["price"], row.ts)
                    else:
                        still.append(od)
                stops[:] = still
                # match resting limits against the tick (order_book.py:427-460)
                while book.bids and -book.bids[0][0] >= last:
                    _, _, od = heapq.heappop(book.bids)
                    fill(od["order_id"], "buy", od["quantity"], od["price"],
                         row.ts)
                while book.asks and book.asks[0][0] <= last:
                    _, _, od = heapq.heappop(book.asks)
                    fill(od["order_id"], "sell", od["quantity"], od["price"],
                         row.ts)
                if emit == "snapshots":
                    bb, ba = book.best_bid(), book.best_ask()
                    snaps.append((row.ts, pdf["symbol"].iloc[0], last, bb, ba,
                                  (ba - bb) if bb is not None
                                  and ba is not None else None,
                                  len(book.bids), len(book.asks)))
            else:
                if row.order_type == "market":
                    qty = row.quantity
                    if cross_orders:
                        qty = cross(row.order_id, row.side, qty, None, row.ts)
                        if qty <= 0:
                            continue
                    if last is None:
                        continue  # rejected: no reference price (:277-280)
                    px = last * (1 + slip) if row.side == "buy" else last * (1 - slip)
                    fill(row.order_id, row.side, qty, px, row.ts)
                elif row.order_type == "limit":
                    if row.price is None or not row.price == row.price:
                        continue  # rejected: limit requires price (:259-261)
                    submit_limit(row.order_id, row.side, row.quantity,
                                 row.price, row.ts)
                elif row.order_type in ("stop", "stop_limit"):
                    sp = row.stop_price
                    if sp is None or not sp == sp:
                        continue  # rejected: stop requires stop_price
                    stops.append({"order_id": row.order_id, "side": row.side,
                                  "quantity": row.quantity, "price": row.price,
                                  "stop_price": sp,
                                  "order_type": row.order_type})
        if emit == "snapshots":
            return pd.DataFrame(
                snaps, columns=["ts", "symbol", "last", "best_bid",
                                "best_ask", "spread", "bid_depth",
                                "ask_depth"],
            )
        return pd.DataFrame(
            fills, columns=["trade_id", "ts", "symbol", "side", "quantity",
                            "price", "order_id"],
        )

    return merged.groupBy("symbol").applyInPandas(_run, out_schema)


def event_driven_backtest(
    bars: DataFrame,
    initial_cash: float = 1_000_000.0,
    commission: float = 0.001,
    slippage: float = 0.0005,
    shares_per_unit: float = 100.0,
    price_col: str = "close",
    signal_col: str = "signal",
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    shared_cash: bool = False,
    n_symbols: int | None = None,
) -> DataFrame:
    """Event-driven engine (engine.py:167-230): iterate bars in time order,
    trade toward desired position = signal * shares_per_unit via market
    orders with commission+slippage, reject on insufficient cash, mark to
    market each bar.

    Output per bar: ``(symbol, ts, price, signal, position, cash, equity)``.
    ``shared_cash=True`` runs everything in one group (global cash account,
    sequential like the reference); default is per-symbol cash =
    initial_cash / n_symbols, preserving parallelism.  ``n_symbols`` makes
    the per-symbol budget explicit; when omitted it is derived lazily via a
    broadcast 1-row countDistinct frame (no eager job at plan-build time).
    """
    out_schema = (f"{symbol_col} string, {ts_col} timestamp, price double, "
                  "signal int, position double, cash double, equity double")
    comm, slip = float(commission), float(slippage)

    if shared_cash:
        grouped = bars.withColumn(
            "_budget", F.lit(float(initial_cash))
        ).withColumn("_g", F.lit(1)).groupBy("_g")
    else:
        if n_symbols is not None:
            budget_col = F.lit(float(initial_cash) / max(n_symbols, 1))
            wtd = bars.withColumn("_budget", budget_col)
        else:
            n_df = bars.select(
                (F.lit(float(initial_cash))
                 / F.greatest(F.countDistinct(symbol_col), F.lit(1))
                 ).alias("_budget")
            )
            wtd = bars.crossJoin(F.broadcast(n_df))
        grouped = wtd.groupBy(symbol_col)

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        budget = float(pdf["_budget"].iloc[0])
        pdf = pdf.drop(columns=["_budget"])
        pdf = pdf.sort_values([ts_col, symbol_col]).reset_index(drop=True)
        cash = budget
        positions: dict[str, float] = {}
        last_px: dict[str, float] = {}
        rows = []
        for row in pdf.itertuples(index=False):
            sym = getattr(row, symbol_col)
            px = getattr(row, price_col)
            sig = getattr(row, signal_col) or 0
            last_px[sym] = px
            desired = sig * shares_per_unit
            cur = positions.get(sym, 0.0)
            delta = desired - cur
            if delta != 0:
                # buy pays slippage up, sell receives slippage down
                exec_px = px * (1 + slip) if delta > 0 else px * (1 - slip)
                cost = abs(delta) * exec_px
                fee = cost * comm
                if delta > 0 and cost + fee > cash:
                    pass  # rejected: insufficient cash (portfolio.py:60-66)
                else:
                    cash -= delta * exec_px
                    cash -= fee
                    positions[sym] = desired
            # mark-to-market with latest known prices (engine.py:206-212)
            equity = cash + sum(
                positions.get(s, 0.0) * last_px.get(s, 0.0) for s in positions
            )
            rows.append((sym, getattr(row, ts_col), px, int(sig),
                         positions.get(sym, 0.0), cash, equity))
        out = pd.DataFrame(rows, columns=[symbol_col, ts_col, "price",
                                          "signal", "position", "cash",
                                          "equity"])
        return out

    if shared_cash:
        return grouped.applyInPandas(
            lambda pdf: _run(pdf.drop(columns=["_g"])), out_schema)
    return grouped.applyInPandas(_run, out_schema)
