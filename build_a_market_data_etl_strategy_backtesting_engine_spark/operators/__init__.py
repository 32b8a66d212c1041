"""Relational operators of the engine (cleaning, bars, signals, backtest,
metrics, risk, dedup/similarity/text, event-driven simulation)."""
