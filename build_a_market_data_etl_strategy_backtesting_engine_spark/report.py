"""Driver-edge reporting: collected results -> text/HTML summary.

Reference surface: ``/root/reference/backtesting/visualization.py`` (equity/
drawdown/distribution plots :23-244, HTML report bundle :349-391) and the
Flask dashboard's summary endpoints (``dashboard.py:47-110``). Plotting
libraries are optional here (matplotlib gated behind import-try, absent in
this container); the always-available path renders an HTML report with an
inline SVG equity/drawdown sparkline — zero dependencies, works anywhere.

These run on COLLECTED data (a limited/aggregated result set), never inside
the data plane — the engine's outputs stay distributed until this edge.
"""

from __future__ import annotations

import html
from typing import Sequence


def _fmt(v, pct=False) -> str:
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:.2%}" if pct else f"{v:,.4f}"
    return str(v)


PCT_KEYS = {"total_return", "cagr", "volatility", "max_drawdown", "win_rate",
            "exposure", "avg_win", "avg_loss"}


def summary_table(metrics_rows: Sequence[dict]) -> str:
    """Plain-text metrics table (the engine.get_summary surface,
    engine.py:85-99)."""
    if not metrics_rows:
        return "(no results)"
    keys = [k for k in metrics_rows[0].keys() if k != "symbol"]
    lines = []
    header = f"{'symbol':<12}" + "".join(f"{k:>22}" for k in keys)
    lines.append(header)
    lines.append("-" * len(header))
    for row in metrics_rows:
        lines.append(
            f"{str(row.get('symbol', '')):<12}"
            + "".join(f"{_fmt(row.get(k), k in PCT_KEYS):>22}" for k in keys)
        )
    return "\n".join(lines)


def _svg_sparkline(values: Sequence[float], width=640, height=120,
                   color="#2563eb") -> str:
    if not values or len(values) < 2:
        return ""
    lo, hi = min(values), max(values)
    span = (hi - lo) or 1.0
    pts = " ".join(
        f"{i * width / (len(values) - 1):.1f},"
        f"{height - (v - lo) / span * (height - 8) - 4:.1f}"
        for i, v in enumerate(values)
    )
    return (f'<svg width="{width}" height="{height}" '
            f'xmlns="http://www.w3.org/2000/svg">'
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{pts}"/></svg>')


def html_report(
    metrics_rows: Sequence[dict],
    equity_curves: dict[str, Sequence[float]] | None = None,
    title: str = "Backtest report",
) -> str:
    """Self-contained HTML report (visualization.create_report parity,
    :349-391): metrics table + per-symbol equity sparkline + drawdown
    sparkline, all inline SVG."""
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>",
        "<style>body{font:14px system-ui;margin:2rem;color:#111}"
        "table{border-collapse:collapse}td,th{border:1px solid #ddd;"
        "padding:4px 10px;text-align:right}th{background:#f5f5f5}"
        "td:first-child,th:first-child{text-align:left}</style></head><body>",
        f"<h1>{html.escape(title)}</h1>",
    ]
    if metrics_rows:
        keys = [k for k in metrics_rows[0].keys() if k != "symbol"]
        parts.append("<table><tr><th>symbol</th>"
                     + "".join(f"<th>{html.escape(k)}</th>" for k in keys)
                     + "</tr>")
        for row in metrics_rows:
            parts.append(
                "<tr><td>" + html.escape(str(row.get("symbol", ""))) + "</td>"
                + "".join(
                    f"<td>{_fmt(row.get(k), k in PCT_KEYS)}</td>" for k in keys)
                + "</tr>")
        parts.append("</table>")
    for sym, curve in (equity_curves or {}).items():
        curve = list(curve)
        parts.append(f"<h2>{html.escape(sym)} — equity</h2>")
        parts.append(_svg_sparkline(curve))
        runmax, dd = [], []
        m = float("-inf")
        for v in curve:
            m = max(m, v)
            dd.append((v - m) / m if m else 0.0)
        parts.append(f"<h2>{html.escape(sym)} — drawdown</h2>")
        parts.append(_svg_sparkline(dd, color="#dc2626"))
    parts.append("</body></html>")
    return "".join(parts)


def create_report(
    results_df,
    metrics_df,
    path: str,
    max_points: int = 2000,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    equity_col: str = "equity",
) -> str:
    """Collect (bounded) results + metrics and write the HTML bundle.
    Downsamples each equity curve to <= max_points driver-side rows."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    metrics_rows = [r.asDict() for r in metrics_df.collect()]
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    n_per = results_df.groupBy(symbol_col).count().collect()
    curves: dict[str, list[float]] = {}
    if n_per:
        stride = max(1, max(r["count"] for r in n_per) // max_points)
        sampled = (
            results_df.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") % stride) == 0)
            .select(symbol_col, ts_col, equity_col)
            .collect()
        )
        for r in sorted(sampled, key=lambda r: (r[symbol_col], r[ts_col])):
            curves.setdefault(r[symbol_col], []).append(r[equity_col])
    doc = html_report(metrics_rows, curves)
    with open(path, "w") as f:
        f.write(doc)
    return path


def plot_equity_matplotlib(results_pdf, path: str):
    """Optional matplotlib path (reference parity) — gated import."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as exc:
        raise NotImplementedError(
            "matplotlib not available in this environment; use html_report"
        ) from exc
    fig, ax = plt.subplots(figsize=(10, 4))
    for sym, g in results_pdf.groupby("symbol"):
        ax.plot(g["ts"], g["equity"], label=sym)
    ax.legend()
    fig.savefig(path)
    return path
