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


_PANEL_JS = """
(function(){
  const DATA = __DATA__;
  const W = 900, H = 180, PAD = 40;
  const root = document.getElementById('panels');
  const x = i => PAD + i * (W - PAD - 10) / Math.max(1, DATA.ts.length - 1);
  function scaleY(vals){
    const lo = Math.min(...vals), hi = Math.max(...vals);
    const span = (hi - lo) || 1;
    return v => H - 24 - (v - lo) / span * (H - 44);
  }
  function panel(title, vals, color, fill, bar){
    const y = scaleY(vals);
    let marks;
    if (bar) {
      const y0 = y(0);
      marks = vals.map((v,i) =>
        `<rect x="${x(i)-1}" y="${Math.min(y(v),y0)}" width="2" ` +
        `height="${Math.abs(y(v)-y0)||1}" fill="${color}"/>`).join('');
    } else {
      const pts = vals.map((v,i)=>`${x(i).toFixed(1)},${y(v).toFixed(1)}`).join(' ');
      marks = fill
        ? `<polygon points="${x(0)},${y(0)} ${pts} ${x(vals.length-1)},${y(0)}"
             fill="${color}22" stroke="none"/>` +
          `<polyline points="${pts}" fill="none" stroke="${color}" stroke-width="1.5"/>`
        : `<polyline points="${pts}" fill="none" stroke="${color}" stroke-width="1.5"/>`;
    }
    const div = document.createElement('div');
    div.innerHTML =
      `<h3>${title}</h3>` +
      `<svg width="${W}" height="${H}" data-panel>${marks}` +
      `<line data-cross x1="0" x2="0" y1="0" y2="${H}" stroke="#888" ` +
      `stroke-dasharray="3,3" visibility="hidden"/>` +
      `<text data-tip x="0" y="14" font-size="12" fill="#111"></text></svg>`;
    root.appendChild(div);
    return {vals, y, svg: div.querySelector('svg'), title};
  }
  const panels = [];
  panels.push(panel('Equity Curve', DATA.equity, '#2563eb', false, false));
  panels.push(panel('Drawdown (%)', DATA.drawdown, '#dc2626', true, false));
  if (DATA.position) panels.push(panel('Position', DATA.position, '#16a34a', false, true));
  // shared-x hover: crosshair + value tooltip on every panel at once
  // (the plotly shared_xaxes behavior, visualization.py:261-268)
  root.addEventListener('mousemove', ev => {
    const r = panels[0].svg.getBoundingClientRect();
    const px = ev.clientX - r.left;
    const n = DATA.ts.length;
    const i = Math.max(0, Math.min(n - 1,
      Math.round((px - PAD) / ((W - PAD - 10) / Math.max(1, n - 1)))));
    for (const p of panels){
      const cr = p.svg.querySelector('[data-cross]');
      const tip = p.svg.querySelector('[data-tip]');
      cr.setAttribute('x1', x(i)); cr.setAttribute('x2', x(i));
      cr.setAttribute('visibility', 'visible');
      tip.textContent = `${DATA.ts[i]}  ${p.title}: ${p.vals[i].toFixed(4)}`;
    }
  });
  root.addEventListener('mouseleave', () => {
    for (const p of panels)
      p.svg.querySelector('[data-cross]').setAttribute('visibility','hidden');
  });
})();
"""


def interactive_html(
    ts: Sequence[str],
    equity: Sequence[float],
    position: Sequence[float] | None = None,
    title: str = "Backtest Results",
) -> str:
    """Interactive report twin of the reference's plotly figure
    (``visualization.py:246-347``): the same three shared-x panels — equity
    curve, filled drawdown %, position bars — with a linked hover crosshair
    and per-panel value tooltip. Implemented as ~60 lines of inline vanilla
    JS over SVG instead of plotly (not in this container, and a CDN
    ``<script src>`` would break offline), so the artifact stays a single
    self-contained file like everything else in this module."""
    import json as _json

    eq = [float(v) for v in equity]
    runmax, dd = float("-inf"), []
    for v in eq:
        runmax = max(runmax, v)
        dd.append((v - runmax) / runmax * 100.0 if runmax else 0.0)
    data = {
        "ts": [str(t) for t in ts],
        "equity": eq,
        "drawdown": dd,
        "position": [float(p) for p in position] if position else None,
    }
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title>"
        "<style>body{font:14px system-ui;margin:2rem;color:#111}"
        "h3{margin:1rem 0 .2rem}</style></head><body>"
        f"<h1>{html.escape(title)}</h1><div id='panels'></div>"
        "<script>"
        + _PANEL_JS.replace("__DATA__", _json.dumps(data))
        + "</script></body></html>"
    )


def create_interactive_report(
    results_df,
    path: str,
    max_points: int = 2000,
    symbol: str | None = None,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    equity_col: str = "equity",
    position_col: str = "position",
) -> str:
    """Spark edge for ``interactive_html``: bounded driver-side collect of
    one symbol's (ts, equity, position) curve — same downsampling discipline
    as ``create_report``."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = results_df
    if symbol is None:
        symbol = df.select(symbol_col).orderBy(symbol_col).first()[0]
    df = df.filter(F.col(symbol_col) == symbol).orderBy(ts_col)
    n = df.count()
    stride = max(1, n // max_points)
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    rows = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") % stride) == 0)
        .select(ts_col, equity_col, position_col)
        .collect()
    )
    doc = interactive_html(
        [r[ts_col] for r in rows],
        [r[equity_col] for r in rows],
        [r[position_col] for r in rows] if position_col in results_df.columns
        else None,
        title=f"Backtest Results — {symbol}",
    )
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
