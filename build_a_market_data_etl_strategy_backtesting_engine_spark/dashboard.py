"""Live dashboard: the reference's Flask surface on the stdlib HTTP server.

Route-for-route parity with ``/root/reference/backtesting/dashboard.py``
(:44-110): ``/`` serves the HTML report, ``/api/performance`` /
``/api/positions`` / ``/api/orders`` / ``/api/risk`` / ``/api/summary``
serve the collected state as JSON, and POST ``/api/update`` replaces it.
Flask is not available in this container (no installs), and is not needed:
``http.server.ThreadingHTTPServer`` in a daemon thread gives the same
read-mostly JSON API.

Like report.py, this is a DRIVER-EDGE component: it serves bounded,
already-collected results — the data plane stays distributed. At scale the
update path is "run the Spark job, collect the aggregate, POST it here",
exactly the reference's update_data flow.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from build_a_market_data_etl_strategy_backtesting_engine_spark.report import (
    html_report,
)

_API_KEYS = ("performance", "positions", "orders", "risk")


class Dashboard:
    """In-process dashboard server (dashboard.py:15-118 parity).

    >>> d = Dashboard()
    >>> d.update(performance=[...], positions=[...])
    >>> port = d.start(port=0)   # 0 -> ephemeral; returns the bound port
    >>> ... GET http://localhost:{port}/api/summary ...
    >>> d.stop()
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._state: dict = {k: [] for k in _API_KEYS}
        self._metrics_rows: list[dict] = []
        self._curves: dict[str, list[float]] = {}
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- state

    def update(self, metrics_rows=None, curves=None, **sections) -> None:
        """Replace dashboard state (the POST /api/update semantics).
        ``sections`` are the API payloads (performance/positions/orders/
        risk); ``metrics_rows``/``curves`` feed the HTML report at ``/``."""
        with self._lock:
            for k, v in sections.items():
                if k not in _API_KEYS:
                    raise ValueError(f"unknown section {k!r}")
                self._state[k] = v
            if metrics_rows is not None:
                self._metrics_rows = list(metrics_rows)
            if curves is not None:
                self._curves = dict(curves)

    def _snapshot(self) -> tuple[dict, list[dict], dict]:
        with self._lock:
            return (
                {k: v for k, v in self._state.items()},
                list(self._metrics_rows),
                dict(self._curves),
            )

    # ------------------------------------------------------------ server

    def start(self, host: str = "127.0.0.1", port: int = 8050) -> int:
        """Start serving in a daemon thread; returns the bound port
        (pass ``port=0`` for an ephemeral one)."""
        dash = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test/driver output
                pass

            def _json(self, payload, code=200):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                state, metrics_rows, curves = dash._snapshot()
                if self.path == "/":
                    body = html_report(metrics_rows, curves).encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/api/summary":
                    # dashboard.py:74-91: one bundle of every section
                    self._json({k: state[k] for k in _API_KEYS})
                elif self.path.startswith("/api/"):
                    key = self.path[len("/api/"):]
                    if key in _API_KEYS:
                        self._json(state[key])
                    else:
                        self._json({"error": "not found"}, 404)
                else:
                    self._json({"error": "not found"}, 404)

            def do_POST(self):
                if self.path != "/api/update":
                    self._json({"error": "not found"}, 404)
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    dash.update(**{
                        k: v for k, v in payload.items() if k in _API_KEYS})
                except (ValueError, TypeError) as e:
                    self._json({"error": str(e)}, 400)
                    return
                self._json({"status": "ok"})

        self._server = ThreadingHTTPServer((host, port), _Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
            self._thread = None
