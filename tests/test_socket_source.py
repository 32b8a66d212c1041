"""Socket-source integration smoke test (closes the SURVEY §2.1 WebSocket
row): a real TCP server emits the reference client's JSON frame shapes
(etl/websocket_client.py:99-117 — plain, aliased, ``data``-enveloped, plus
malformed frames), Spark's socket source ingests them through the SAME
normalizer as every other path, and a StatsListener observes the rows.
"""

from __future__ import annotations

import json
import socket
import threading
import time

from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark.sources.normalizer import (
    RAW_SCHEMA,
    _alias,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming.ingest import (
    StatsListener,
    socket_tick_source,
)

# The shapes the reference's message_handler receives: canonical names,
# single-letter aliases, an envelope, and two frames it drops (malformed
# JSON / missing price).
FRAMES = [
    json.dumps({"timestamp": 1700000000, "symbol": "AAPL",
                "price": 101.5, "volume": 10}),
    json.dumps({"t": 1700000001000, "s": "MSFT", "p": "202.25", "v": 5}),
    json.dumps({"data": {"ticker": "GOOGL", "last": 303.75,
                         "size": 7, "ts": 1700000002}}),
    "{not json at all",
    json.dumps({"symbol": "TSLA", "volume": 3}),  # no price -> dropped
]


class _FeedServer:
    """Single-shot line-delimited JSON feed. Accepts connections until
    closed (Spark may reconnect) and replays the frame script to each."""

    def __init__(self, frames):
        self.frames = frames
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(2)
        self.port = self.sock.getsockname()[1]
        self._stop = threading.Event()
        self._conns = []
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()

    def _serve(self):
        self.sock.settimeout(0.5)
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            self._conns.append(conn)
            try:
                payload = "".join(f + "\n" for f in self.frames)
                conn.sendall(payload.encode())
                # hold the connection open; closing makes the socket source
                # treat the stream as failed and re-connect in a tight loop
            except OSError:
                pass

    def close(self):
        self._stop.set()
        for c in self._conns:
            try:
                c.close()
            except OSError:
                pass
        self.sock.close()
        self._t.join(timeout=2)


def test_socket_feed_normalizes_and_counts_drops(spark, tmp_path):
    server = _FeedServer(FRAMES)
    listener_holder = StatsListener()
    listener = listener_holder.attach(spark)
    query = None
    try:
        raw = socket_tick_source(spark, port=server.port)
        # one query, both sides: parse once, flag validity, land in memory.
        j = F.from_json("value", RAW_SCHEMA)
        flagged = raw.select(
            F.col("value"),
            (j.isNotNull()
             & _alias(j, ["symbol", "s", "ticker"]).isNotNull()
             & _alias(j, ["price", "p", "last"]).cast("double").isNotNull()
             ).alias("ok"),
            _alias(j, ["symbol", "s", "ticker"]).alias("symbol"),
            _alias(j, ["price", "p", "last"]).cast("double").alias("price"),
            F.coalesce(
                _alias(j, ["volume", "v", "size"]).cast("double"), F.lit(0.0)
            ).alias("volume"),
        )
        query = (
            flagged.writeStream.format("memory").queryName("socket_smoke")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("select count(*) c from socket_smoke").first().c >= 5:
                break
            time.sleep(1)
        rows = spark.sql(
            "select * from socket_smoke"
        ).collect()
        assert len(rows) >= 5
        valid = {(r.symbol, r.price, r.volume) for r in rows if r.ok}
        assert ("AAPL", 101.5, 10.0) in valid
        assert ("MSFT", 202.25, 5.0) in valid
        assert ("GOOGL", 303.75, 7.0) in valid  # envelope unwrap
        dropped = [r for r in rows if not r.ok]
        assert len(dropped) == 2  # malformed JSON + missing price
        # listener saw the rows arrive (websocket_client.py:185-204 parity)
        query.processAllAvailable()
        time.sleep(1)
        assert sum(p["numInputRows"] for p in listener_holder.progress) >= 5
    finally:
        if query is not None:
            query.stop()
        spark.streams.removeListener(listener)
        server.close()
