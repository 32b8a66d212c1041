"""Live WebSocket feed -> Spark streaming ingest, end to end.

Demonstrates the r4 RFC 6455 path (`streaming/websocket.py`):

1. a tiny in-process ws:// server stands in for an exchange feed
   (it speaks the reference's frame shapes: canonical, single-letter
   aliases, `data` envelopes — etl/websocket_client.py:99-117);
2. `ws_tick_source` terminates the feed (handshake, subscribe,
   heartbeat, reconnect-with-resume) and bridges it into Spark's
   socket source;
3. the SAME normalizer as every batch path shapes the rows, and a
   memory sink shows them arriving.

Run:  python examples/ws_feed.py
"""

from __future__ import annotations

import json
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from build_a_market_data_etl_strategy_backtesting_engine_spark.session import get_spark
from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming import websocket as wsx


def fake_exchange_server():
    """Minimal ws server: handshake, read subscribe, stream ticks."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(2)
    port = srv.getsockname()[1]

    def handshake(conn):
        data = b""
        while b"\r\n\r\n" not in data:
            data += conn.recv(4096)
        key = next(ln.split(":", 1)[1].strip()
                   for ln in data.decode("latin-1").split("\r\n")
                   if ln.lower().startswith("sec-websocket-key"))
        conn.sendall((
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {wsx.handshake_accept_key(key)}\r\n\r\n"
        ).encode())

    def serve():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            handshake(conn)
            # drain the subscribe frame, then stream ticks forever
            conn.settimeout(0.1)
            buf = bytearray()
            t0 = time.time()
            i = 0
            while time.time() - t0 < 60:
                try:
                    buf += conn.recv(4096)
                except (socket.timeout, OSError):
                    pass
                frame = json.dumps({
                    "t": int(time.time() * 1000), "s": "AAPL",
                    "p": 100.0 + (i % 50) / 10.0, "v": float(i % 9 + 1),
                    "seq": i,
                })
                try:
                    conn.sendall(wsx.encode_frame(
                        wsx.OP_TEXT, frame.encode(), mask=False))
                except OSError:
                    break
                i += 1
                time.sleep(0.05)

    threading.Thread(target=serve, daemon=True).start()
    return srv, port


def main():
    srv, port = fake_exchange_server()
    spark = get_spark("ws-feed-example", master="local[4]")
    raw, bridge = wsx.ws_tick_source(
        spark, f"ws://127.0.0.1:{port}/feed", ["AAPL"])

    from build_a_market_data_etl_strategy_backtesting_engine_spark.sources.normalizer import (
        normalize_trades,
    )

    ticks = normalize_trades(raw)
    query = (ticks.writeStream.format("memory").queryName("live_ticks")
             .outputMode("append").trigger(processingTime="1 second")
             .start())
    try:
        for _ in range(8):
            time.sleep(2)
            n = spark.sql("SELECT count(*) c FROM live_ticks").first().c
            print(f"rows ingested: {n}   etl stats: {bridge.etl.stats}")
        spark.sql(
            "SELECT * FROM live_ticks ORDER BY ts DESC LIMIT 5").show()
    finally:
        query.stop()
        bridge.close()
        srv.close()
        spark.stop()


if __name__ == "__main__":
    main()
