"""RFC 6455 WebSocket client tests (closes the last SURVEY §2.1 partial).

A REAL stdlib ws server fixture does the opening handshake, reads the
client's masked subscribe frame, and drives scripted scenarios: aliased /
enveloped / malformed frames (the reference message shapes,
etl/websocket_client.py:99-117), server pings, fragmented messages,
connection kills with seq-resume on reconnect, and a full Spark
socket-bridge round trip.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time

import pytest

from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming import websocket as wsx


# --------------------------------------------------------------- fixture


def _read_http_request(conn: socket.socket) -> dict:
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = conn.recv(4096)
        if not chunk:
            raise ConnectionError("client vanished during handshake")
        data += chunk
    headers = {}
    for ln in data.decode("latin-1").split("\r\n")[1:]:
        k, _, v = ln.partition(":")
        if k:
            headers[k.strip().lower()] = v.strip()
    return headers


def _server_handshake(conn: socket.socket) -> None:
    headers = _read_http_request(conn)
    accept = wsx.handshake_accept_key(headers["sec-websocket-key"])
    conn.sendall((
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Accept: {accept}\r\n"
        "\r\n"
    ).encode())


class _WsConn:
    """Server side of one accepted ws connection."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.buf = bytearray()
        _server_handshake(sock)

    def recv_frame(self, timeout: float = 5.0):
        self.sock.settimeout(0.1)
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            frame = wsx.decode_frame(self.buf)
            if frame is not None:
                fin, opcode, payload, used = frame
                del self.buf[:used]
                return fin, opcode, payload
            try:
                chunk = self.sock.recv(65536)
            except socket.timeout:
                continue
            if not chunk:
                raise ConnectionError("client closed")
            self.buf += chunk
        raise TimeoutError("no frame within timeout")

    def recv_subscribe(self) -> dict:
        while True:
            fin, opcode, payload = self.recv_frame()
            if opcode == wsx.OP_TEXT:
                return json.loads(payload.decode())

    def send_text(self, text: str) -> None:
        self.sock.sendall(wsx.encode_frame(wsx.OP_TEXT, text.encode(),
                                           mask=False))

    def send_raw(self, data: bytes) -> None:
        self.sock.sendall(data)

    def kill(self) -> None:
        """Drop the TCP connection without a close frame (crash sim)."""
        try:
            self.sock.setsockopt(
                socket.SOL_SOCKET, socket.SO_LINGER,
                struct.pack("ii", 1, 0))  # RST on close
            self.sock.close()
        except OSError:
            pass


class WsTestServer:
    """Accept loop running ``handler(conn: _WsConn, n: int)`` per
    connection (n = 0-based connection index)."""

    def __init__(self, handler, ssl_context=None):
        self.handler = handler
        self.ssl_context = ssl_context
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]
        scheme = "wss" if ssl_context else "ws"
        self.url = f"{scheme}://127.0.0.1:{self.port}/feed"
        self.errors: list[BaseException] = []
        self._stop = threading.Event()
        self._n = 0
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self):
        self.srv.settimeout(0.3)
        while not self._stop.is_set():
            try:
                conn, _ = self.srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            try:
                if self.ssl_context is not None:
                    conn = self.ssl_context.wrap_socket(
                        conn, server_side=True)
                self.handler(_WsConn(conn), self._n)
            except (ConnectionError, TimeoutError, OSError):
                pass
            except BaseException as e:  # real assertion failures surface
                self.errors.append(e)
            self._n += 1

    def close(self):
        self._stop.set()
        try:
            self.srv.close()
        except OSError:
            pass
        self._t.join(timeout=2)
        assert not self.errors, self.errors


# --------------------------------------------------------------- codec


@pytest.mark.parametrize("n", [0, 1, 125, 126, 300, 65535, 70000])
@pytest.mark.parametrize("mask", [True, False])
def test_frame_codec_roundtrip(n, mask):
    payload = bytes(i % 251 for i in range(n))
    raw = wsx.encode_frame(wsx.OP_BINARY, payload, mask=mask)
    fin, opcode, got, used = wsx.decode_frame(raw + b"trailing")
    assert fin and opcode == wsx.OP_BINARY
    assert got == payload
    assert used == len(raw)
    # partial buffers must return None, never a torn frame
    assert wsx.decode_frame(raw[:max(1, len(raw) // 2)]) is None


def test_parse_ws_url():
    assert wsx.parse_ws_url("ws://h:81/a/b") == ("h", 81, "/a/b", False)
    assert wsx.parse_ws_url("ws://h") == ("h", 80, "/", False)
    assert wsx.parse_ws_url("wss://h/x") == ("h", 443, "/x", True)
    assert wsx.parse_ws_url("wss://h:8443") == ("h", 8443, "/", True)
    with pytest.raises(ValueError):
        wsx.parse_ws_url("http://nope")


# --------------------------------------------------------------- handshake + frames


REF_FRAMES = [
    json.dumps({"timestamp": 1700000000, "symbol": "AAPL",
                "price": 101.5, "volume": 10}),
    json.dumps({"t": 1700000001000, "s": "MSFT", "p": "202.25", "v": 5}),
    json.dumps({"data": {"ticker": "GOOGL", "last": 303.75,
                         "size": 7, "ts": 1700000002}}),
    "{not json at all",
    json.dumps({"symbol": "TSLA", "volume": 3}),
]


def test_subscribe_and_reference_frame_shapes():
    """Connect -> subscribe -> the reference's message shapes stream
    through; malformed JSON increments errors, everything else lands in
    the queue (websocket_client.py:99-147 parity)."""
    seen_subscribe = {}

    def handler(conn: _WsConn, n: int):
        sub = conn.recv_subscribe()
        seen_subscribe.update(sub)
        for f in REF_FRAMES:
            conn.send_text(f)
        time.sleep(1.0)  # let the client drain before we hang up

    server = WsTestServer(handler)
    etl = wsx.LiveWsETL(server.url, ["AAPL", "MSFT"], max_reconnects=0)
    try:
        etl.start()
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and \
                etl.stats["messages_received"] < len(REF_FRAMES):
            time.sleep(0.05)
        stats = etl.stats
        assert stats["messages_received"] == 5
        assert stats["errors"] == 1          # the malformed JSON frame
        assert stats["messages_processed"] == 4
        assert seen_subscribe == {"type": "subscribe",
                                  "symbols": ["AAPL", "MSFT"]}
        recs = etl.drain()
        assert [r.get("symbol") or r.get("s") or r["data"]["ticker"]
                for r in recs] == ["AAPL", "MSFT", "GOOGL", "TSLA"]
    finally:
        etl.stop()
        server.close()


def test_ping_pong_heartbeat():
    """Server ping -> client pong (RFC requirement); client heartbeat
    pings arrive at the server (websocket_client.py:179-183 parity)."""
    got = {"pong": False, "ping": False}

    def handler(conn: _WsConn, n: int):
        conn.recv_subscribe()
        conn.send_raw(wsx.encode_frame(wsx.OP_PING, b"srv", mask=False))
        deadline = time.monotonic() + 8
        while time.monotonic() < deadline and not all(got.values()):
            fin, opcode, payload = conn.recv_frame()
            if opcode == wsx.OP_PONG and payload == b"srv":
                got["pong"] = True
            if opcode == wsx.OP_PING:
                got["ping"] = True
                conn.send_raw(wsx.encode_frame(wsx.OP_PONG, payload,
                                               mask=False))

    server = WsTestServer(handler)
    etl = wsx.LiveWsETL(server.url, ["X"], heartbeat_interval=0.3,
                        max_reconnects=0)
    try:
        etl.start()
        deadline = time.monotonic() + 8
        while time.monotonic() < deadline and not all(got.values()):
            time.sleep(0.05)
        assert got["pong"], "client never answered the server ping"
        assert got["ping"], "client heartbeat ping never arrived"
        assert etl.stats["pings_sent"] >= 1
    finally:
        etl.stop()
        server.close()


def test_fragmented_message_reassembly():
    def handler(conn: _WsConn, n: int):
        conn.recv_subscribe()
        msg = json.dumps({"symbol": "FRAG", "price": 1.25}).encode()
        a, b, c = msg[:5], msg[5:11], msg[11:]
        conn.send_raw(wsx.encode_frame(wsx.OP_TEXT, a, mask=False,
                                       fin=False))
        conn.send_raw(wsx.encode_frame(wsx.OP_CONT, b, mask=False,
                                       fin=False))
        conn.send_raw(wsx.encode_frame(wsx.OP_CONT, c, mask=False))
        time.sleep(0.8)

    server = WsTestServer(handler)
    etl = wsx.LiveWsETL(server.url, ["FRAG"], max_reconnects=0)
    try:
        etl.start()
        deadline = time.monotonic() + 8
        while time.monotonic() < deadline and \
                etl.stats["messages_processed"] < 1:
            time.sleep(0.05)
        recs = etl.drain()
        assert recs == [{"symbol": "FRAG", "price": 1.25}]
    finally:
        etl.stop()
        server.close()


# --------------------------------------------------------------- reconnect


def test_reconnect_resumes_without_dup_or_loss():
    """Kill the connection mid-stream; the client reconnects with
    ``last_seq`` and the feed resumes — every seq 0..9 delivered exactly
    once, reconnects counter == 1. This is the hardened version of the
    reference's reconnect (websocket_client.py:83-90, which loses the
    gap)."""
    resume_seqs = []

    def handler(conn: _WsConn, n: int):
        sub = conn.recv_subscribe()
        start = sub.get("last_seq", -1) + 1
        resume_seqs.append(start)
        if n == 0:
            assert "last_seq" not in sub  # first connect: no resume
            for i in range(0, 5):
                conn.send_text(json.dumps(
                    {"seq": i, "symbol": "A", "price": 100.0 + i}))
            time.sleep(0.6)   # make sure the client consumed them
            conn.kill()       # hard drop, no close frame
        else:
            # resume-capable feed: replay one already-seen frame (client
            # must drop it) then the rest
            for i in range(max(0, start - 1), 10):
                conn.send_text(json.dumps(
                    {"seq": i, "symbol": "A", "price": 100.0 + i}))
            time.sleep(1.0)

    server = WsTestServer(handler)
    etl = wsx.LiveWsETL(server.url, ["A"], reconnect_delay=0.2,
                        max_reconnects=3)
    try:
        etl.start()
        deadline = time.monotonic() + 15
        while time.monotonic() < deadline and \
                etl.stats["messages_processed"] < 10:
            time.sleep(0.05)
        recs = etl.drain()
        assert [r["seq"] for r in recs] == list(range(10)), \
            "duplicate or lost rows across the reconnect"
        assert etl.stats["reconnects"] == 1
        assert resume_seqs == [0, 5]  # second subscribe carried last_seq=4
    finally:
        etl.stop()
        server.close()


# --------------------------------------------------------------- Spark bridge


def test_ws_tick_source_feeds_spark_normalizer(spark, tmp_path):
    """Full path: ws:// feed -> LiveWsETL -> bridge TCP -> Spark socket
    source -> normalizer-flagged rows in a memory sink, with the
    StatsListener observing input rows."""
    from pyspark.sql import functions as F

    from build_a_market_data_etl_strategy_backtesting_engine_spark.sources.normalizer import (
        RAW_SCHEMA,
        _alias,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming.ingest import (
        StatsListener,
    )

    def handler(conn: _WsConn, n: int):
        conn.recv_subscribe()
        for i in range(30):
            conn.send_text(json.dumps(
                {"t": 1700000000000 + i, "s": "AAPL",
                 "p": 100.0 + i, "v": float(i % 9 + 1)}))
            time.sleep(0.02)
        time.sleep(20)  # hold open while Spark drains the bridge

    server = WsTestServer(handler)
    holder = StatsListener()
    listener = holder.attach(spark)
    query, bridge = None, None
    try:
        raw, bridge = wsx.ws_tick_source(spark, server.url, ["AAPL"])
        j = F.from_json("value", RAW_SCHEMA)
        flagged = raw.select(
            _alias(j, ["symbol", "s", "ticker"]).alias("symbol"),
            _alias(j, ["price", "p", "last"]).cast("double").alias("price"),
        )
        query = (
            flagged.writeStream.format("memory").queryName("ws_smoke")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("select count(*) c from ws_smoke").first().c >= 10:
                break
            time.sleep(1)
        rows = spark.sql("select * from ws_smoke").collect()
        assert len(rows) >= 10
        assert all(r.symbol == "AAPL" for r in rows)
        prices = sorted(r.price for r in rows)
        assert prices == sorted(set(prices)), "bridge duplicated rows"
        query.processAllAvailable()
        time.sleep(1)
        assert sum(p["numInputRows"] for p in holder.progress) >= 10
    finally:
        if query is not None:
            query.stop()
        spark.streams.removeListener(listener)
        if bridge is not None:
            bridge.close()
        server.close()


def test_bridge_requeues_when_consumer_dies():
    """The held-not-lost claim must survive a dead consumer socket
    (r4 review fix): records drained while no live consumer can take
    them go BACK to the queue head, and a reconnecting consumer reads
    the full uninterrupted sequence."""
    import socket as socklib

    def handler(conn: _WsConn, n: int):
        conn.recv_subscribe()
        for i in range(60):
            conn.send_text(json.dumps({"seq": i, "symbol": "A",
                                       "price": float(i)}))
            time.sleep(0.01)
        time.sleep(30)  # hold the feed open while consumers churn

    server = WsTestServer(handler)
    bridge = wsx.WsFeedBridge(server.url, ["A"]).start()
    received = []
    try:
        def read_some(sock, min_lines, deadline_s=10):
            buf = b""
            deadline = time.monotonic() + deadline_s
            while buf.count(b"\n") < min_lines and \
                    time.monotonic() < deadline:
                sock.settimeout(0.5)
                try:
                    chunk = sock.recv(65536)
                except socklib.timeout:
                    continue
                if not chunk:
                    break
                buf += chunk
            return [json.loads(x) for x in buf.split(b"\n") if x]

        c1 = socklib.create_connection(("127.0.0.1", bridge.port))
        received += read_some(c1, 10)
        assert len(received) >= 10
        # hard-kill the first consumer (RST) and give the bridge time to
        # discover the death on its next send
        c1.setsockopt(socklib.SOL_SOCKET, socklib.SO_LINGER,
                      struct.pack("ii", 1, 0))
        c1.close()
        time.sleep(1.0)
        c2 = socklib.create_connection(("127.0.0.1", bridge.port))
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            received += read_some(c2, 1, deadline_s=1)
            seqs = sorted(r["seq"] for r in received)
            if len(set(seqs)) >= 60:
                break
        c2.close()
        uniq = sorted({r["seq"] for r in received})
        assert uniq == list(range(60)), \
            f"records lost across consumer death: have {len(uniq)}/60"
    finally:
        bridge.close()
        server.close()


# --------------------------------------------------------------- wss:// TLS


@pytest.fixture(scope="module")
def tls_pair(tmp_path_factory):
    """Self-signed cert for 127.0.0.1 (IP SAN) + the two SSLContexts:
    a server context serving it and a client context trusting ONLY it
    (hostname + certificate verification stay ON — the production code
    path, just with a private CA)."""
    import ssl
    import subprocess

    d = tmp_path_factory.mktemp("tls")
    crt, key = str(d / "ws.crt"), str(d / "ws.key")
    try:
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
             "-keyout", key, "-out", crt, "-days", "2",
             "-subj", "/CN=127.0.0.1",
             "-addext", "subjectAltName=IP:127.0.0.1"],
            check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"openssl unavailable: {e}")
    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(crt, key)
    cli_ctx = ssl.create_default_context(cafile=crt)
    return srv_ctx, cli_ctx


def test_wss_handshake_and_echo(tls_pair):
    srv_ctx, cli_ctx = tls_pair

    def handler(conn, n):
        sub = conn.recv_subscribe()
        assert sub["type"] == "subscribe"
        conn.send_text(json.dumps({"symbol": "TLS", "price": 1.5,
                                   "volume": 2.0, "timestamp": 1000}))

    srv = WsTestServer(handler, ssl_context=srv_ctx)
    try:
        assert srv.url.startswith("wss://")
        ws = wsx.WebSocketClient(srv.url, ssl_context=cli_ctx)
        ws.connect()
        ws.send_text(json.dumps({"type": "subscribe", "symbols": ["TLS"]}))
        msg = json.loads(ws.recv_text(timeout=5.0))
        assert msg["symbol"] == "TLS"
        ws.close()
    finally:
        srv.close()


def test_wss_default_context_rejects_self_signed(tls_pair):
    """Without the private CA, the default (system trust store) context
    must REFUSE the connection — certificate verification is on by
    default, not opt-in."""
    import ssl

    srv_ctx, _ = tls_pair
    srv = WsTestServer(lambda conn, n: None, ssl_context=srv_ctx)
    try:
        ws = wsx.WebSocketClient(srv.url)  # default ssl context
        with pytest.raises((ssl.SSLError, ConnectionError, OSError)):
            ws.connect()
    finally:
        srv._stop.set()
        srv.srv.close()
        srv._t.join(timeout=2)  # skip the error assert: handshake fails


def test_wss_live_etl_reconnect_resume(tls_pair):
    """The r4 kill->resume exactly-once scenario, over TLS: connection 0
    serves seqs 0..2 then dies mid-stream; connection 1 must receive
    last_seq=2 in the resubscribe and replay from 3. No dup, no loss."""
    srv_ctx, cli_ctx = tls_pair

    def tick(seq):
        return json.dumps({"symbol": "TLS", "price": 100.0 + seq,
                           "volume": 1.0, "timestamp": 1000 + seq,
                           "seq": seq})

    def handler(conn, n):
        sub = conn.recv_subscribe()
        if n == 0:
            assert "last_seq" not in sub
            for seq in range(3):
                conn.send_text(tick(seq))
            time.sleep(0.2)
            conn.kill()
        else:
            assert sub.get("last_seq") == 2
            for seq in range(3, 6):
                conn.send_text(tick(seq))

    srv = WsTestServer(handler, ssl_context=srv_ctx)
    etl = wsx.LiveWsETL(srv.url, ["TLS"], reconnect_delay=0.1,
                        max_reconnects=3, ssl_context=cli_ctx)
    try:
        etl.start()
        deadline = time.monotonic() + 10
        seen = []
        while time.monotonic() < deadline and len(seen) < 6:
            seen += [d["seq"] for d in etl.drain()]
            time.sleep(0.05)
        assert seen == list(range(6))
        assert etl.stats["reconnects"] >= 1
    finally:
        etl.stop()
        srv.close()
