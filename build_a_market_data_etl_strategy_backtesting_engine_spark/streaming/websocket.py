"""Minimal RFC 6455 WebSocket client (stdlib-only) + live ETL loop.

Spark twin of the reference's flagship ETL entry point
(``etl/websocket_client.py:14-204``): connect to a ``ws://`` endpoint,
send a JSON subscribe message, consume text frames, hand each frame to
the normalizer path, with automatic reconnect, heartbeat pings, and the
same stats counters (``messages_received / messages_processed / errors /
reconnects`` — ``websocket_client.py:47-52,185-204``).

What is deliberately different, and why:

- **Transport is stdlib** (``socket`` + ``ssl`` + ``hashlib`` +
  ``base64`` + ``os.urandom``): no aiohttp in the runtime image, and the
  subset of RFC 6455 a market-data consumer needs is small — opening
  handshake, masked client frames, text/ping/pong/close opcodes,
  7/16/64-bit lengths, continuation-frame reassembly. ``wss://`` wraps
  the same socket in ``ssl.SSLContext`` (certificate + hostname
  verification on by default; pass ``ssl_context`` for a private CA).
  No extensions, no server role beyond what the tests need.
- **Delivery across reconnects is stronger than the reference.** The
  reference reconnect (``websocket_client.py:83-90``) just resubscribes,
  losing whatever the feed sent while down. Here the client tracks the
  last seen ``seq`` field (when frames carry one) and re-subscribes with
  ``last_seq``, so a resume-capable feed replays the gap and the client
  drops anything it already processed — no duplicate and no lost rows
  across a reconnect (pinned by tests/test_websocket.py).
- **Spark side is unchanged**: frames re-emit as newline-delimited JSON
  through :func:`ws_tick_source` into the engine's existing socket
  source + normalizer + sink path, so the streaming plan (and its
  batch==stream equivalence tests) is identical to every other feed.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import ssl
import struct
import threading
import time
from collections import deque
from typing import Callable, Iterator

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

# opcodes (RFC 6455 §5.2)
OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = (
    0x0, 0x1, 0x2, 0x8, 0x9, 0xA,
)


# ------------------------------------------------------------ frame codec


def encode_frame(opcode: int, payload: bytes, mask: bool, fin: bool = True
                 ) -> bytes:
    """Serialize one WebSocket frame (client frames MUST mask, §5.3)."""
    head = bytearray()
    head.append((0x80 if fin else 0x00) | (opcode & 0x0F))
    n = len(payload)
    mask_bit = 0x80 if mask else 0x00
    if n < 126:
        head.append(mask_bit | n)
    elif n < (1 << 16):
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        head += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


def decode_frame(buf: bytes | bytearray):
    """Parse ONE frame from the head of ``buf``.

    Returns ``(fin, opcode, payload, consumed)`` or ``None`` if the
    buffer does not yet hold a complete frame."""
    if len(buf) < 2:
        return None
    b0, b1 = buf[0], buf[1]
    fin = bool(b0 & 0x80)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    pos = 2
    if n == 126:
        if len(buf) < pos + 2:
            return None
        n = struct.unpack(">H", bytes(buf[pos:pos + 2]))[0]
        pos += 2
    elif n == 127:
        if len(buf) < pos + 8:
            return None
        n = struct.unpack(">Q", bytes(buf[pos:pos + 8]))[0]
        pos += 8
    key = b""
    if masked:
        if len(buf) < pos + 4:
            return None
        key = bytes(buf[pos:pos + 4])
        pos += 4
    if len(buf) < pos + n:
        return None
    payload = bytes(buf[pos:pos + n])
    if masked:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return fin, opcode, payload, pos + n


def handshake_accept_key(client_key: str) -> str:
    """``Sec-WebSocket-Accept`` for a given ``Sec-WebSocket-Key`` (§4.2.2)
    — used by both the client (to verify) and test servers (to answer)."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def parse_ws_url(url: str) -> tuple[str, int, str, bool]:
    """``ws[s]://host[:port][/path]`` -> (host, port, resource, tls).
    Default port 80 for ``ws://``, 443 for ``wss://``."""
    if url.startswith("wss://"):
        rest, tls, default_port = url[len("wss://"):], True, 443
    elif url.startswith("ws://"):
        rest, tls, default_port = url[len("ws://"):], False, 80
    else:
        raise ValueError(f"not a ws:// or wss:// url: {url}")
    hostport, slash, path = rest.partition("/")
    host, colon, port = hostport.partition(":")
    return (host, int(port) if colon else default_port,
            "/" + path if slash else "/", tls)


# ------------------------------------------------------------ client


def declared_frame_len(buf: bytes | bytearray) -> int | None:
    """Total byte length the frame at the head of ``buf`` declares, or
    None if even the header is incomplete. Lets a reader reject an
    oversized declaration BEFORE buffering the whole payload."""
    if len(buf) < 2:
        return None
    n = buf[1] & 0x7F
    masked = bool(buf[1] & 0x80)
    pos = 2
    if n == 126:
        if len(buf) < 4:
            return None
        n = struct.unpack(">H", bytes(buf[2:4]))[0]
        pos = 4
    elif n == 127:
        if len(buf) < 10:
            return None
        n = struct.unpack(">Q", bytes(buf[2:10]))[0]
        pos = 10
    return pos + (4 if masked else 0) + n


class WebSocketClient:
    """Blocking RFC 6455 client over one TCP socket.

    Does the opening handshake on :meth:`connect` (verifying the accept
    key), answers pings with pongs transparently, reassembles
    continuation frames, and exposes :meth:`recv_text` /
    :meth:`send_text` / :meth:`ping` / :meth:`close`.

    ``max_frame_bytes`` bounds the receive buffer: a corrupt or hostile
    header declaring a multi-GB payload raises ``ConnectionError``
    instead of buffering toward OOM (a desynced stream looks exactly
    like this).

    ``wss://`` urls TLS-wrap the socket before the handshake. The
    default context verifies the peer certificate AND hostname against
    the system trust store (the safe default for real feeds); tests and
    private-CA deployments pass their own ``ssl_context``."""

    def __init__(self, url: str, connect_timeout: float = 5.0,
                 poll_timeout: float = 0.5,
                 max_frame_bytes: int = 16 * 1024 * 1024,
                 ssl_context: "ssl.SSLContext | None" = None):
        self.url = url
        self.host, self.port, self.resource, self.tls = parse_ws_url(url)
        self.ssl_context = ssl_context
        self.connect_timeout = connect_timeout
        self.poll_timeout = poll_timeout
        self.max_frame_bytes = int(max_frame_bytes)
        self.sock: socket.socket | None = None
        self._buf = bytearray()
        self._fragments: list[bytes] = []
        self._frag_opcode: int | None = None
        self.closed_by_peer = False

    # -- lifecycle

    def connect(self) -> None:
        self.sock = socket.create_connection(
            (self.host, self.port), timeout=self.connect_timeout)
        if self.tls:
            ctx = self.ssl_context or ssl.create_default_context()
            self.sock = ctx.wrap_socket(
                self.sock, server_hostname=self.host)
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {self.resource} HTTP/1.1\r\n"
            f"Host: {self.host}:{self.port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n"
            "\r\n"
        )
        self.sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("server closed during handshake")
            resp += chunk
        head, _, leftover = resp.partition(b"\r\n\r\n")
        lines = head.decode("latin-1").split("\r\n")
        status = lines[0].split(" ", 2)
        if len(status) < 2 or status[1] != "101":
            raise ConnectionError(f"handshake rejected: {lines[0]}")
        headers = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        if headers.get("sec-websocket-accept") != handshake_accept_key(key):
            raise ConnectionError("bad Sec-WebSocket-Accept")
        self._buf = bytearray(leftover)
        self.sock.settimeout(self.poll_timeout)
        self.closed_by_peer = False

    def close(self, code: int = 1000) -> None:
        if self.sock is None:
            return
        try:
            self.sock.sendall(encode_frame(
                OP_CLOSE, struct.pack(">H", code), mask=True))
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass
        self.sock = None

    # -- I/O

    def send_text(self, text: str) -> None:
        assert self.sock is not None, "not connected"
        self.sock.sendall(encode_frame(OP_TEXT, text.encode(), mask=True))

    def ping(self, payload: bytes = b"hb") -> None:
        assert self.sock is not None, "not connected"
        self.sock.sendall(encode_frame(OP_PING, payload, mask=True))

    def recv_text(self, timeout: float | None = None) -> str | None:
        """Next complete text message, or ``None`` on poll timeout.

        Raises ``ConnectionError`` when the peer closes (close frame or
        dead socket) — the caller's reconnect loop takes over."""
        assert self.sock is not None, "not connected"
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            declared = declared_frame_len(self._buf)
            if declared is not None and declared > self.max_frame_bytes:
                raise ConnectionError(
                    f"frame declares {declared} bytes "
                    f"(> max_frame_bytes={self.max_frame_bytes}); "
                    "corrupt or hostile stream")
            frame = decode_frame(self._buf)
            if frame is not None:
                fin, opcode, payload, used = frame
                del self._buf[:used]
                msg = self._handle_frame(fin, opcode, payload)
                if msg is not None:
                    return msg
                continue
            if deadline is not None and time.monotonic() >= deadline:
                return None
            try:
                chunk = self.sock.recv(65536)
            except socket.timeout:
                if timeout is None:
                    return None
                continue
            except OSError as e:
                raise ConnectionError(f"socket error: {e}") from e
            if not chunk:
                self.closed_by_peer = True
                raise ConnectionError("connection closed by peer")
            self._buf += chunk

    def _handle_frame(self, fin: bool, opcode: int, payload: bytes
                      ) -> str | None:
        if opcode == OP_PING:
            try:
                self.sock.sendall(encode_frame(OP_PONG, payload, mask=True))
            except OSError:
                pass
            return None
        if opcode == OP_PONG:
            return None
        if opcode == OP_CLOSE:
            self.closed_by_peer = True
            raise ConnectionError("close frame from peer")
        if opcode in (OP_TEXT, OP_BINARY):
            if fin:
                return payload.decode("utf-8")
            self._fragments = [payload]
            self._frag_opcode = opcode
            return None
        if opcode == OP_CONT:
            self._fragments.append(payload)
            if fin:
                msg = b"".join(self._fragments).decode("utf-8")
                self._fragments = []
                self._frag_opcode = None
                return msg
            return None
        return None  # unknown opcode: ignore


# ------------------------------------------------------------ live ETL


class LiveWsETL:
    """Reference-parity live loop (``etl/websocket_client.py:54-177``):
    connect -> subscribe -> stream -> handle -> reconnect forever, with
    heartbeat pings and stats counters; messages land in a bounded
    in-process buffer drained by :meth:`drain` (the Spark bridge) or a
    caller-supplied ``on_record``.

    Resume semantics (beyond reference): when frames carry a monotonic
    ``seq``, the subscribe message includes ``last_seq`` after the first
    connect and frames with ``seq <= last_seq`` are dropped — a
    resume-capable feed therefore delivers exactly-once across
    RECONNECTS; a plain feed degrades to the reference's behavior.

    Buffer overflow is a separate, orthogonal loss mode: if the consumer
    drains slower than the feed for ``queue_size`` messages, further
    records are DROPPED and counted in ``stats['dropped']`` — the
    reference's full-queue behavior (websocket_client.py:142-147), made
    visible instead of silent. Size ``queue_size`` to the worst-case
    consumer stall; the resume guarantee does not cover these drops."""

    def __init__(
        self,
        ws_url: str,
        symbols: list[str],
        message_handler: Callable[[dict], dict | None] | None = None,
        queue_size: int = 10000,
        reconnect_delay: float = 0.5,
        heartbeat_interval: float = 30.0,
        max_reconnects: int | None = None,
        ssl_context: "ssl.SSLContext | None" = None,
    ):
        self.ws_url = ws_url
        self.ssl_context = ssl_context
        self.symbols = symbols
        self.message_handler = message_handler or (lambda d: d)
        self.queue: deque = deque()
        self.queue_size = int(queue_size)
        self.reconnect_delay = reconnect_delay
        self.heartbeat_interval = heartbeat_interval
        self.max_reconnects = max_reconnects
        self.running = False
        self.last_seq: int | None = None
        self._stats = {
            "messages_received": 0,
            "messages_processed": 0,
            "errors": 0,
            "dropped": 0,
            "reconnects": 0,
            "pings_sent": 0,
        }
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None

    # -- public surface (parity: start/stop/stats)

    @property
    def stats(self) -> dict:
        with self._lock:
            return {**self._stats, "queue_size": len(self.queue),
                    "running": self.running}

    def start(self) -> "LiveWsETL":
        """Run the loop on a daemon thread (the asyncio.gather twin)."""
        self.running = True
        self._thread = threading.Thread(target=self.run_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.running = False
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def drain(self, max_items: int | None = None) -> list[dict]:
        """Pop up to ``max_items`` processed records (FIFO)."""
        out = []
        while self.queue and (max_items is None or len(out) < max_items):
            out.append(self.queue.popleft())
        return out

    # -- loop

    def run_forever(self) -> None:
        first = True
        while self.running:
            try:
                self._connect_and_stream(resume=not first)
            except (ConnectionError, OSError):
                with self._lock:
                    self._stats["reconnects"] += 1
                    r = self._stats["reconnects"]
                if (self.max_reconnects is not None
                        and r > self.max_reconnects):
                    self.running = False
                    return
                first = False
                time.sleep(self.reconnect_delay)

    def _connect_and_stream(self, resume: bool) -> None:
        ws = WebSocketClient(self.ws_url, ssl_context=self.ssl_context)
        ws.connect()
        try:
            sub = {"type": "subscribe", "symbols": self.symbols}
            if resume and self.last_seq is not None:
                sub["last_seq"] = self.last_seq
            ws.send_text(json.dumps(sub))
            last_ping = time.monotonic()
            while self.running:
                now = time.monotonic()
                if now - last_ping >= self.heartbeat_interval:
                    ws.ping()
                    last_ping = now
                    with self._lock:
                        self._stats["pings_sent"] += 1
                msg = ws.recv_text(timeout=0.25)
                if msg is None:
                    continue
                self._handle_message(msg)
        finally:
            ws.close()

    def _handle_message(self, text: str) -> None:
        with self._lock:
            self._stats["messages_received"] += 1
        try:
            data = json.loads(text)
        except json.JSONDecodeError:
            with self._lock:
                self._stats["errors"] += 1
            return
        if not isinstance(data, dict):
            with self._lock:
                self._stats["errors"] += 1
            return
        seq = data.get("seq")
        if isinstance(seq, int):
            if self.last_seq is not None and seq <= self.last_seq:
                return  # replayed frame we already processed
            self.last_seq = seq
        try:
            record = self.message_handler(data)
        except Exception:
            with self._lock:
                self._stats["errors"] += 1
            return
        if record is None:
            with self._lock:
                self._stats["errors"] += 1
            return
        if len(self.queue) >= self.queue_size:
            # reference parity (websocket_client.py:142-147): full queue
            # drops the NEW message — but counted, never silent
            with self._lock:
                self._stats["dropped"] += 1
            return
        self.queue.append(record)
        with self._lock:
            self._stats["messages_processed"] += 1


# ------------------------------------------------------------ Spark bridge


class WsFeedBridge:
    """Terminate a ws:// feed and re-serve it as newline-delimited JSON on
    a local TCP port for Spark's socket source — the "feed bridge" the
    socket path documented (streaming/ingest.py:61-75), now in-engine.

    One daemon thread runs :class:`LiveWsETL`; another accepts Spark's
    connection(s) and forwards each processed record as one JSON line.
    Rows queued while Spark is between (re)connects are held, not lost
    (bounded by ``queue_size``)."""

    def __init__(self, ws_url: str, symbols: list[str],
                 queue_size: int = 10000, **etl_kwargs):
        self.etl = LiveWsETL(ws_url, symbols, queue_size=queue_size,
                             **etl_kwargs)
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(4)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._t: threading.Thread | None = None

    def start(self) -> "WsFeedBridge":
        self.etl.start()
        self._t = threading.Thread(target=self._serve, daemon=True)
        self._t.start()
        return self

    def _serve(self) -> None:
        self._srv.settimeout(0.1)
        conns: list[socket.socket] = []
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
                conns.append(conn)
            except socket.timeout:
                pass
            except OSError:
                break
            if not conns:
                continue
            batch = self.etl.drain(max_items=20000)
            for i, rec in enumerate(batch):
                line = (json.dumps(rec) + "\n").encode()
                delivered = False
                for c in list(conns):
                    try:
                        c.sendall(line)
                        delivered = True
                    except OSError:
                        conns.remove(c)
                if not delivered:
                    # every connection died mid-batch (e.g. Spark query
                    # restart): put this and the remaining records BACK at
                    # the queue head so the reconnected reader gets them —
                    # 'held, not lost' has to survive a dead socket too
                    self.etl.queue.extendleft(reversed(batch[i:]))
                    break
        for c in conns:
            try:
                c.close()
            except OSError:
                pass

    def close(self) -> None:
        self._stop.set()
        self.etl.stop()
        if self._t is not None:
            self._t.join(timeout=2)
        try:
            self._srv.close()
        except OSError:
            pass


def ws_tick_source(spark, ws_url: str, symbols: list[str],
                   **etl_kwargs):
    """Streaming DataFrame of raw JSON lines from a live ``ws://`` feed.

    Returns ``(df, bridge)``: the caller owns ``bridge.close()``. The
    DataFrame is the same shape as :func:`socket_tick_source` output, so
    it composes with ``normalize_trades`` and every sink unchanged."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.streaming.ingest import (
        socket_tick_source,
    )

    bridge = WsFeedBridge(ws_url, symbols, **etl_kwargs).start()
    df = socket_tick_source(spark, host="127.0.0.1", port=bridge.port)
    return df, bridge


def stream_ws(url: str, max_messages: int | None = None,
              timeout: float | None = None) -> Iterator[str]:
    """Low-level convenience: yield raw text messages from a ws endpoint
    (no subscribe, no reconnect) — handy for probing a feed."""
    ws = WebSocketClient(url)
    ws.connect()
    n = 0
    deadline = None if timeout is None else time.monotonic() + timeout
    try:
        while max_messages is None or n < max_messages:
            left = None if deadline is None else deadline - time.monotonic()
            if left is not None and left <= 0:
                return
            msg = ws.recv_text(timeout=left if left is not None else 1.0)
            if msg is None:
                if timeout is not None:
                    return
                continue
            yield msg
            n += 1
    finally:
        ws.close()
