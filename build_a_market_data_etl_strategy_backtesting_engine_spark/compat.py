"""Opt-in shims for upstream PySpark sharp edges.

Nothing here is imported by the package itself — callers (the test
suite, long-running drivers) opt in explicitly, because monkeypatching
a dependency from library import time would surprise embedders.
"""

from __future__ import annotations

import weakref

_collect_socket_patch_installed = False


def close_collect_sockets() -> None:
    """Make ``DataFrame.collect()``'s result socket close deterministically.

    PySpark's ``pyspark.util._create_local_socket`` (the transfer path
    under every ``collect()`` / ``toLocalIterator()``) returns only the
    buffered ``sockfile`` and drops the raw ``socket.socket`` on the
    floor — the in-tree comment says "The socket will be automatically
    closed when garbage-collected" (pyspark 4.1.2, util.py:711). CPython
    closes it at GC, but emits ``ResourceWarning: unclosed <socket...>``
    while doing so, and until that GC pass the fd stays open — a
    driver that collects in a loop accumulates open fds between
    collections.

    This shim re-points ``_create_local_socket`` at a variant that ties
    the raw socket's lifetime to the sockfile with ``weakref.finalize``:
    the finalizer holds the only strong reference to the socket, so the
    moment the sockfile is released (for ``collect()`` that is refcount
    zero right after ``list(...)`` exhausts the stream — no GC cycle
    needed) the socket is *closed*, not warned about.

    Idempotent; affects only the Python driver side; safe under
    ``toLocalIterator`` too (its ``PyLocalIterable`` keeps the sockfile
    alive for exactly as long as the connection must stay open).
    """
    global _collect_socket_patch_installed
    if _collect_socket_patch_installed:
        return

    import pyspark.util as _pu

    def _create_local_socket_closing(sock_info):
        sockfile, sock = _pu.local_connect_and_auth(
            sock_info[0], sock_info[1])
        # SPARK-18281: materialization time is unpredictable — no timeout
        # (mirrors the upstream function this replaces).
        sock.settimeout(None)
        weakref.finalize(sockfile, sock.close)
        return sockfile

    _pu._create_local_socket = _create_local_socket_closing
    _collect_socket_patch_installed = True
