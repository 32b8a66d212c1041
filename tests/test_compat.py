"""The collect-socket shim (compat.close_collect_sockets).

pyspark 4.1.2's _create_local_socket returns the buffered sockfile and
drops the raw socket ("automatically closed when garbage-collected" —
its words), so every DataFrame.collect() leaves an open fd until a GC
pass, which then emits the ResourceWarning that was the r9 suite's one
PytestUnraisableExceptionWarning. The session fixture installs the
shim; these tests pin that it actually closes the socket eagerly.
"""

import gc
import os
import warnings

import pytest


def _open_fds() -> int:
    return len(os.listdir("/proc/self/fd"))


@pytest.mark.skipif(not os.path.isdir("/proc/self/fd"),
                    reason="needs procfs")
def test_collect_does_not_accumulate_fds(spark):
    # eager close comes from refcount-driven weakref.finalize, so it
    # must hold with the cyclic collector disabled (pre-shim, each
    # collect leaked one fd until gc ran)
    spark.range(100).collect()  # warm the gateway's connection pool
    gc.disable()
    try:
        gc.collect()
        n0 = _open_fds()
        for _ in range(8):
            spark.range(100).collect()
        n1 = _open_fds()
    finally:
        gc.enable()
    # py4j may add one pooled gateway connection; 8 leaked collect
    # sockets would show as +8
    assert n1 <= n0 + 2, f"fds grew {n0} -> {n1} across 8 collects"


def test_collect_emits_no_resource_warning(spark):
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always", ResourceWarning)
        for _ in range(3):
            spark.range(50).collect()
        gc.collect()
    socket_warns = [w for w in rec
                    if issubclass(w.category, ResourceWarning)
                    and "socket" in str(w.message)]
    assert socket_warns == []


def test_shim_is_idempotent(spark):
    import pyspark.util as pu

    from build_a_market_data_etl_strategy_backtesting_engine_spark.compat import (
        close_collect_sockets,
    )

    before = pu._create_local_socket
    close_collect_sockets()  # second call (fixture already installed it)
    assert pu._create_local_socket is before
    assert spark.range(5).count() == 5
