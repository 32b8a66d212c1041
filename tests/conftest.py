import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def spark():
    from build_a_market_data_etl_strategy_backtesting_engine_spark import get_spark
    from build_a_market_data_etl_strategy_backtesting_engine_spark.compat import (
        close_collect_sockets,
    )

    # pyspark's collect() socket is otherwise closed only at GC, which
    # surfaces as the suite's one PytestUnraisableExceptionWarning
    # (ResourceWarning on an unclosed TCP socket) at an arbitrary later
    # test — traced with tracemalloc to pyspark/util.py
    # _create_local_socket, not to any fixture of ours.
    close_collect_sockets()
    s = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
