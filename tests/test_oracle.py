"""Differential oracle tests: every registered query pair must hash-match
DuckDB at sf0.001 (fast tier; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare_query, duck_connection

from build_a_market_data_etl_strategy_backtesting_engine_spark import queries as q

SF_DIR = "/root/testdata/sf0.001"

_PAIRS = sorted(q.oracle_queries().keys())


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", _PAIRS)
def test_oracle_pair(spark, duck, name):
    rep = compare_query(spark, duck, q.spark_queries()[name],
                        q.oracle_queries()[name], name, SF_DIR)
    assert rep["ok"], rep["errors"]


def test_every_query_has_runnable_spark_side(spark):
    assert len(q.spark_queries()) >= 26
