"""SQL surface tests: registered SQL functions must equal the Column
builders bit-for-bit, and the pipeline must be runnable as pure SQL."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark import sqlapi
from build_a_market_data_etl_strategy_backtesting_engine_spark.functions import (
    derivatives as deriv,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    sqlapi.register_functions(spark)
    sqlapi.register_views(spark, SF)


def test_sql_function_equals_column_builder(spark):
    df = spark.createDataFrame(
        [(100.0, 105.0, 0.5, 0.3, 0.02), (80.0, 100.0, 1.0, 0.2, 0.05)],
        "s double, k double, t double, sigma double, r double")
    df.createOrReplaceTempView("bs_in")
    via_sql = spark.sql(
        "SELECT bs_call(s, k, t, sigma, r) AS c, bs_put(s, k, t, sigma, r)"
        " AS p FROM bs_in").collect()
    via_col = df.select(
        deriv.bs_call(F.col("s"), F.col("k"), F.col("t"), F.col("sigma"),
                      F.col("r")).alias("c"),
        deriv.bs_put(F.col("s"), F.col("k"), F.col("t"), F.col("sigma"),
                     F.col("r")).alias("p"),
    ).collect()
    for a, b in zip(via_sql, via_col):
        assert a.c == b.c and a.p == b.p  # identical expressions, bit-equal


def test_sql_erf_accuracy(spark):
    rows = spark.sql(
        "SELECT erf(x) AS e, x FROM (SELECT i / 10.0 AS x FROM "
        "(SELECT explode(sequence(-30, 30)) AS i))").collect()
    for r in rows:
        assert abs(r.e - math.erf(r.x)) < 1.5e-7


def test_full_pipeline_as_pure_sql(spark):
    """A backtest-style query written only in SQL against registered views
    and functions."""
    out = spark.sql("""
        WITH r AS (
          SELECT symbol, ts,
                 simple_return(close,
                   lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS ret
          FROM bars_1h)
        SELECT symbol, count(*) AS n, avg(ret) AS mean_ret,
               stddev_samp(ret) AS sd
        FROM r GROUP BY symbol
    """).collect()
    assert len(out) == 5
    assert all(r.n > 0 and r.sd is not None for r in out)


def test_kelly_sql(spark):
    r = spark.sql("SELECT kelly_quarter(0.6, 0.02, -0.01) AS k").first()
    assert 0.0 <= r.k <= 0.25


def test_sample_bucket_sql_matches_operator(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark import sqlapi
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
        sampling,
    )

    sqlapi.register_functions(spark)
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    df.createOrReplaceTempView("sb_in")
    via_sql = {r.doc_id: r.b for r in spark.sql(
        "SELECT doc_id, sample_bucket(CAST(doc_id AS STRING)) AS b"
        " FROM sb_in").collect()}
    via_col = {r.doc_id: float(r.b) for r in df.select(
        "doc_id", sampling.hash_bucket(F.col("doc_id")).alias("b")
    ).collect()}
    assert via_sql == via_col
    # a SQL-first sampling filter keeps the same rows as the operator
    kept_sql = {r.doc_id for r in spark.sql(
        "SELECT doc_id FROM sb_in"
        " WHERE sample_bucket(CAST(doc_id AS STRING)) < 3000").collect()}
    kept_op = {r.doc_id for r in
               sampling.deterministic_sample(df, "doc_id", 0.3).collect()}
    assert kept_sql == kept_op


def test_tz_proof_session_keys(spark):
    """epoch_day_us / minute_of_day must not move with the session tz
    (the SQL twins of the r4 microstructure fix)."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.sqlapi import (
        register_functions,
    )

    register_functions(spark)
    tz0 = spark.conf.get("spark.sql.session.timeZone")

    def vals():
        return spark.sql(
            "SELECT epoch_day_us(timestamp_micros(93784000000)) AS d, "
            "minute_of_day(timestamp_micros(93784000000)) AS m"
        ).first()

    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        a = vals()
        spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
        b = vals()
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    # 93784 s = 1d 2h 3m 4s -> day 86400e6 us, minute 123
    assert (a["d"], a["m"]) == (86400000000.0, 123.0)
    assert (b["d"], b["m"]) == (a["d"], a["m"])
