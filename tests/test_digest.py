"""Digest-mode differential compare (tests/oracle_harness.py): the
order-free (count, hashsum1, hashsum2) reduction that lets fact-scale
outputs verify without a driver collect.

The hard part is the canonical per-cell string being BIT-EXACT across
engines — especially doubles, where Spark's format_string('%.17e')
zero-pads Java's shortest repr and silently diverges from C printf.
These tests pin the '%a' hex-float canon (plus the p+/'.0' cosmetic
normalization) on adversarial values, the full type matrix, NULL and
-0.0 handling, and that a one-ulp mutation flips the digest.
"""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_harness import (  # noqa: E402
    compare_query_digest,
    duck_connection,
    duck_digest,
    spark_digest,
)

SF_DIR = "/root/testdata/sf0.001"

# Adversarial doubles: denormal min, double max, classic shortest-repr
# values, exact powers of two (C trims to '0x1p+1'), negative zero, a
# 17-sig-digit value, and values on both sides of Java's scientific
# formatting cutoffs.
TRICKY = [
    0.1, 12345.678, 1e-300, 2.0, 3.0, 0.30000000000000004,
    5e-324, 1.7976931348623157e308, -0.0, 0.0, -123.456,
    1.0000000000000002, 6.02214076e23, -7.5e-12, 1e7, 9999999.0,
    0.001, 0.0001, float("nan"), float("inf"), float("-inf"), None,
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    return duckdb.connect()


def test_double_canon_bit_exact_across_engines(spark, duck):
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(TRICKY)], "id long, x double"
    )
    duck.execute("CREATE OR REPLACE TABLE tricky (id BIGINT, x DOUBLE)")
    duck.executemany(
        "INSERT INTO tricky VALUES (?, ?)",
        [(i, v) for i, v in enumerate(TRICKY)],
    )
    assert spark_digest(sdf) == duck_digest(duck, "SELECT * FROM tricky")


def test_type_matrix_canon(spark, duck):
    import datetime

    rows = [
        (1, "a\x1fb", True, 3.5, datetime.datetime(2024, 3, 1, 12, 30, 45,
                                                   123456),
         datetime.date(1969, 12, 31), [1.5, None, -0.0]),
        (2, None, False, None, None, None, None),
        (-3, "", None, float("nan"), datetime.datetime(1970, 1, 1),
         datetime.date(2024, 2, 29), []),
    ]
    sdf = spark.createDataFrame(
        rows,
        "i long, s string, b boolean, d double, ts timestamp, "
        "dt date, arr array<double>",
    )
    duck.execute(
        "CREATE OR REPLACE TABLE tm (i BIGINT, s VARCHAR, b BOOLEAN, "
        "d DOUBLE, ts TIMESTAMP, dt DATE, arr DOUBLE[])"
    )
    duck.executemany(
        "INSERT INTO tm VALUES (?, ?, ?, ?, ?, ?, ?)", rows
    )
    assert spark_digest(sdf) == duck_digest(duck, "SELECT * FROM tm")


def test_one_ulp_mutation_flips_digest(spark, duck):
    base = 12345.678
    up = math.nextafter(base, math.inf)
    sdf = spark.createDataFrame([(base,)], "x double")
    duck.execute("CREATE OR REPLACE TABLE ulp (x DOUBLE)")
    duck.execute("INSERT INTO ulp VALUES (?)", [up])
    sd, dd = spark_digest(sdf), duck_digest(duck, "SELECT * FROM ulp")
    assert sd[0] == dd[0] and sd[1:] != dd[1:]


def test_row_swap_across_columns_flips_digest(spark, duck):
    """(a=1,b=2),(a=2,b=1) vs (a=1,b=1),(a=2,b=2): per-column multisets
    identical — only a row-coupled digest separates them."""
    sdf = spark.createDataFrame([(1, 2), (2, 1)], "a long, b long")
    duck.execute("CREATE OR REPLACE TABLE rs (a BIGINT, b BIGINT)")
    duck.executemany("INSERT INTO rs VALUES (?, ?)", [(1, 1), (2, 2)])
    sd, dd = spark_digest(sdf), duck_digest(duck, "SELECT * FROM rs")
    assert sd[0] == dd[0] and sd[1:] != dd[1:]


def test_digest_sum_exact_past_long_wrap(spark, duck):
    """100k rows of ~2^47 hash values: a bare BIGINT sum of the 48-bit
    row hashes wraps past just 2^15 rows (found live on q101 under ANSI
    mode) — the decimal(38,0)/HUGEINT accumulators must agree exactly."""
    sdf = spark.range(100_000)
    dd = duck_digest(duck, "SELECT range AS id FROM range(100000)")
    sd = spark_digest(sdf)
    assert sd == dd
    assert sd[1] > (1 << 63)  # the sum genuinely exceeds int64


def test_digest_agrees_with_collect_compare_on_real_pairs(spark):
    """Digest PASS must track collect-compare PASS on live pairs (a
    representative slice: exact-int emission, float metrics, string
    keys, timestamps)."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )

    con = duck_connection(SF_DIR)
    sq, oq = q.spark_queries(), q.oracle_queries()
    for name in ["q01_pricing_summary", "q16_backtest_meanrev",
                 "q41_asof_join", "q31_language_id"]:
        rep = compare_query_digest(spark, con, sq[name], oq[name],
                                   name, SF_DIR)
        assert rep["ok"], (name, rep["errors"])


def test_shadow_chunked_digest_equals_monolithic():
    """View-shadow chunking (r11): q135's oracle partitions by source
    (same-source edge filter), so running the UNMODIFIED SQL k times
    with `documents` shadowed by hash(source)%k temp views must sum to
    the monolithic digest — and the shadow must restore cleanly."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )
    from oracle_harness import duck_digest_shadow_chunked

    con = duck_connection(SF_DIR)
    sql = q.oracle_queries()["q135_dedup_resolution"]
    mono = duck_digest(con, sql)
    assert mono[0] > 0
    for k in (2, 8):
        assert duck_digest_shadow_chunked(
            con, sql, "documents", "hash(source)", k) == mono
    # the shadow restored the original view: monolithic still matches
    assert duck_digest(con, sql) == mono


def test_shadow_chunk_registration_is_wired():
    from oracle_harness import DUCK_DIGEST_SHADOW_CHUNKS

    table, expr, k = DUCK_DIGEST_SHADOW_CHUNKS["q135_dedup_resolution"]
    assert table == "documents" and "source" in expr and k >= 2
