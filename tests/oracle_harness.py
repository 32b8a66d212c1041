"""Driver-mimicking oracle harness: run each Spark query and its DuckDB twin
at a given scale factor and compare row-count, schema shape, and
order-insensitive values exactly.

Used by tests/test_oracle.py and runnable standalone:
    python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v):
    """Canonicalize a cell for comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(repr(_canon(r[i])) for i in idx) for r in rows
    )


def compare_query(spark, con, fn, sql, name="", sf_dir=None):
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    report = {"name": name, "ok": True, "errors": []}
    if sorted(spark_cols) != sorted(duck_cols):
        report["ok"] = False
        report["errors"].append(
            f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
        return report
    if len(spark_rows) != len(duck_rows):
        report["ok"] = False
        report["errors"].append(
            f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
        )
    a = _rows_to_set(spark_cols, spark_rows)
    b = _rows_to_set(duck_cols, duck_rows)
    if a != b:
        report["ok"] = False
        only_a = [r for r in a if r not in set(b)][:5]
        only_b = [r for r in b if r not in set(a)][:5]
        report["errors"].append(
            f"values differ ({len([r for r in a if r not in set(b)])} spark-only"
            f" rows). spark-only sample: {only_a}; duck-only sample: {only_b};"
            f" cols(sorted)={sorted(spark_cols)}"
        )
    return report


def run_all(sf_dir: str, names=None):
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        get_spark,
        queries,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark import queries as q

    spark = get_spark("oracle-harness", shuffle_partitions=16)
    con = duck_connection(sf_dir)
    sparkq = q.spark_queries()
    oracleq = q.oracle_queries()
    results = []
    for name, fn in sorted(sparkq.items()):
        if names and name not in names:
            continue
        if name not in oracleq:
            results.append({"name": name, "ok": None,
                            "errors": ["no oracle (rows-only)"]})
            continue
        try:
            rep = compare_query(spark, con, fn, oracleq[name], name, sf_dir)
        except Exception as exc:  # surface, keep going
            rep = {"name": name, "ok": False,
                   "errors": [f"EXCEPTION: {type(exc).__name__}: {exc}"]}
        results.append(rep)
        status = {True: "PASS", False: "FAIL", None: "SKIP"}[rep["ok"]]
        print(f"[{status}] {rep['name']}")
        for e in rep["errors"]:
            print(f"        {e[:500]}")
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = set(sys.argv[2:]) or None
    res = run_all(sf, names)
    n_fail = sum(1 for r in res if r["ok"] is False)
    print(f"\n{sum(1 for r in res if r['ok'])} pass, {n_fail} fail, "
          f"{sum(1 for r in res if r['ok'] is None)} skip")
    sys.exit(1 if n_fail else 0)
