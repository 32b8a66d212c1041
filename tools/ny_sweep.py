"""Hostile-timezone oracle sweep: the full differential harness through a
VANILLA SparkSession pinned to America/New_York.

The driver imports __spark_entry__ with its OWN session — any engine conf
get_spark() sets (including the UTC session timezone) is absent there. This
sweep proves every oracle pair is timezone-proof: `date_trunc('day')`,
`hour()`/`minute()`, NTZ->LTZ casts and naive-datetime interpretation all
truncate in the SESSION zone, so bugs of that class pass the UTC sweep and
only surface here (round 4 found six real ones this way).

Usage:
    python3 tools/ny_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import build_a_market_data_etl_strategy_backtesting_engine_spark as pkg
from build_a_market_data_etl_strategy_backtesting_engine_spark import session as sess_mod


def _vanilla_ny_spark(app="ny-sweep", **kwargs):
    """A session the way the driver would build one: no engine runtime
    confs, non-UTC timezone. Static confs that gate LOADING the data
    (parquet nanos vintage, recursion for the CTE operators) must stay —
    they are set by the driver's own entry path too (session._BASE_CONF
    documents which confs are load-bearing vs hardening)."""
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[16]")
        .appName(app)
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", os.environ.get("NY_SWEEP_MEM", "8g"))
    )
    spark = b.getOrCreate()
    return spark


def main():
    # Monkeypatch BEFORE the harness builds its session.
    sess_mod.get_spark = _vanilla_ny_spark
    pkg.get_spark = _vanilla_ny_spark

    import oracle_harness as oh

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = set(sys.argv[2:]) or None
    results = oh.run_all(sf, names)
    n_pass = sum(1 for r in results if r["ok"] is True)
    n_fail = sum(1 for r in results if r["ok"] is False)
    n_skip = sum(1 for r in results if r["ok"] is None)
    print(f"\n[NY] {n_pass} pass, {n_fail} fail, {n_skip} skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
