"""Generate tests/golden_hashes.json — frozen result hashes for every
oracle pair outside the driver's audit window (q51+), per scale factor.

Complements the DuckDB sweep: the driver externally audits q01-q50 only,
so the remaining ~106 pairs rely on the builder's own harness. Freezing
their canonical result hashes in-repo (3 SFs each) catches regressions
in seconds (tests/test_golden_r4.py) without spinning DuckDB or the
full sweep, and shrinks the external-signal concentration risk.

Run:  python tests/gen_golden_hashes.py            (sf0.001 + sf0.01)
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.oracle_harness import _rows_to_set  # noqa: E402

GOLDEN_MIN = 51  # everything outside the driver's q01-q50 audit window
OUT = Path(__file__).resolve().parent / "golden_hashes.json"
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]

# Non-vacuousness gate (r5 VERDICT #9): the zero-row rejection below
# cannot catch "non-zero rows, identically-zero measure" — the q156
# mkt_share class, where a wrong literal zeroes a ratio but the group
# keys still emit. For each ratio/share-shaped query, the named measure
# columns must contain at least one non-zero, non-null value at EVERY
# generated SF or generation aborts.
NONZERO_COLS: dict[str, list[str]] = {
    "q101_fingerprint_overlap": ["containment"],
    "q114_lead_lag_corr": ["xcorr"],
    "q116_variance_ratio": ["vr"],
    "q138_lsh_calibration": ["avg_jaccard"],
    "q156_market_share": ["mkt_share"],
    "q66_corpus_curation": ["avg_stop_ratio", "avg_alpha_ratio"],
    "q92_boilerplate_coverage": ["boilerplate_frac"],
    "q94_vocab_coverage": ["cum_share"],
    "q95_source_overlap": ["jaccard"],
    "q96_rolling_beta": ["beta", "r2"],
}


def assert_nonzero_measures(df, name: str) -> None:
    cols = NONZERO_COLS.get(name)
    if not cols:
        return
    from pyspark.sql import functions as F

    agg = df.agg(*[
        F.sum(F.when(F.col(c).isNotNull() & (F.col(c) != 0), 1)
              .otherwise(0)).alias(c)
        for c in cols
    ]).collect()[0]
    dead = [c for c in cols if not (agg[c] or 0)]
    if dead:
        raise AssertionError(
            f"{name}: measure column(s) {dead} are identically "
            f"zero/null — vacuous golden refused (q156 class)")


def result_hash(df) -> tuple[int, str]:
    rows = [tuple(r) for r in df.collect()]
    canon = _rows_to_set(df.columns, rows)
    h = hashlib.sha256()
    h.update(repr(sorted(df.columns)).encode())
    for r in canon:
        h.update(repr(r).encode())
    return len(rows), h.hexdigest()


def golden_names(q) -> list[str]:
    out = []
    for name in sorted(q.spark_queries()):
        try:
            num = int(name.split("_", 1)[0].lstrip("q"))
        except ValueError:
            continue
        if num >= GOLDEN_MIN:
            out.append(name)
    return out


def main() -> None:
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="gen-golden")
    names = golden_names(q)
    data: dict[str, dict[str, dict]] = {}
    for sf_dir in SF_DIRS:
        key = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        for name in names:
            df = q.spark_queries()[name](spark, sf_dir)
            assert_nonzero_measures(df, name)
            n, digest = result_hash(df)
            data.setdefault(name, {})[key] = {"rows": n, "sha256": digest}
            print(f"{key} {name}: {n} rows {digest[:12]}")
    OUT.write_text(json.dumps(data, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT} ({len(names)} queries x {len(SF_DIRS)} SFs)")


if __name__ == "__main__":
    main()
