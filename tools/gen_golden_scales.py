"""Generate golden_scales.json — per-scale golden rows for the
scale-gated golden oracle pairs, at rehearsal scales beyond the driver's
three testdata dirs.

The 9 driver-solved / iterative queries (q36/q37/q38/q54/q65/q105/q106/
q119/q129) verify against VALUES-literal goldens gated on the events row
count (queries._golden_sql). A rehearsal dataset (tools/gen_scale10.py)
has a new events count, so without an entry the oracle is EMPTY and the
sweep fails loud. This script runs each query at the rehearsal dir with
the engine session, captures the rows, and writes them keyed by the
events count — regenerate ONLY from a session whose full sweep is green
at the driver scales (same discipline as tests/gen_golden_hashes.py).

Run:  python tools/gen_golden_scales.py [sf_dir=/tmp/sf1]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = (REPO / "build_a_market_data_etl_strategy_backtesting_engine_spark"
       / "golden_scales.json")


def main(sf_dir: str = "/tmp/sf1") -> None:
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )
    from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="gen-golden-scales")
    n_events = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")).count()
    gated = sorted(k for k, v in q._GOLDENS.items()
                   if isinstance(v[1], dict))
    by_num = {name.split("_", 1)[0]: name for name in q.spark_queries()}
    out = json.loads(OUT.read_text()) if OUT.exists() else {}
    for key in gated:
        name = by_num[key]
        cols = q._GOLDENS[key][0]
        df = q.spark_queries()[name](spark, sf_dir).select(*cols)
        rows = [list(r) for r in df.collect()]
        out.setdefault(key, {})[str(n_events)] = rows
        print(f"{key} ({name}): {len(rows)} rows @ events={n_events}")
    OUT.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
