"""Round-4 regression + new-operator tests.

Covers the r3 ADVICE fixes (resolve_duplicates singleton passthrough,
mmr_select non-bigint ids, lsmc cache release) and the round-4 operators.
"""

from __future__ import annotations

import math

import pytest

from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    dedup,
    similarity,
)


# -------------------------------------------------- ADVICE fix regressions


def test_resolve_duplicates_singletons_survive_missing_clusters(spark):
    """Docs absent from the clusters frame (connected_components with
    nodes=None labels edge endpoints only) must pass through as
    singleton canonical rows, not silently vanish (r3 ADVICE)."""
    docs = spark.createDataFrame(
        [(1, 50), (2, 80), (9, 33)], "doc_id long, n_chars long"
    )
    # doc 9 has no cluster row at all
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster long"
    )
    out = {r["doc_id"]: r for r in
           dedup.resolve_duplicates(docs, clusters).collect()}
    assert set(out) == {1, 2, 9}
    assert out[9]["is_canonical"] == 1
    assert out[9]["n_members"] == 1
    assert out[9]["cluster"] == 9  # own id as singleton label
    assert out[2]["is_canonical"] == 1 and out[2]["n_members"] == 2


def test_mmr_select_string_ids(spark):
    """mmr_select derives the id field type from the input schema —
    string doc ids must work end-to-end (r3 ADVICE: was hardcoded
    'long' and failed at createDataFrame)."""
    rows = [
        ("doc-a", [1.0, 0.0]),
        ("doc-b", [0.9, 0.1]),
        ("doc-c", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = similarity.mmr_select(df, [1.0, 0.0], k=2, lam=0.3, pool=10)
    got = out.orderBy("rank").collect()
    assert [r["vec_id"] for r in got] == ["doc-a", "doc-c"]
    assert dict(out.dtypes)["vec_id"] == "string"


def test_lsmc_releases_path_cache(spark):
    """lsmc_american must not pin its simulated-path cache for the life
    of the session (r3 ADVICE): after the call returns, no new RDD from
    this call remains cached."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.functions import (
        derivatives,
    )

    before = {rdd_id for rdd_id, _ in
              spark.sparkContext._jsc.getPersistentRDDs().items()}
    out = derivatives.lsmc_american(
        spark, 0.2, s0=100.0, k=100.0, r=0.05, t_y=0.25,
        n_steps=4, n_paths=200,
    )
    after = {rdd_id for rdd_id, _ in
             spark.sparkContext._jsc.getPersistentRDDs().items()}
    assert after <= before, "paths cache leaked past lsmc_american return"
    row = out.first()
    assert row["n_paths"] == 200
    assert 0.0 < row["price"] < 100.0
