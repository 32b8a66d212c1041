"""Chunked-execution parity for the LSH candidate PAIR-JOIN and the
n-gram Jaccard verify — each runs as sequential hash-class passes over
parquet spills (r9 VERDICT #1: the pair space partitions by BAND even
though it does not by doc).

Every test pins chunked == monolithic row-for-row: the chunking is an
execution strategy, never a semantics change.

History: these tests landed in r10 as tests/test_round10_ops.py
(commit 0077344) and were accidentally deleted two commits later when
the sharding tests overwrote that filename (commit 7debc96, r10
VERDICT #1). Restored here under a FEATURE name so no other feature's
round-file can ever overwrite them again."""

import pytest
from pyspark.sql import functions as F

from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    dedup,
)
from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (
    load_tables,
)


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def _md5_bands(spark, sf_dir):
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )

    return q._md5_band_table(_docs(spark, sf_dir)).withColumnRenamed(
        "doc_id", "doc")


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ------------------------------------------------- chunked pair join

def test_lsh_pairs_chunked_equals_monolithic(spark, sf_dir):
    bands = _md5_bands(spark, sf_dir)
    mono = dedup.lsh_pairs_from_bands(bands)
    cols = ["doc_a", "doc_b", "n_shared_bands"]
    expected = _rows(mono, cols)
    assert expected, "fixture must produce candidate pairs"
    for k in (2, 3, 7):
        chunked = dedup.lsh_pairs_from_bands(bands, chunk_ranges=k)
        assert _rows(chunked, cols) == expected
        assert [f.dataType for f in chunked.schema.fields] == [
            f.dataType for f in mono.schema.fields]


def test_lsh_pairs_chunked_respects_stop_band_cap(spark, sf_dir):
    bands = _md5_bands(spark, sf_dir)
    cols = ["doc_a", "doc_b", "n_shared_bands"]
    mono = dedup.lsh_pairs_from_bands(bands, max_band_df=2)
    chunked = dedup.lsh_pairs_from_bands(bands, max_band_df=2,
                                         chunk_ranges=3)
    assert _rows(chunked, cols) == _rows(mono, cols)


def test_lsh_pairs_chunked_empty_input_returns_empty_frame(spark):
    # docs with no shared bands: every band bucket is a singleton, the
    # pair join is empty in every pass — the spill read must come back
    # as an EMPTY frame (explicit schema), not an inference error
    bands = spark.createDataFrame(
        [(i, b, f"uniq-{i}-{b}") for i in range(5) for b in (0, 1)],
        "doc long, band int, bh string")
    out = dedup.lsh_pairs_from_bands(bands, chunk_ranges=3)
    assert out.count() == 0
    assert out.columns == ["doc_a", "doc_b", "n_shared_bands"]


def test_estimate_band_pair_multiplicity_exact():
    # bucket sizes 3, 2, 1 -> C(3,2)+C(2,2)+C(1,2) = 3+1+0 = 4
    import build_a_market_data_etl_strategy_backtesting_engine_spark as eng

    spark = eng.get_spark("pytest", master="local[4]",
                          shuffle_partitions=4)
    bands = spark.createDataFrame(
        [(1, 0, "x"), (2, 0, "x"), (3, 0, "x"),
         (4, 0, "y"), (5, 0, "y"),
         (6, 1, "x")],
        "doc long, band int, bh string")
    assert dedup.estimate_band_pair_multiplicity(bands) == 4
    empty = bands.filter(F.lit(False))
    assert dedup.estimate_band_pair_multiplicity(empty) == 0


def test_estimate_matches_actual_pair_multiplicity(spark, sf_dir):
    # the estimator is EXACT: sum of per-pair n_shared_bands == sum C(d,2)
    bands = _md5_bands(spark, sf_dir)
    est = dedup.estimate_band_pair_multiplicity(bands)
    actual = (dedup.lsh_pairs_from_bands(bands)
              .agg(F.sum("n_shared_bands")).first()[0] or 0)
    assert est == actual


# ------------------------------------------------- chunked verify

def test_chunked_jaccard_edges_equals_monolithic(spark, sf_dir):
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )

    d = _docs(spark, sf_dir)
    cand = q._banded_same_source_cand(d)
    mono = dedup.chunked_jaccard_edges(d, cand, n=3, threshold=0.05,
                                       chunk_classes=1)
    expected = _rows(mono, ["doc_a", "doc_b"])
    assert expected, "fixture must produce verified edges"
    for k in (2, 5):
        chunked = dedup.chunked_jaccard_edges(
            d, cand, n=3, threshold=0.05, chunk_classes=k)
        assert _rows(chunked, ["doc_a", "doc_b"]) == expected


# ------------------------------------------------- full pipeline

def test_dup_edges_chunked_equals_monolithic(spark, sf_dir):
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )

    d = _docs(spark, sf_dir)
    mono = q._dup_edges(d)  # sf0.001 is far below the auto threshold
    expected = _rows(mono, ["doc_a", "doc_b"])
    assert expected
    chunked = q._dup_edges(d, chunk_ranges=3, verify_classes=2)
    assert _rows(chunked, ["doc_a", "doc_b"]) == expected
    # auto verify-class sizing path (verify_classes=None) on the
    # chunked branch
    auto = q._dup_edges(d, chunk_ranges=2)
    assert _rows(auto, ["doc_a", "doc_b"]) == expected


def test_dup_edges_env_forces_chunking(spark, sf_dir, monkeypatch):
    from build_a_market_data_etl_strategy_backtesting_engine_spark import (
        queries as q,
    )

    d = _docs(spark, sf_dir)
    expected = _rows(q._dup_edges(d), ["doc_a", "doc_b"])
    monkeypatch.setenv("SPARK_GRAFT_CAND_CHUNKS", "4")
    forced = q._dup_edges(d)
    assert _rows(forced, ["doc_a", "doc_b"]) == expected


def test_spill_frame_roundtrip(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v"))
    back = dedup.spill_frame(df, "testspill")
    # nullability legitimately widens through a parquet round-trip;
    # names and types must survive exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields]
    assert sorted(r.v for r in back.collect()) == [
        i * 2 for i in range(100)]


def test_box_scratch_budget_bounds(spark):
    b = dedup.box_scratch_budget(spark)
    assert (1 << 30) <= b <= (16 << 30)
    assert dedup.box_scratch_budget(spark, override=123) == 123


# --------------------------------------- hot-bucket subdivision (r11)

def test_hot_bucket_peel_equals_monolithic(spark, sf_dir):
    """r10 VERDICT #4: a bucket whose own C(d,2) exceeds the per-pass
    budget is peeled out and subdivided by doc hash. Forcing a tiny
    budget makes every real bucket hot — output must stay row-identical
    to the monolithic join."""
    bands = _md5_bands(spark, sf_dir)
    cols = ["doc_a", "doc_b", "n_shared_bands"]
    expected = _rows(dedup.lsh_pairs_from_bands(bands), cols)
    assert expected
    for budget in (1, 10):
        peeled = dedup.lsh_pairs_from_bands(
            bands, chunk_ranges=3, hot_pair_budget=budget)
        assert _rows(peeled, cols) == expected


def test_hot_bucket_peel_mixed_hot_and_cold(spark):
    """Crafted frame: one hot bucket (12 docs -> 66 pairs), several cold
    singleton-ish buckets, one doc in both — hot XOR cold split must not
    lose or double-count the pair that spans them."""
    rows = [(i, 0, "HOT") for i in range(12)]
    rows += [(i, 1, f"c{i % 3}") for i in range(6)]  # cold buckets of 2
    bands = spark.createDataFrame(rows, "doc long, band int, bh string")
    cols = ["doc_a", "doc_b", "n_shared_bands"]
    mono = _rows(dedup.lsh_pairs_from_bands(bands), cols)
    # budget 20 < 66: the HOT bucket peels (m = ceil(66/20) = 4 passes);
    # the band-1 buckets (1 pair each) stay cold
    peeled = dedup.lsh_pairs_from_bands(bands, chunk_ranges=2,
                                        hot_pair_budget=20)
    assert _rows(peeled, cols) == mono
    # a doc in a hot AND a cold bucket contributes to both partials
    assert any(n > 1 for _, _, n in mono) or mono  # sanity on fixture


def test_hot_bucket_peel_respects_stop_band_cap(spark, sf_dir):
    """Cap is applied on GLOBAL df before chunking; peeling what remains
    must not change it."""
    bands = _md5_bands(spark, sf_dir)
    cols = ["doc_a", "doc_b", "n_shared_bands"]
    mono = dedup.lsh_pairs_from_bands(bands, max_band_df=2)
    peeled = dedup.lsh_pairs_from_bands(bands, max_band_df=2,
                                        chunk_ranges=3, hot_pair_budget=1)
    assert _rows(peeled, cols) == _rows(mono, cols)


def test_hot_bucket_budget_none_is_r10_behavior(spark, sf_dir):
    """No budget -> no peel: byte-for-byte the r10 bucket-class path."""
    bands = _md5_bands(spark, sf_dir)
    cols = ["doc_a", "doc_b", "n_shared_bands"]
    assert _rows(dedup.lsh_pairs_from_bands(bands, chunk_ranges=3), cols) \
        == _rows(dedup.lsh_pairs_from_bands(
            bands, chunk_ranges=3, hot_pair_budget=None), cols)


def test_chunked_spill_frames_carry_merge_hint(spark):
    """r10 ADVICE: the frames RETURNED from the chunked operators are
    lazy spill scans consumed after the _no_auto_broadcast guard exits —
    they must carry a per-plan merge join hint so an external caller's
    join can't promote the mis-stat'd spill to a broadcast build side."""
    bands = spark.createDataFrame(
        [(i, 0, "x") for i in range(4)] + [(i, 1, "y") for i in range(4)],
        "doc long, band int, bh string")
    out = dedup.lsh_pairs_from_bands(bands, chunk_ranges=2)
    plan = out._jdf.queryExecution().logical().toString()
    assert "hint" in plan.lower() and "merge" in plan.lower()
    # and the hint is semantics-neutral: same rows as monolithic
    mono = dedup.lsh_pairs_from_bands(bands)
    cols = ["doc_a", "doc_b", "n_shared_bands"]
    assert _rows(out, cols) == _rows(mono, cols)


# ----------------------------------------- cluster queries unchanged

@pytest.mark.parametrize("qname", ["q80_dup_clusters",
                                   "q135_dedup_resolution",
                                   "q146_dup_clusters_star"])
def test_cluster_queries_identical_under_forced_chunking(
        spark, sf_dir, qname, monkeypatch):
    """End-to-end: the four near-dup cluster queries produce identical
    rows with the chunked edge pipeline forced on — the refactor to the
    shared _dup_edges helper is observable-output-neutral."""
    import __spark_entry__ as entry

    fn = entry.queries()[qname]
    base = sorted(map(tuple, fn(spark, sf_dir).collect()))
    monkeypatch.setenv("SPARK_GRAFT_CAND_CHUNKS", "3")
    forced = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert forced == base


# ----------------------------------------- sized cold-pass salt (r12)

def test_sized_pair_salt_boundaries():
    """Cold-pass salt sizing (r11 VERDICT #5 / ADVICE): 1 (no a-side
    explode) when the largest cold bucket's pair count fits one task's
    partial-agg target, then ceil-scaled, capped at the measured
    _PAIR_SALT."""
    t = dedup._PAIR_AGG_TARGET_ROWS
    assert dedup._sized_pair_salt(0) == 1
    assert dedup._sized_pair_salt(t) == 1
    assert dedup._sized_pair_salt(t + 1) == 2
    assert dedup._sized_pair_salt(3 * t) == 3
    # sf100's measured budget-capped cold max (~1.79e8) still hits the
    # protective cap — the r11 ledger's cold rows stay comparable
    assert dedup._sized_pair_salt(178_956_970) == dedup._PAIR_SALT
    assert dedup._sized_pair_salt(10**15) == dedup._PAIR_SALT


def test_small_sf_cold_passes_skip_salt_explode(spark, sf_dir):
    """At small SFs every cold bucket fits the per-task target, so the
    cold salt collapses to 1 — the salt-free plain self-join branch of
    _pair_partial (no 32x a-side explode, the r11 fixed constant's cost
    on every cold pass) — and output must stay identical to monolithic.
    The salt value itself is pinned from the fixture's actual max cold
    bucket, so this test fails if the sizing ever stops engaging."""
    bands = _md5_bands(spark, sf_dir)
    budget = dedup.box_scratch_budget(spark)
    max_bpairs = int(
        bands.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max(F.expr("CAST(d AS BIGINT) * (d - 1) DIV 2")))
        .first()[0] or 0)
    assert 0 < max_bpairs <= budget // 96  # all-cold fixture
    assert dedup._sized_pair_salt(max_bpairs) == 1  # branch engaged
    out = dedup.lsh_pairs_from_bands(
        bands, chunk_ranges=3, hot_pair_budget=budget // 96)
    mono = dedup.lsh_pairs_from_bands(bands)
    cols = ["doc_a", "doc_b", "n_shared_bands"]
    assert _rows(out, cols) == _rows(mono, cols)
