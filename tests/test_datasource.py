"""Python DataSource API (format("tickgen")) — batch + streaming tests.

The Spark-4 custom-source packaging of the mock feed: deterministic
partition-parallel batch generation with symbol filter pushdown, and a
seq-offset streaming reader whose pure-function replay makes checkpoint
recovery exactly-once.
"""

from __future__ import annotations

import time

import pytest

from build_a_market_data_etl_strategy_backtesting_engine_spark.sources import (
    datasource as dsrc,
)


@pytest.fixture()
def tickgen(spark):
    from build_a_market_data_etl_strategy_backtesting_engine_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(spark)
    dsrc.register(spark)
    return spark


def test_batch_read_deterministic_and_partition_invariant(tickgen):
    spark = tickgen
    a = (spark.read.format("tickgen").option("n_ticks", 500)
         .option("n_partitions", 2).load())
    b = (spark.read.format("tickgen").option("n_ticks", 500)
         .option("n_partitions", 7).load())
    assert a.count() == 500
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, "partitioning changed the data"
    seqs = [r[4] for r in ra]
    assert seqs == list(range(500))
    assert all(90.0 < r[2] < 110.0 for r in ra)  # +/-1% walk around s0


def test_batch_symbol_filter_pushdown(tickgen):
    spark = tickgen
    df = (spark.read.format("tickgen").option("n_ticks", 900).load()
          .filter("symbol = 'GOOGL'"))
    rows = df.collect()
    assert len(rows) == 300
    assert all(r["symbol"] == "GOOGL" for r in rows)
    # residual (non-equality) predicates still evaluate correctly
    df2 = (spark.read.format("tickgen").option("n_ticks", 900).load()
           .filter("symbol = 'GOOGL' AND seq < 30"))
    assert df2.count() == 10


def test_stream_reader_contiguous_offsets(tickgen, tmp_path):
    spark = tickgen
    src = (spark.readStream.format("tickgen")
           .option("rows_per_batch", 40).load())
    q = (src.writeStream.format("memory").queryName("tickgen_mem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("select count(*) c from tickgen_mem").first().c
            if n >= 120:  # >= 3 micro-batches
                break
            time.sleep(0.5)
        rows = spark.sql(
            "select seq from tickgen_mem order by seq").collect()
        seqs = [r["seq"] for r in rows]
        assert len(seqs) >= 120
        assert seqs == list(range(len(seqs))), "gap or dup across batches"
    finally:
        q.stop()


def test_stream_replay_is_bit_identical():
    """The exactly-once contract: readBetweenOffsets must reproduce an
    epoch exactly (pure function of seq), and agree with read()."""
    r = dsrc.TickGenStreamReader({"rows_per_batch": 25})
    first, off = r.read({"seq": 0})
    first = list(first)
    assert off == {"seq": 25}
    replay = list(r.readBetweenOffsets({"seq": 0}, {"seq": 25}))
    assert first == replay
    again = list(r.readBetweenOffsets({"seq": 0}, {"seq": 25}))
    assert replay == again


def test_batch_and_stream_agree():
    """One generator, two surfaces: the batch rows ARE the stream rows."""
    o = dsrc._opts({})
    batch = list(dsrc.gen_rows(0, 50, o))
    r = dsrc.TickGenStreamReader({"rows_per_batch": 50})
    stream, _ = r.read({"seq": 0})
    assert batch == list(stream)
