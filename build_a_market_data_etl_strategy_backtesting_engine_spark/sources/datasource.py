"""Python DataSource API (Spark 4) tick feed: ``tickgen``.

The Spark-4-idiomatic packaging of the mock feed
(``tools/generate_mock_ticks.py`` + ``paper_trading.py:230-295``'s
simulated stream): ONE registered data source that serves

- **batch**: ``spark.read.format("tickgen").option(...).load()`` —
  partition-parallel deterministic generation (each InputPartition owns a
  seq range; no driver-side materialization, no shuffle), with
  symbol-equality **filter pushdown** so filtered reads skip generating
  non-matching symbols entirely;
- **streaming**: ``spark.readStream.format("tickgen")`` — a
  ``SimpleDataSourceStreamReader`` whose offset is the tick seq. Because
  generation is a pure function of seq, ``readBetweenOffsets`` replays
  any epoch bit-identically: this source is genuinely replayable, so
  checkpoint recovery gives EXACTLY-once end-to-end — stronger than the
  socket/ws feeds (not replayable, at-least-once + idempotent sink) and
  the reference's lossy queue.

Price model: deterministic hash walk around ``s0`` (the stateless twin of
``rate_tick_source``'s wiggle — streaming/ingest.py:35-58), volume
lognormal-ish from the same hash. Stateless per-seq pricing is what makes
offset-range replay exact with O(1) work per row.

Register once per session:

    from build_a_market_data_etl_strategy_backtesting_engine_spark.sources.datasource import register
    register(spark)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

TICKGEN_SCHEMA = ("ts timestamp, symbol string, price double, "
                  "volume double, seq bigint")
_DEFAULT_SYMBOLS = "AAPL,MSFT,GOOGL"


def _u64(*parts) -> int:
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big")


def _opts(options) -> dict:
    return {
        "symbols": str(options.get("symbols", _DEFAULT_SYMBOLS)).split(","),
        "s0": float(options.get("s0", 100.0)),
        "seed": int(options.get("seed", 42)),
        "freq_ms": int(options.get("freq_ms", 1000)),
        "start_ms": int(options.get("start_ms", 1_700_000_000_000)),
    }


def gen_rows(seq_start: int, seq_end: int, o: dict) -> Iterator[tuple]:
    """Rows for ``seq in [seq_start, seq_end)`` — a pure function of
    (seq, options): the determinism contract behind partition-parallel
    batch reads AND exact streaming replay."""
    syms = o["symbols"]
    n = len(syms)
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    for seq in range(seq_start, seq_end):
        h = _u64(o["seed"], seq)
        wiggle = (h / 2.0 ** 64 - 0.5) * 0.02          # +/-1%
        price = round(o["s0"] * (1.0 + wiggle), 6)
        vol = float((h >> 32) % 97 + 1)
        # Yield the tz-AWARE UTC datetime: PySpark fixes the epoch
        # instant from it regardless of the session/OS timezone. A
        # naive datetime would be read in the local zone, shifting the
        # instant (and any bar bucketing) per-environment.
        ts = epoch + timedelta(
            milliseconds=o["start_ms"] + seq * o["freq_ms"])
        yield (ts, syms[seq % n], price, vol, seq)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class TickGenBatchReader(DataSourceReader):
    def __init__(self, options):
        self.o = _opts(options)
        self.n_ticks = int(options.get("n_ticks", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.symbol_filter: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept symbol = '<x>' (generation skips other symbols — the
        data-source twin of parquet predicate pushdown); everything else
        is returned for Spark to evaluate post-scan."""
        for f in filters:
            if (isinstance(f, EqualTo) and f.attribute == ("symbol",)
                    and self.symbol_filter is None):
                self.symbol_filter = str(f.value)
            else:
                yield f

    def partitions(self):
        per = max(1, -(-self.n_ticks // self.n_partitions))
        return [_Range(i, min(i + per, self.n_ticks))
                for i in range(0, self.n_ticks, per)]

    def read(self, partition: _Range):
        rows = gen_rows(partition.start, partition.end, self.o)
        if self.symbol_filter is not None:
            want = self.symbol_filter
            syms = self.o["symbols"]
            n = len(syms)
            rows = (r for r in rows if syms[r[4] % n] == want)
        return rows


class TickGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.o = _opts(options)
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        lo = int(start["seq"])
        hi = lo + self.rows_per_batch
        return iter(list(gen_rows(lo, hi, self.o))), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # pure-function replay: recovery re-reads any epoch bit-identically
        return iter(list(gen_rows(int(start["seq"]), int(end["seq"]),
                                  self.o)))


class TickGenDataSource(DataSource):
    """``format("tickgen")`` — see module docstring for options."""

    @classmethod
    def name(cls) -> str:
        return "tickgen"

    def schema(self) -> str:
        return TICKGEN_SCHEMA

    def reader(self, schema) -> TickGenBatchReader:
        return TickGenBatchReader(self.options)

    def simpleStreamReader(self, schema) -> TickGenStreamReader:
        return TickGenStreamReader(self.options)


def register(spark) -> None:
    # pushFilters needs the (runtime-settable) python pushdown flag
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TickGenDataSource)
