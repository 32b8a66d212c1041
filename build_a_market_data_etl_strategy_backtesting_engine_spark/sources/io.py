"""Batch sources & sinks.

Reference surface (SURVEY §2.1): CSV/Parquet scans (eager, chunked for memory)
and zstd-parquet / CSV / Postgres-batch sinks. On Spark, chunking and the
per-file ProcessPool loop disappear — the scan is partitioned, the write is
parallel, and `partitionBy` replaces the reference's Postgres indexes
(``etl/database_writer.py:84-88``) as the pruning structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_ticks_csv(spark: SparkSession, path: str,
                   schema: StructType | None = None) -> DataFrame:
    """CSV tick scan (tick_to_ohlcv.py:159-170) — schema'd, header'd;
    malformed rows -> PERMISSIVE nulls filtered by the cleaner."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_ticks_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  compression: str = "zstd", mode: str = "overwrite") -> None:
    """zstd parquet sink (tick_to_ohlcv.py:161). ``partition_by`` (e.g.
    ["symbol"] or ["symbol","date"]) is the scale-out layout that replaces
    the reference's per-symbol file loops and DB indexes."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_jdbc(df: DataFrame, url: str, table: str,
               properties: dict[str, str] | None = None,
               batch_size: int = 1000, mode: str = "append",
               column_types: str | None = None) -> None:
    """Postgres batch-insert parity (etl/database_writer.py:110-163):
    executor-parallel INSERTs with JDBC ``batchsize`` playing the role of the
    reference's 1000-row buffer. Retry/exactly-once belongs to the streaming
    checkpoint layer, not here.

    Verified end-to-end against the embedded Derby driver on Spark's own
    classpath (tests/test_round4_ops.py::test_jdbc_round_trip — a real
    file-backed database, no network service needed); against Postgres the
    only change is the url/driver pair.

    ``column_types`` is the reference's explicit DDL types
    (database_writer.py:74-82 — ``symbol VARCHAR(20), price
    NUMERIC(20,6)``) via Spark's ``createTableColumnTypes``; leaving it
    None lets the dialect default (which on Derby maps StringType to
    CLOB — unindexable and uncomparable, so give strings a VARCHAR)."""
    props = {"batchsize": str(batch_size)}
    if column_types:
        props["createTableColumnTypes"] = column_types
    props.update(properties or {})
    df.write.jdbc(url, table, mode=mode, properties=props)


def read_jdbc(spark: SparkSession, url: str, table: str,
              properties: dict[str, str] | None = None,
              partition_column: str | None = None,
              lower_bound=None, upper_bound=None,
              num_partitions: int | None = None) -> DataFrame:
    """JDBC scan twin of :func:`write_jdbc` (database_writer.py:165-190
    reads). Pass ``partition_column`` + bounds for a parallel partitioned
    read (one executor query per stride) — without them the scan is a
    single connection, fine for dims only."""
    kwargs = {}
    if partition_column is not None:
        kwargs = {
            "column": partition_column,
            "lowerBound": lower_bound,
            "upperBound": upper_bound,
            "numPartitions": num_partitions or 8,
        }
    return spark.read.jdbc(url, table, properties=properties or {}, **kwargs)


def latest_trades(df: DataFrame, symbol: str, limit: int = 100,
                  symbol_col: str = "symbol", ts_col: str = "ts") -> DataFrame:
    """Point lookup: latest N trades for a symbol
    (etl/database_writer.py:165-190). Catalyst plans this as
    TakeOrderedAndProject after a pushed-down symbol filter — no full sort."""
    from pyspark.sql import functions as F

    return (
        df.filter(F.col(symbol_col) == symbol)
        .orderBy(F.col(ts_col).desc())
        .limit(limit)
    )
