"""Synthesize the 10x (sf1-equivalent) rehearsal dataset from sf0.1.

r4 VERDICT task #1: every scale step so far exposed a new bug class, so
round 5 rehearses the full oracle sweep + bench at 10x sf0.1 (~6M
lineitem rows — the reference's own large-scale yardstick is row-scale,
README.md:12,249). The driver's testdata is read-only, so the rehearsal
set derives deterministically from sf0.1 into a scratch dir:

- region/nation: constant dims, copied verbatim.
- customer/supplier/part/orders/lineitem: 10 key-offset copies; foreign
  keys re-point inside each copy, so selectivities and join fan-outs are
  preserved exactly while key cardinality grows 10x.
- events: 10 copies with per-copy symbol suffix (5 -> 50 symbols, the
  realistic market-data axis), offset event_id/user_id, same time range.
- documents: 10 copies, doc_id offset, a per-copy token appended to the
  text (near-dup structure is preserved, nothing becomes an exact dup),
  n_chars recomputed.
- embeddings: 10 copies, vec_id offset, deterministic per-copy scaling
  (1 + copy/1e4) so vectors are near but not identical.

Single-file zstd parquet per table (what both engines' loaders expect).

Run:  python tools/gen_scale10.py [out_dir=/tmp/sf1] [copies=10] [src=sf0.1]

Key offsets are derived from each table's max key at runtime, so the
generator CHAINS: sf0.1 -> sf1 -> sf10 gives two measured decades above
the driver data (the second decade reuses the same selectivity-preserving
construction).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main(out: str = "/tmp/sf1", copies: int = 10, src_dir: str = SRC) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def off(table: str, key: str) -> int:
        """Key offset per copy, derived so copies never collide at ANY
        source scale: keys are dense (the driver's generator and this
        one both emit them dense), so the offset is the cardinality —
        max(key) for 1-based tables, max+1 for 0-based. Reproduces the
        original hardcoded sf0.1 offsets exactly, and chains (a 10x
        output is itself dense, so it can be the next source)."""
        mn, mx = con.execute(
            f"SELECT min({key}), max({key}) FROM '{src_dir}/{table}.parquet'"
        ).fetchone()
        return int(mx) + (1 if mn == 0 else 0)

    def w(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    def src(name: str) -> str:
        return f"'{src_dir}/{name}.parquet'"

    rng = f"range(0, {copies})"
    co = off("customer", "c_custkey")
    so = off("supplier", "s_suppkey")
    po = off("part", "p_partkey")
    oo = off("orders", "o_orderkey")
    eo = off("events", "event_id")
    do = off("documents", "doc_id")
    vo = off("embeddings", "vec_id")
    # constant dims: verbatim
    for t in ("region", "nation"):
        w(t, f"SELECT * FROM {src(t)}")

    w("customer", f"""
        SELECT c_custkey + copy * {co} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, {rng} AS t(copy)""")
    w("supplier", f"""
        SELECT s_suppkey + copy * {so} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM {src('supplier')}, {rng} AS t(copy)""")
    w("part", f"""
        SELECT p_partkey + copy * {po} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM {src('part')}, {rng} AS t(copy)""")
    w("orders", f"""
        SELECT o_orderkey + copy * {oo} AS o_orderkey,
               o_custkey + copy * {co} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, {rng} AS t(copy)""")
    w("lineitem", f"""
        SELECT l_orderkey + copy * {oo} AS l_orderkey,
               l_partkey + copy * {po} AS l_partkey,
               l_suppkey + copy * {so} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, {rng} AS t(copy)""")
    w("events", f"""
        SELECT event_id + copy * {eo} AS event_id, ts,
               user_id + copy * {eo} AS user_id,
               CASE WHEN copy = 0 THEN event_type
                    ELSE event_type || '_' || copy END AS event_type,
               value, props
        FROM {src('events')}, {rng} AS t(copy)""")
    w("documents", f"""
        SELECT doc_id + copy * {do} AS doc_id,
               CASE WHEN copy = 0 THEN text
                    ELSE text || ' copytag' || copy END AS text,
               lang, source,
               CAST(length(CASE WHEN copy = 0 THEN text
                    ELSE text || ' copytag' || copy END) AS BIGINT)
                 AS n_chars
        FROM {src('documents')}, {rng} AS t(copy)""")
    w("embeddings", f"""
        SELECT vec_id + copy * {vo} AS vec_id,
               list_transform(embedding,
                   x -> CAST(x * (1.0 + copy / 10000.0) AS FLOAT))
                 AS embedding,
               label
        FROM {src('embeddings')}, {rng} AS t(copy)""")
    print(f"wrote {out} ({copies}x {src_dir})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
         int(sys.argv[2]) if len(sys.argv) > 2 else 10,
         sys.argv[3] if len(sys.argv) > 3 else SRC)
