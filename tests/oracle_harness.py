"""Driver-mimicking oracle harness: run each Spark query and its DuckDB twin
at a given scale factor and compare row-count, schema shape, and
order-insensitive values exactly.

Used by tests/test_oracle.py and runnable standalone:
    python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import re
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


# ---------------------------------------------------------------------------
# Digest mode: order-free differential compare WITHOUT a driver collect.
#
# For fact-scale outputs (q41 as-of at sf100 emits 600M rows) the collect
# path above is the harness's own bottleneck — the engines agree but the
# driver can't hold either side. Digest mode reduces each result to three
# scalars computed INSIDE each engine:
#
#     (row_count, sum(h1), sum(h2))     h1/h2 = two independent 48-bit
#                                       integers from md5 of the row's
#                                       canonical string
#
# and compares the scalars. The sum is order-free and multiset-exact
# (duplicate rows add twice); faking both 48-bit sums simultaneously by
# accident is ~2^-96. Canonicalization is bit-exact on both sides:
#
#   * doubles/floats/decimals → C99 '%a' hex-float of the double value —
#     the one float format both engines print EXACTLY (Spark's
#     format_string('%.17e') zero-pads Java's shortest repr and does NOT
#     match C printf; '%a' prints the raw mantissa bits). Cosmetic
#     normalization: C emits 'p+13' and trims '0x1p'; Java emits 'p13'
#     and always keeps a '.', so the DuckDB side rewrites 'p+'→'p' and
#     inserts '.0' when no point is present. NaN/±Inf/±0 are CASE-mapped
#     to fixed literals before formatting (Java prints 'NaN', C 'nan').
#   * timestamps → unix micros (integer, session-tz-free on both sides).
#   * dates → days since 1970-01-01.
#   * exact ints / booleans / strings → plain decimal / 1|0 / identity.
#   * arrays of the above → '[' + ','-joined element canon + ']'.
#   * NULL (any type, incl. array elements) → 'N'.
#
# Columns are sorted by name (same as _rows_to_set) and joined with the
# \x1f unit separator. h1 = first 12 md5 hex chars, h2 = chars 13..24 —
# both < 2^48, so the sums accumulate in decimal(38,0) on the Spark side
# (a bare long sum wraps past just 2^15 rows — ANSI mode caught exactly
# that on q101) and HUGEINT on the DuckDB side; both are exact past
# 3e23 rows.
# ---------------------------------------------------------------------------

_SEP = "\x1f"


def _spark_canon_col(c, dt):
    """Canonical-string Column for one field (nullable; caller coalesces)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        d = c.cast("double")
        # format_string renders a NULL arg as the string 'null' (Java
        # Formatter semantics), so NULL must short-circuit to 'N' here
        return (
            F.when(d.isNull(), F.lit("N"))
            .when(F.isnan(d), F.lit("NaN"))
            .when(d == F.lit(float("inf")), F.lit("Inf"))
            .when(d == F.lit(float("-inf")), F.lit("-Inf"))
            .when(d == F.lit(0.0), F.lit("0"))  # also normalizes -0.0
            .otherwise(F.format_string("%a", d))
        )
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c).cast("string")
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("string")
    if isinstance(dt, T.BooleanType):
        return c.cast("int").cast("string")
    if isinstance(dt, T.ArrayType):
        elem = dt.elementType
        return F.concat(
            F.lit("["),
            F.concat_ws(
                ",",
                F.transform(
                    c, lambda x: F.coalesce(
                        _spark_canon_col(x, elem), F.lit("N"))
                ),
            ),
            F.lit("]"),
        )
    if isinstance(
        dt, (T.StringType, T.ByteType, T.ShortType,
             T.IntegerType, T.LongType)
    ):
        return c.cast("string")
    raise NotImplementedError(f"digest canon for Spark type {dt}")


def spark_digest(sdf):
    """(count, hashsum1, hashsum2) of ``sdf`` computed distributed —
    nothing larger than one 3-column row reaches the driver."""
    from pyspark.sql import functions as F

    exprs = [
        F.coalesce(_spark_canon_col(F.col(f.name), f.dataType), F.lit("N"))
        for f in sorted(sdf.schema.fields, key=lambda f: f.name)
    ]
    s = F.concat_ws(_SEP, *exprs)
    m = F.md5(s)
    h1 = F.conv(F.substring(m, 1, 12), 16, 10).cast("decimal(38,0)")
    h2 = F.conv(F.substring(m, 13, 12), 16, 10).cast("decimal(38,0)")
    row = sdf.select(h1.alias("h1"), h2.alias("h2")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("h1").alias("s1"),
        F.sum("h2").alias("s2"),
    ).collect()[0]
    return (int(row.n), int(row.s1 or 0), int(row.s2 or 0))


def _duck_canon_expr(col, t):
    """Canonical-string SQL expression for one DuckDB result column."""
    t = t.upper()
    q = f'"{col}"'
    if (t in ("DOUBLE", "FLOAT", "REAL") or t.startswith("DECIMAL")
            or t.startswith("FLOAT")):
        d = f"CAST({q} AS DOUBLE)"
        p0 = f"replace(printf('%a', {d}), 'p+', 'p')"
        norm = (f"(CASE WHEN strpos({p0}, '.') > 0 THEN {p0} "
                f"ELSE replace({p0}, 'p', '.0p') END)")
        return (f"(CASE WHEN {q} IS NULL THEN 'N' "
                f"WHEN isnan({d}) THEN 'NaN' "
                f"WHEN {d} = 'infinity'::DOUBLE THEN 'Inf' "
                f"WHEN {d} = '-infinity'::DOUBLE THEN '-Inf' "
                f"WHEN {d} = 0 THEN '0' ELSE {norm} END)")
    if t.startswith("TIMESTAMP"):
        return f"CAST(epoch_us({q}) AS VARCHAR)"
    if t == "DATE":
        return f"CAST(({q} - DATE '1970-01-01') AS VARCHAR)"
    if t == "BOOLEAN":
        return (f"(CASE WHEN {q} IS NULL THEN NULL "
                f"WHEN {q} THEN '1' ELSE '0' END)")
    if t.endswith("[]"):
        elem = _duck_canon_expr("__x__", t[:-2]).replace('"__x__"', "x")
        return (f"('[' || coalesce(array_to_string(list_transform({q}, "
                f"x -> coalesce({elem}, 'N')), ','), '') || ']')")
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "VARCHAR"):
        return f"CAST({q} AS VARCHAR)"
    raise NotImplementedError(f"digest canon for DuckDB type {t}")


def duck_digest(con, sql):
    """(count, hashsum1, hashsum2) of the oracle SQL, computed in DuckDB."""
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
    cols = sorted((r[0], r[1]) for r in desc)
    parts = []
    for name, t in cols:
        parts.append(f"coalesce({_duck_canon_expr(name, t)}, 'N')")
    joined = f" || chr(31) || ".join(parts) if len(parts) > 1 else parts[0]
    h = f"md5({joined})"
    agg = (
        f"SELECT count(*), "
        f"sum(('0x' || substr({h}, 1, 12))::BIGINT), "
        f"sum(('0x' || substr({h}, 13, 12))::BIGINT) "
        f"FROM ({sql})"
    )
    n, s1, s2 = con.execute(agg).fetchone()
    return (int(n), int(s1 or 0), int(s2 or 0))


#: Oracle digests computed in output-column chunks: the digest sums are
#: additive over any partition of the output rows, so a query whose
#: DuckDB formulation exhausts memory in one pass (q48 at sf100: the
#: per-position md5 explosion OOMs at "Failed to allocate block") runs
#: as k filtered passes on an integer output column instead — the
#: ``col % k = i`` filter pushes through the GROUP BY into the scan, so
#: per-pass memory is ~1/k of the monolithic run. Values identical.
#: (col, k) wraps the whole query in an output filter; (col, k, table)
#: additionally pushes the filter INTO the named source table — required
#: when the memory explosion happens upstream of the output columns and
#: DuckDB does not push the outer predicate itself (measured r9 on q48:
#: the outer-filter form recomputes the full per-position md5 explosion
#: k times and still OOMs at sf100; the source-filter form is valid
#: because doc_id partitions every downstream operator).
DUCK_DIGEST_CHUNKS: dict[str, tuple] = {
    "q48_winnowing_fingerprints": ("doc_id", 64, "documents"),
    # id == p_partkey, so part-source chunking partitions the recursion:
    # each pass prices 1/64 of the options (the DuckDB side's memory and
    # working-set bound at sf100, mirroring the engine side's chunks)
    "q120_binomial_american": ("id", 64, "part", "p_partkey"),
}


#: View-SHADOW chunking (r11, r10 VERDICT #6): for oracle SQL that
#: references its source table at SEVERAL sites (q135: documents appears
#: in the token CTE, the shingle CTE, the CC seed and the resolution
#: join — the single-site regex rewrite above can't touch it), each pass
#: shadows the table with a filtered TEMP view so EVERY reference sees
#: the same chunk class. Valid ONLY when the query semantically
#: partitions by the chunk expression: q135's edge stage requires
#: a.source = b.source (candidate pairs crossing sources are dropped
#: before any edge forms), so connected components never span sources
#: and every output row (doc_id, cluster, n_members, is_canonical) is
#: computable within its doc's source class. Without this, q135's
#: monolithic DuckDB side spills >60 GB of all-pairs scratch at sf10 and
#: dies on temp disk (SCALING.md r10 ladder).
#: k=16 over the corpus's 20 uniform sources puts 1-2 sources (~1/10 of
#: the all-pairs scratch) in each pass — sf10's >60 GB monolithic spill
#: becomes ~6 GB/pass.
DUCK_DIGEST_SHADOW_CHUNKS: dict[str, tuple] = {
    "q135_dedup_resolution": ("documents", "hash(source)", 16),
}


def duck_digest_shadow_chunked(con, sql, table, chunk_expr, k):
    """Additive (count, hashsum1, hashsum2) over k passes, each running
    the UNMODIFIED sql with ``table`` shadowed by a temp view filtered
    to ``chunk_expr % k = i`` (DuckDB resolves temp names before main,
    and dropping the temp view restores the original — pinned by
    tests/test_digest.py)."""
    # catalog-qualified base reference: the temp catalog ALSO has a
    # schema named main, so a bare main.{table} inside the shadow view
    # re-resolves to the shadow itself (binder: "infinite recursion")
    cat = con.execute("SELECT current_catalog()").fetchone()[0]
    n = s1 = s2 = 0
    for i in range(k):
        con.execute(
            f"CREATE OR REPLACE TEMP VIEW {table} AS "
            f"SELECT * FROM {cat}.main.{table} "
            f"WHERE ({chunk_expr}) % {k} = {i}")
        try:
            cn, c1, c2 = duck_digest(con, sql)
        finally:
            con.execute(f"DROP VIEW temp.{table}")
        n, s1, s2 = n + cn, s1 + c1, s2 + c2
    return (n, s1, s2)


#: Spark-side twin of DUCK_DIGEST_CHUNKS: run the engine digest as k
#: sequential passes filtered by ``col % k`` — Catalyst pushes the
#: deterministic partition-key predicate below the query's windows and
#: aggregates to the parquet scan (plan-verified), so one pass's shuffle
#: is ~1/k of the monolithic digest. Needed where the ENGINE side's
#: scratch exceeds the box at sf100 (q48: the winnowing window sorts
#: every document position — ~500 GB of shuffle monolithically).
SPARK_DIGEST_CHUNKS: dict[str, tuple] = {
    "q48_winnowing_fingerprints": ("doc_id", 24),
}


def spark_digest_chunked(sdf, col, k):
    """Additive (count, hashsum1, hashsum2) over ``col % k`` passes."""
    from pyspark.sql import functions as F

    n = s1 = s2 = 0
    for i in range(k):
        part = sdf.filter(F.pmod(F.col(col), F.lit(k)) == i)
        cn, c1, c2 = spark_digest(part)
        n, s1, s2 = n + cn, s1 + c1, s2 + c2
    return (n, s1, s2)


def duck_digest_chunked(con, sql, col, k, table=None, src_col=None):
    """Additive (count, hashsum1, hashsum2) over ``col % k`` chunks.
    ``src_col`` names the chunk column INSIDE ``table`` when it differs
    from the output column (e.g. q120: output ``id`` = source
    ``p_partkey``)."""
    n = s1 = s2 = 0
    for i in range(k):
        if table is None:
            part = f"SELECT * FROM ({sql}) WHERE ({col}) % {k} = {i}"
        else:
            # word-boundary match so 'FROM part' never rewrites a longer
            # identifier like 'FROM partsupp' (r9 ADVICE)
            pat = re.compile(rf"FROM {table}\b")
            src = (f"FROM (SELECT * FROM {table} "
                   f"WHERE ({src_col or col}) % {k} = {i}) {table}")
            assert len(pat.findall(sql)) == 1, (
                f"source-chunked digest needs exactly one 'FROM {table}'")
            part = pat.sub(src, sql)
        cn, c1, c2 = duck_digest(con, part)
        n, s1, s2 = n + cn, s1 + c1, s2 + c2
    return (n, s1, s2)


def compare_query_digest(spark, con, fn, sql, name="", sf_dir=None):
    """Digest-mode twin of compare_query: scalars only, any scale."""
    report = {"name": name, "ok": True, "errors": [], "mode": "digest"}
    sdf = fn(spark, sf_dir)
    duck_cols = [r[0] for r in
                 con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()]
    if sorted(sdf.columns) != sorted(duck_cols):
        report["ok"] = False
        report["errors"].append(
            f"columns differ: spark={sorted(sdf.columns)} "
            f"duck={sorted(duck_cols)}")
        return report
    if name in DUCK_DIGEST_CHUNKS:
        dd = duck_digest_chunked(con, sql, *DUCK_DIGEST_CHUNKS[name])
    elif name in DUCK_DIGEST_SHADOW_CHUNKS:
        dd = duck_digest_shadow_chunked(
            con, sql, *DUCK_DIGEST_SHADOW_CHUNKS[name])
    else:
        dd = duck_digest(con, sql)
    if name in SPARK_DIGEST_CHUNKS:
        sd = spark_digest_chunked(sdf, *SPARK_DIGEST_CHUNKS[name])
    else:
        sd = spark_digest(sdf)
    if sd[0] != dd[0]:
        report["ok"] = False
        report["errors"].append(
            f"row count differs: spark={sd[0]} duck={dd[0]}")
    if sd[1:] != dd[1:]:
        report["ok"] = False
        report["errors"].append(
            f"value digest differs: spark={sd[1:]} duck={dd[1:]}")
    report["digest"] = {"spark": sd, "duck": dd}
    return report


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


def run_all(sf_dir: str, names=None, digest: bool = False):
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
            cmp_fn = compare_query_digest if digest else compare_query
            rep = cmp_fn(spark, con, fn, oracleq[name], name, sf_dir)
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
    argv = [a for a in sys.argv[1:] if a != "--digest"]
    digest = "--digest" in sys.argv[1:]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    names = set(argv[1:]) or None
    res = run_all(sf, names, digest=digest)
    n_fail = sum(1 for r in res if r["ok"] is False)
    print(f"\n{sum(1 for r in res if r['ok'])} pass, {n_fail} fail, "
          f"{sum(1 for r in res if r['ok'] is None)} skip")
    sys.exit(1 if n_fail else 0)
