"""Skew mitigation: salted joins and two-phase salted aggregation.

At 100 TB, natural keys (symbol, user, document cluster) concentrate —
real tick volume is power-law across symbols — and a single hot key turns
one shuffle partition into the job's critical path. AQE's skew-join split
is the runtime safety net, but it has two measured blind spots
(examples/skew_bench.py, SCALING.md "Skew"): the hot partition must exceed
``skewedPartitionThresholdInBytes`` (256 MB stock), and AQE refuses to
split when a downstream agg shares the join key's distribution unless
``forceOptimizeSkewedJoin`` is set. The static salting here needs no flags
and measured fastest (1.56 s vs 3.93 s plain / 1.92 s forced-AQE on the
5M-row 90%-hot-key bench).

No reference twin: the single-process reference never shuffles
(SURVEY.md §3 scale gap) — this module exists purely for the cluster
execution model.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_agg", "ensure_parallelism"]

#: analyzed-plan tree lines start with an optional branch prefix
#: (``+- `` / ``:  `` / indentation) followed by the node name.
_EXCHANGE_NODE_RE = re.compile(
    r"^[\s+:|-]*(?:Aggregate|Window|Join|RepartitionByExpression|"
    r"Repartition|Deduplicate|Sort)\b",
    re.MULTILINE,
)


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Cheap lower-bound estimate of ``df``'s scan parallelism from the
    plan's input files — avoids ``df.rdd.getNumPartitions()``, which
    forces a full logical-plan→RDD conversion (a re-plan that also
    bypasses AQE's view) on every call (r5 ADVICE). For local files it
    reproduces FilePartitions' bin-packing: files are padded by
    openCostInBytes, split at maxSplitBytes = min(maxPartitionBytes,
    max(openCost, totalPadded / defaultParallelism)), and packed into
    maxSplitBytes bins — counting per-file splits alone OVERESTIMATES
    for a many-tiny-files table (Spark packs them into ONE partition,
    the exact single-core regime this helper exists to catch; the bench
    media corpus found that live: 32 small files -> 1 actual scan
    partition). For remote filesystems or non-file sources it returns
    None and the caller falls back to the RDD count once.

    inputFiles() reflects leaf scans only, so for a frame that already
    crossed an exchange (aggregate/window/join/repartition upstream) the
    file-based figure describes the wrong plan node — it would trigger a
    redundant repartition of a frame that already has shuffle_partitions
    partitions (r6 ADVICE). Those plans return None here and the caller
    pays the accurate RDD count once; raw scans — the common case at the
    explode call sites — keep the cheap estimate."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None
    # Match node NAMES at the start of each tree line (after the +-/:
    # branch prefix), not bare substrings: a column or relation whose
    # name merely contains "Sort"/"Join" must not force the exact RDD
    # count on a plain scan (r8 ADVICE). \b keeps "Sorted_trades" from
    # matching Sort while "Sort [ts ASC]" still does.
    if _EXCHANGE_NODE_RE.search(plan):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    try:
        s = str(
            df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728"
            )
        ).strip().lower()
        mult = 1
        for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                       ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                       ("b", 1)):
            if s.endswith(suf):
                s, mult = s[: -len(suf)], m
                break
        max_bytes = max(1, int(s) * mult)
    except (TypeError, ValueError):
        max_bytes = 128 << 20
    import os

    try:
        s = str(df.sparkSession.conf.get(
            "spark.sql.files.openCostInBytes", "4194304")).strip().lower()
        open_cost = max(0, int(s.rstrip("b")))
    except (TypeError, ValueError):
        open_cost = 4 << 20
    sizes = []
    for f in files:
        if f.startswith("file:"):
            path = f[len("file:"):]
            while path.startswith("//"):
                path = path[1:]
            try:
                sizes.append(os.path.getsize(path))
            except OSError:
                return None
        else:  # hdfs/s3/... — no cheap local stat
            return None
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    total_padded = sum(sz + open_cost for sz in sizes)
    max_split = min(max_bytes,
                    max(open_cost, total_padded // max(parallelism, 1)))
    max_split = max(max_split, 1)
    # each file contributes ceil(size/max_split) splits of (chunk +
    # openCost) padded bytes; splits then pack into max_split bins
    padded = 0
    for sz in sizes:
        n_chunks = max(1, -(-sz // max_split))
        padded += sz + n_chunks * open_cost
    return max(1, -(-padded // max_split))


def ensure_parallelism(
    df: DataFrame, *key_cols: str, target: int | None = None
) -> DataFrame:
    """Hash-repartition ``df`` by ``key_cols`` when its physical plan has
    fewer partitions than the session's parallelism; no-op otherwise.

    The inverse of skew: explode-amplifying operators (char shingles, word
    n-grams — one row in, hundreds out, with hashing per output row) do
    work proportional to the AMPLIFIED size, but Spark parallelizes by
    INPUT splits. A small single-file table scans as one split, so the
    whole amplified pipeline runs on one core — measured 22.4 s -> 2.4 s
    (9.4x on local[32]) for MinHash signatures over a 50k-doc single-file
    corpus. At 100 TB the input has thousands of splits and this returns
    the frame untouched; the repartition only ever fires in the
    small-input regime where shuffling the payload is cheap.

    Hash partitioning by the doc key (not round-robin) keeps the
    distribution deterministic under retry and already satisfies the
    downstream groupBy(key) clustering, so the aggregate that follows
    needs no second exchange.
    """
    if df.isStreaming:  # micro-batch sizing is the stream's own concern
        return df
    sc = df.sparkSession.sparkContext
    goal = target or sc.defaultParallelism
    n = _estimated_scan_partitions(df)
    if n is None:  # non-file source / remote fs: pay the RDD count once
        n = df.rdd.getNumPartitions()
    if n >= goal:
        return df
    return df.repartition(goal, *[F.col(c) for c in key_cols])


def _salt_expr(df: DataFrame, n_salt: int, from_cols: list[str] | None) -> Column:
    """Deterministic per-row salt in [0, n_salt): xxhash64 over non-key
    payload columns (deterministic under task retry, unlike rand())."""
    cols = from_cols if from_cols else df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    n_salt: int = 16,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Equi-join that splits every (hot) key into ``n_salt`` shuffle
    partitions: the fact side gets a deterministic row salt, the dim side is
    exploded ``n_salt`` ways, and the join runs on ``on + [salt]``. Output
    rows are identical to ``fact.join(dim, on, how)``.

    Use when the dim side is too big to broadcast AND a fact key is hot.
    Cost: dim is replicated n_salt× (choose n_salt ≈ hot-partition-bytes /
    target-partition-bytes, not more). ``salt_from`` picks the fact columns
    hashed for the salt (default: all — rows identical across ALL columns
    share a salt, acceptable since exact duplicates co-locate anyway).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    f = fact.withColumn("_salt", _salt_expr(fact, n_salt, salt_from))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return f.join(d, keys + ["_salt"], how).drop("_salt")


# map-side-decomposable aggregates: phase1 partial per (keys, salt),
# phase2 merge per keys. avg decomposes into sum+count.
_MERGE = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str] | str,
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: phase 1 aggregates per
    (keys, salt) — n_salt parallel partials for a hot key — phase 2 merges
    partials per key. Result equals ``df.groupBy(keys).agg(...)`` exactly
    (equality-asserted in tests/test_scale_patterns.py).

    ``aggs`` maps output name -> (fn, col) with fn in sum/count/min/max/avg.
    Spark's hash aggregate already does map-side partials — this helps when
    the PARTIAL still skews: high-cardinality-payload aggs (collect-ish,
    exact count-distinct pre-splits) or when the post-shuffle reduce of one
    key dominates. It is also the documented fallback for hot windowed
    groups AQE cannot split.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn("_salt", _salt_expr(df, n_salt, salt_from))

    p1, p2 = [], []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            p1.append(F.count(col).alias(f"_p_{out}"))
            p2.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "avg":
            p1.append(F.sum(col).alias(f"_ps_{out}"))
            p1.append(F.count(col).alias(f"_pc_{out}"))
            p2.append(
                (F.sum(f"_ps_{out}") / F.sum(f"_pc_{out}")).alias(out))
        elif fn in _MERGE:
            p1.append(_MERGE[fn](col).alias(f"_p_{out}"))
            p2.append(_MERGE[fn](f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-decomposable agg fn {fn!r}")
    return (
        salted.groupBy(*keys, "_salt").agg(*p1)
        .groupBy(*keys).agg(*p2)
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top: int = 10,
) -> DataFrame:
    """Join/agg-key skew diagnostic: per-key counts for the ``top`` hottest
    keys, each annotated with the global key count, mean rows/key, and the
    key's skew factor (count / mean). Run this BEFORE a big join to decide
    between plain hash join, broadcast, AQE skew-split, or
    ``salted_join`` — the factor says how unbalanced the build side is.

    One map-combinable count agg; the global moments ride a broadcast
    1-row crossJoin; top-k is TakeOrderedAndProject. Nothing here scales
    with raw rows except the first agg.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("key_count")
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.avg("key_count").alias("mean_count"),
        F.max("key_count").alias("max_count"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "key", "key_count", "n_keys",
            (F.col("key_count") / F.col("mean_count")).alias("skew_factor"),
            (F.col("max_count") / F.col("mean_count")).alias("max_skew"),
        )
        .orderBy(F.desc("key_count"), F.asc("key"))
        .limit(top)
    )
