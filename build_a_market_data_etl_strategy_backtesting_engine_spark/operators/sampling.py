"""Deterministic sampling + token-budget packing for training-corpus curation.

Beyond-reference components (the reference engine has no sampling surface):
these are the knobs a 100 TB LLM-data pipeline turns constantly — "keep 3%
of CommonCrawl but 100% of books", "shard documents into ~8k-token training
sequences" — expressed so they scale:

- hash sampling is pure map-side: a deterministic per-row expression, no
  shuffle, no RNG state to coordinate across 1000 executors, and stable
  under retries/re-partitioning (the same row is always in or always out);
- stratified rates ride a literal CASE expression (a handful of strata) —
  no join at all;
- packing uses a window cumsum; at scale it partitions by an explicit
  shard column so no global sort is required.

Two hash flavours:
- production: ``xxhash64`` (JVM codegen, 64-bit, fast);
- portable:   first 4 md5 hex digits (identical in DuckDB — the oracle
  twin), decoded with ``ascii()`` arithmetic so both engines evaluate the
  exact same integer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "portable_bucket",
    "deterministic_sample",
    "stratified_sample",
    "stratified_fixed_n",
    "pack_token_budget",
    "mixture_rates",
    "dsir_bucket_logratios",
    "dsir_importance_weights",
    "dsir_resample",
]

#: bucket space for rate thresholds (rate 0.1234 -> threshold 1234)
N_BUCKETS = 10_000


def hash_bucket(key: Column, n: int = N_BUCKETS) -> Column:
    """Fast production bucket in [0, n): pmod(xxhash64(key), n)."""
    return F.pmod(F.xxhash64(key.cast("string")), F.lit(n))


def _hex_digit(h: Column, j: int) -> Column:
    """Value 0..15 of 1-based hex char ``j`` of a lowercase hex string.

    ascii('0'..'9') = 48..57, ascii('a'..'f') = 97..102 — decoded with
    arithmetic only, so the same expression runs verbatim in DuckDB.
    """
    a = F.ascii(F.substring(h, j, 1))
    return F.when(a >= 97, a - 87).otherwise(a - 48)


def portable_bucket(key: Column, n: int = N_BUCKETS) -> Column:
    """Engine-portable bucket in [0, n): first 4 md5 hex digits mod n.

    4 hex digits span [0, 65536) -> ``n`` must be <= 65536. Used by the
    DuckDB oracle twins; ~2x slower than xxhash64 but still codegen'd.
    """
    if n > 65536:
        raise ValueError("portable_bucket supports n <= 65536")
    h = F.md5(key.cast("string"))
    v = (
        _hex_digit(h, 1) * 4096 + _hex_digit(h, 2) * 256
        + _hex_digit(h, 3) * 16 + _hex_digit(h, 4)
    )
    return v % n


def portable_bucket_sql(key_sql: str, n: int = N_BUCKETS) -> str:
    """The DuckDB-SQL twin of :func:`portable_bucket` (same arithmetic)."""
    digit = (
        "(CASE WHEN ascii(substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) >= 97 "
        "THEN ascii(substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) - 87 "
        "ELSE ascii(substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) - 48 END)"
    )
    d = [digit.format(k=key_sql, j=j) for j in (1, 2, 3, 4)]
    return f"(({d[0]} * 4096 + {d[1]} * 256 + {d[2]} * 16 + {d[3]}) % {n})"


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    portable: bool = False,
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by hashing ``key_col``.

    Map-side filter — no shuffle, reproducible across runs/retries, and
    consistent across tables (the same key sampled in two tables keeps or
    drops together, which plain ``df.sample`` cannot guarantee).
    """
    bucket = (portable_bucket if portable else hash_bucket)(F.col(key_col))
    return df.filter(bucket < int(round(rate * N_BUCKETS)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling ("keep 10% of en, all of fr").

    Rates become one literal CASE expression — no join, no broadcast, the
    filter stays inside whole-stage codegen next to the scan.
    """
    thr = F.lit(int(round(default_rate * N_BUCKETS)))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, int(round(rate * N_BUCKETS))
        ).otherwise(thr)
    bucket = (portable_bucket if portable else hash_bucket)(F.col(key_col))
    return df.filter(bucket < thr)


def pack_token_budget(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed token-budget training shards.

    Sequential packing rule: order documents by ``order_col`` (within
    ``shard_col`` if given), take the running token count *before* each
    document, and put the document in bin ``floor(start / budget)``.
    Integer arithmetic end-to-end — bit-identical across engines.

    100 TB: always pass ``shard_col`` (e.g. a hash-derived shard id) so the
    window sorts per-shard instead of globally; bins are then
    (shard, bin_in_shard) pairs. A single global ordering of 100 TB of
    documents is exactly the sort this avoids.
    """
    part = [shard_col] if shard_col else [F.lit(0)]
    w = (
        Window.partitionBy(*part)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(token_col).over(w) - F.col(token_col)
    out = df.withColumn("bin", F.floor(start / F.lit(budget)))
    if shard_col:
        out = out.withColumn(
            "bin", F.concat_ws("#", F.col(shard_col), F.col("bin"))
        )
    return out


def stratified_fixed_n(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    n: int,
    portable: bool = False,
    n_salt: int = 64,
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample ("take 1000 docs per
    language"): rank rows inside each stratum by (hash bucket, key) and
    keep the first n — a uniform, reproducible, order-free draw.

    Scale shape: a naive window over the stratum puts an entire stratum
    (billions of rows for 'en') in one partition. This uses the exact
    two-phase top-n instead: rank within (stratum, salt) keeping n per
    salt — the stratum's true top-n is always contained in that union —
    then re-rank the <= n*n_salt survivors per stratum. The first pass
    spreads each stratum over ``n_salt`` partitions; the second touches
    only n*n_salt rows per stratum.
    """
    bucket = (portable_bucket if portable else hash_bucket)(F.col(key_col))
    d = df.withColumn("_b", bucket)
    salt = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_salt))
    w1 = Window.partitionBy(F.col(strata_col), salt).orderBy("_b", key_col)
    cand = d.withColumn("_rn", F.row_number().over(w1)).filter(
        F.col("_rn") <= n
    )
    w2 = Window.partitionBy(strata_col).orderBy("_b", key_col)
    return (
        cand.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= n)
        .drop("_b", "_rn")
    )


def mixture_rates(
    counts: dict[str, int],
    temperature: float = 1.0,
    target_total: int | None = None,
) -> dict[str, float]:
    """Per-stratum keep-rates implementing exponentiated-smoothing corpus
    rebalancing (the multilingual-LM mixture rule): sample stratum i with
    probability p_i ∝ n_i^(1/T). T=1 keeps natural proportions; T→∞
    approaches uniform over strata (boosting low-resource strata).

    ``counts`` are stratum sizes (docs or tokens); ``target_total`` is the
    corpus budget after sampling (defaults to the full corpus size). The
    returned rates feed :func:`stratified_sample` directly — driver-side
    arithmetic over a handful of strata, nothing distributed.

    Rates are capped at 1.0 (hash sampling never upsamples); when a
    low-resource stratum hits the cap, the shortfall is NOT redistributed
    — callers wanting exact budgets should iterate or accept the deficit.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    alpha = 1.0 / temperature
    weights = {k: float(v) ** alpha for k, v in counts.items() if v > 0}
    wsum = sum(weights.values())
    total = sum(counts.values()) if target_total is None else target_total
    return {
        k: min(1.0, (weights[k] / wsum) * total / counts[k])
        for k in weights
    }


def _portable_uniform(key: Column) -> Column:
    """Deterministic uniform in (0, 1): first 8 md5 hex digits scaled by
    2^-32, shifted half a ulp so 0 is excluded (log-safe). Engine-portable
    arithmetic (same expression text runs in DuckDB)."""
    h = F.md5(key.cast("string"))
    v = _hex_digit(h, 1).cast("long")  # 8 digits exceed int32 — stay long
    for j in range(2, 9):
        v = v * 16 + _hex_digit(h, j)
    return (v.cast("double") + 0.5) / float(1 << 32)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int = 100,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis-Spirakis A-ES scheme — per row draw u = uniform(key) and
    keep the k smallest ``-ln(u) / w`` (equivalently the k largest
    u^(1/w)); inclusion probability is proportional to weight, with no
    sequential pass and no replacement bookkeeping.

    The uniform comes from the row key's md5 (portable + reproducible
    across runs/retries — a retried task redraws identical keys). Rows
    with non-positive weight are excluded. Top-k is a
    TakeOrderedAndProject: map-side partial top-k per partition, k rows
    to the final reduce — no global sort at 100 TB.
    """
    u = _portable_uniform(F.col(key_col))
    es_key = -F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("es_key", es_key)
        .orderBy(F.asc("es_key"), F.asc(key_col))
        .limit(k)
    )


def weighted_sample_es_key_sql(weight_sql: str, key_sql: str) -> str:
    """DuckDB twin of the A-ES key: -ln(uniform(key)) / weight with the
    same md5-hex uniform arithmetic."""
    digit = (
        "(CASE WHEN ascii(substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) >= 97 "
        "THEN ascii(substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) - 87 "
        "ELSE ascii(substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) - 48 END)"
    )
    v = f"CAST({digit.format(k=key_sql, j=1)} AS BIGINT)"
    for j in range(2, 9):
        v = f"({v} * 16 + {digit.format(k=key_sql, j=j)})"
    u = f"((CAST({v} AS DOUBLE) + 0.5e0) / {float(1 << 32):.1f})"
    return f"(-ln({u}) / ({weight_sql}))"


def portable_uniform(key: Column) -> Column:
    """Public alias of the deterministic md5 uniform in (0, 1) — the
    building block for engine-portable Monte Carlo (same arithmetic as
    :func:`portable_uniform_sql`)."""
    return _portable_uniform(key)


def portable_uniform_sql(key_sql: str) -> str:
    """DuckDB-SQL twin of :func:`portable_uniform`: first 8 md5 hex
    digits (BIGINT accumulation) scaled by 2^-32, half-ulp shifted."""
    digit = (
        "(CASE WHEN ascii(substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) >= 97 "
        "THEN ascii(substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) - 87 "
        "ELSE ascii(substring(md5(CAST({k} AS VARCHAR)), {j}, 1)) - 48 END)"
    )
    v = f"CAST({digit.format(k=key_sql, j=1)} AS BIGINT)"
    for j in range(2, 9):
        v = f"({v} * 16 + {digit.format(k=key_sql, j=j)})"
    return f"((CAST({v} AS DOUBLE) + 0.5e0) / {float(1 << 32):.1f})"


# ------------------------------------------------- DSIR (Xie et al. 2023)
#
# Data Selection via Importance Resampling: score every raw document by
# the log-likelihood ratio of a TARGET-domain hashed-n-gram bag-of-words
# model over the RAW-corpus model, then sample k documents with
# probability proportional to the importance weight (Gumbel top-k — the
# log-space form of the Efraimidis-Spirakis scheme weighted_sample
# already uses). Public technique; the reference engine has no
# counterpart (pure beyond-reference LLM-pipeline operator).


def _dsir_grams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Word unigram + bigram multiset per document — the same feature
    space as the hashed quality classifier (operators/text.py
    hashed_ngram_score), so the two share oracle-verified gram SQL."""
    from build_a_market_data_etl_strategy_backtesting_engine_spark.operators.text import (  # noqa: E501
        _word_grams,
    )

    grams = F.concat(_word_grams(text_col, 1), _word_grams(text_col, 2))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("gram"))


def dsir_bucket_logratios(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-point hashed-n-gram log-likelihood-ratio table
    ``(bucket, tc, rc, lr_x1e6)``: per md5 bucket, the Laplace-smoothed
    target-vs-raw log ratio

        lr = (ln(tc+1) - ln(t_tot+B)) - (ln(rc+1) - ln(r_tot+B))

    scaled by 1e6 and rounded to BIGINT. The fixed-point representation
    is the q112 lesson applied forward: per-document weights are then
    EXACT integer sums (order-free, engine-exact); floats are derived
    from the integers at the edge only.

    Scale shape: two map-side gram explosions -> two map-combinable
    bucket aggs (B rows each) -> one B-row join. B <= 65536 (the
    portable bucket space); the result broadcasts everywhere it's used.
    """
    spark = raw.sparkSession
    tg = _dsir_grams(target, text_col, id_col)
    rg = _dsir_grams(raw, text_col, id_col)

    def counts(g, name):
        return (g.select(portable_bucket(F.col("gram"),
                                         n_buckets).alias("bucket"))
                .groupBy("bucket").agg(F.count(F.lit(1)).alias(name)))

    dom = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"))
    j = (
        dom.join(counts(tg, "tc"), "bucket", "left")
        .join(counts(rg, "rc"), "bucket", "left")
        .crossJoin(F.broadcast(tg.agg(
            F.count(F.lit(1)).alias("t_tot"))))
        .crossJoin(F.broadcast(rg.agg(
            F.count(F.lit(1)).alias("r_tot"))))
        .select(
            "bucket",
            F.coalesce("tc", F.lit(0)).alias("tc"),
            F.coalesce("rc", F.lit(0)).alias("rc"),
            "t_tot", "r_tot",
        )
    )
    lr = (
        (F.log(F.col("tc") + 1) - F.log(F.col("t_tot") + n_buckets))
        - (F.log(F.col("rc") + 1) - F.log(F.col("r_tot") + n_buckets))
    )
    return j.select(
        "bucket", "tc", "rc",
        F.round(lr * F.lit(1000000.0), 0).cast("long").alias("lr_x1e6"),
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-raw-document DSIR importance weight: the sum of the bucket
    log ratios over the document's gram multiset (the document's
    log-likelihood ratio under the two hashed models). Emits
    ``(doc_id, n_grams, lr_sum_x1e6, logw)`` — the sum is an exact
    BIGINT (order-free across engines); ``logw`` = lr_sum/1e6 rounded
    at the edge.

    Scale shape: gram explode is map-side; the ratio table
    (``n_buckets`` rows) broadcast-joins onto the stream; one
    map-combinable per-doc agg. No Python, no skew (md5 buckets are
    uniform)."""
    lrs = dsir_bucket_logratios(raw, target, n_buckets,
                                text_col=text_col, id_col=id_col)
    per = _dsir_grams(raw, text_col, id_col).select(
        "doc_id",
        portable_bucket(F.col("gram"), n_buckets).alias("bucket"))
    return (
        per.join(F.broadcast(lrs.select("bucket", "lr_x1e6")), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum("lr_x1e6").alias("lr_sum_x1e6"))
        .withColumn("logw",
                    F.round(F.col("lr_sum_x1e6") / F.lit(1000000.0), 6))
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int = 100,
    n_buckets: int = 1024,
    seed: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR selection: k raw documents sampled without replacement with
    probability proportional to exp(importance weight) — Gumbel top-k
    (key = logw + Gumbel(0,1)), the log-space equivalent of the A-ES
    exponential-race key, immune to exp() underflow on very negative
    weights. The Gumbel noise derives from md5(doc_id:seed), so the
    draw is deterministic, retry-stable, and oracle-replayable.

    Top-k is a TakeOrderedAndProject (map-side partial top-k, k rows to
    one reduce) — no global sort at 100 TB."""
    w = dsir_importance_weights(raw, target, n_buckets,
                                text_col=text_col, id_col=id_col)
    u = _portable_uniform(
        F.concat(F.col("doc_id").cast("string"), F.lit(f":{seed}")))
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col("lr_sum_x1e6") / F.lit(1000000.0) + gumbel, 6)
    return (
        w.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
        .limit(k)
    )
