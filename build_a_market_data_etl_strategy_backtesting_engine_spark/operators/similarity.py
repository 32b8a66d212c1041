"""Similarity search over embedding columns: brute-force cosine top-k and an
IVF-style partitioned variant for scale.

Beyond-reference operators (SURVEY §7.6). The brute-force path is the exact
baseline (and the oracle-verified one); the IVF path trades recall for a
pruned scan — at 100TB the centroid assignment becomes the partition key so
a query touches only its probe cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector: one scan, JVM-side
    fold for the dot product, TakeOrderedAndProject for the top-k (no full
    sort materialization)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    sims = embeddings.select(
        F.col(id_col), cosine(v, q).alias("cosine")
    )
    return sims.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def all_pairs_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors for EVERY query row: broadcast the (small) query set,
    score all pairs, rank per query. For large query sets, pre-bucket both
    sides with sign-LSH (dedup.embedding_near_dups idiom) instead."""
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        _as_double(F.col(query_vec_col)).alias("qv"),
    )
    e = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    scored = e.crossJoin(F.broadcast(q)).select(
        "qid", id_col, cosine(F.col("v"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    iterations: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Deterministic Lloyd iterations for IVF coarse quantization, all in
    DataFrame ops: assign = argmin distance to broadcast centroids (literal
    arrays), update = groupBy(cell).avg per dimension via posexplode.

    Returns a list[list[float]] of centroids (k is small — driver-side)."""
    import numpy as np

    dim = embeddings.select(F.size(vec_col).alias("d")).first()["d"]
    # seed centroids from a deterministic sample
    sample = (
        embeddings.select(_as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.xxhash64(F.col(vec_col).cast("string"), F.lit(seed)))
        .limit(n_cells)
        .collect()
    )
    cents = np.array([r["v"] for r in sample])
    df = embeddings.select(_as_double(F.col(vec_col)).alias("v"))
    for _ in range(iterations):
        assigned = df.withColumn("cell", _assign_cell(F.col("v"), cents))
        upd = (
            assigned.select("cell", F.posexplode("v").alias("i", "x"))
            .groupBy("cell", "i").agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("ms"))
            .select("cell", F.transform("ms", lambda s: s["m"]).alias("centroid"))
            .collect()
        )
        for r in upd:
            cents[r["cell"]] = np.array(r["centroid"])
    return cents.tolist()


def _assign_cell(v: Column, centroids) -> Column:
    """argmin_i ||v - c_i||^2 as a greatest-of-structs expression."""
    scores = []
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(v, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        scores.append(F.struct((-d2).alias("nd"), F.lit(i).alias("cell")))
    return F.greatest(*scores)["cell"]


def ivf_index(
    embeddings: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid cell. Persist this
    partitioned by ``cell`` so queries prune to their probe cells."""
    v = _as_double(F.col(vec_col))
    return embeddings.select(
        F.col(id_col), F.col(vec_col), _assign_cell(v, centroids).alias("cell")
    )


def ivf_topk(
    index: DataFrame,
    centroids,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF query: rank cells by centroid distance (driver-side, k cells are
    tiny), scan only the n_probe nearest cells, exact cosine within them.
    The cell filter prunes partitions when the index is stored
    partitionBy(cell)."""
    import numpy as np

    q = np.array(query_vec, dtype=float)
    dists = [float(((np.array(c) - q) ** 2).sum()) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: dists[i])[:n_probe]
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    return (
        index.filter(F.col("cell").isin(probe))
        .select(F.col(id_col), cosine(v, qarr).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def quantize_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector int quantization for embedding storage.

    scale = max(|x|) / (2^(bits-1) - 1); q_i = round(x_i / scale) — the
    standard absmax scheme that cuts a float32 embedding store 4x (int8)
    before ANN indexing. Emits the quantized array, its scale, and the
    max absolute reconstruction error so a pipeline can gate on quality.

    Pure higher-order array expressions (transform/aggregate) — map-side,
    zero shuffle, survives a 100 TB embedding table by construction.
    Zero vectors keep scale=0 and quantize to all-zero with zero error.
    """
    qmax = float(2 ** (bits - 1) - 1)
    v = _as_double(F.col(vec_col))
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(qmax)
    q = F.when(
        F.col("q_scale") > 0,
        F.transform(v, lambda x: F.round(x / F.col("q_scale")).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    err = F.when(
        F.col("q_scale") > 0,
        F.array_max(
            F.zip_with(
                v, F.col("q_vec"),
                lambda x, qi: F.abs(x - qi.cast("double") * F.col("q_scale")),
            )
        ),
    ).otherwise(F.lit(0.0))
    return (
        embeddings.withColumn("q_scale", scale)
        .withColumn("q_vec", q)
        .withColumn("max_abs_err", err)
        .select(id_col, "q_scale", "q_vec", "max_abs_err")
    )
