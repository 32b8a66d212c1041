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
from pyspark.sql import types as T


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
    # squared norms are per-SIDE quantities: hoist them before the
    # cross join so each of the |E|x|Q| scored rows evaluates one array
    # aggregate (the dot) instead of three. The pair expression stays
    # dot / sqrt(aa * bb) — the cosine() helper's exact float sequence
    # (sqrt of the PRODUCT, not a product of sqrts), so results are
    # bit-identical to the unhoisted form.
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        _as_double(F.col(query_vec_col)).alias("qv"),
    ).withColumn("qn2", _dot(F.col("qv"), F.col("qv")))
    e = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("vn2", _dot(F.col("v"), F.col("v")))
    scored = e.crossJoin(F.broadcast(q)).select(
        "qid", id_col,
        (_dot(F.col("v"), F.col("qv"))
         / F.sqrt(F.col("vn2") * F.col("qn2"))).alias("cosine"),
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


def _nearest_struct(v: Column, centroids) -> Column:
    """``struct(nd, cell)`` of the nearest centroid: ``nd`` is the NEGATED
    squared euclidean distance so ``greatest`` picks min-distance (ties
    break to the larger cell index — mirrored by the oracle's
    ``ORDER BY d2 ASC, cell DESC`` rank)."""
    scores = []
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d2 = F.aggregate(
            F.zip_with(v, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        scores.append(F.struct((-d2).alias("nd"), F.lit(i).alias("cell")))
    return F.greatest(*scores)


def _assign_cell(v: Column, centroids) -> Column:
    """argmin_i ||v - c_i||^2 as a greatest-of-structs expression."""
    return _nearest_struct(v, centroids)["cell"]


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Cross-engine-deterministic Lloyd's: seeds are the ``k`` lowest-id
    vectors (no hash dependence, so a SQL oracle can replay the exact same
    iterations), update loop identical to :func:`kmeans_centroids`.

    Shape at 100 TB: per iteration one map-side argmin over broadcast
    literal centroids (k*dim floats — KBs) + one map-combinable
    ``groupBy(cell, dim).avg`` — k*dim rows to the driver per round,
    never the vectors. Returns ``list[list[float]]`` centroids."""
    sample = (
        embeddings.select(F.col(id_col).alias("_id"),
                          _as_double(F.col(vec_col)).alias("v"))
        .orderBy("_id").limit(k).collect()
    )
    cents = [list(r["v"]) for r in sample]
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
        for r in upd:  # cells with no members keep their previous centroid
            cents[r["cell"]] = list(r["centroid"])
    return cents


def assign_clusters(
    embeddings: DataFrame,
    centroids,
    vec_col: str = "embedding",
) -> DataFrame:
    """All input columns + ``cell`` (nearest centroid) + ``d2`` (squared
    euclidean distance to it). Map-side only — centroids ride the plan as
    literals, so this costs zero shuffles and partition-prunes when the
    output is stored ``partitionBy(cell)``."""
    near = _nearest_struct(_as_double(F.col(vec_col)), centroids)
    return embeddings.select(
        "*", near["cell"].alias("cell"), (-near["nd"]).alias("d2")
    )


def mmr_select(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 8,
    lam: float = 0.7,
    pool: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    1998): greedily pick ``argmax lam*rel(c) - (1-lam)*max_sim(c, selected)``
    from the ``pool`` most query-relevant candidates — the standard
    diversity-aware selection for retrieval / training-data curation.

    The greedy loop is inherently sequential in k; each of the k steps is
    one distributed argmax over the pooled candidates with the selected
    vectors as broadcast literals (k*dim floats). Only the single winning
    row crosses to the driver per step — the k-sized driver boundary, same
    sanction as the portfolio solvers. Returns (rank, id, rel, mmr).
    """
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    rel = (
        embeddings.select(F.col(id_col).alias("_id"), v.alias("v"),
                          cosine(v, qarr).alias("rel"))
    )
    # TakeOrderedAndProject, not a global-window row_number: the pool cut
    # is a distributed top-k, never a single-partition sort
    pooled = (
        rel.orderBy(F.col("rel").desc(), F.col("_id")).limit(pool)
        .cache()
    )
    chosen: list[tuple] = []
    sel_vecs: list[list[float]] = []
    for rank in range(1, k + 1):
        if not sel_vecs:
            score = F.col("rel")
        else:
            sims = [cosine(F.col("v"),
                           F.array(*[F.lit(float(x)) for x in s]))
                    for s in sel_vecs]
            maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
            score = F.lit(float(lam)) * F.col("rel") \
                - F.lit(1.0 - float(lam)) * maxsim
        cand = pooled
        if chosen:
            cand = cand.filter(~F.col("_id").isin([c[1] for c in chosen]))
        row = (
            cand.select("_id", "v", "rel", score.alias("mmr"))
            .orderBy(F.col("mmr").desc(), F.col("_id"))
            .limit(1).collect()
        )
        if not row:
            break
        r = row[0]
        chosen.append((rank, r["_id"], float(r["rel"]), float(r["mmr"])))
        sel_vecs.append(list(r["v"]))
    pooled.unpersist()
    spark = embeddings.sparkSession
    # id type follows the input column (string doc ids work, not just
    # bigint) — the output schema is derived, not hardcoded
    id_type = embeddings.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("rank", T.IntegerType(), False),
        T.StructField(id_col, id_type, True),
        T.StructField("rel", T.DoubleType(), True),
        T.StructField("mmr", T.DoubleType(), True),
    ])
    return spark.createDataFrame(chosen, schema=out_schema)


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
    tie_decimals: int | None = None,
) -> DataFrame:
    """IVF query: rank cells by centroid distance (driver-side, k cells are
    tiny), scan only the n_probe nearest cells, exact cosine within them.
    The cell filter prunes partitions when the index is stored
    partitionBy(cell).

    ``tie_decimals``: cut the top-k on ``(round(cosine, d), id)`` instead
    of the raw float — the deterministic total order for corpora with
    cosine-tie plateaus (scaled duplicates of one vector cosine-tie at
    1.0 up to float noise, and a raw-float cut keeps an engine-dependent
    subset once the plateau outgrows k — the 1000x sweep caught exactly
    that). The emitted ``cosine`` stays exact."""
    import numpy as np

    q = np.array(query_vec, dtype=float)
    dists = [float(((np.array(c) - q) ** 2).sum()) for c in centroids]
    probe = sorted(range(len(centroids)), key=lambda i: dists[i])[:n_probe]
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    scored = (
        index.filter(F.col("cell").isin(probe))
        .select(F.col(id_col), cosine(v, qarr).alias("cosine"))
    )
    rank = (F.round(F.col("cosine"), tie_decimals)
            if tie_decimals is not None else F.col("cosine"))
    return scored.orderBy(rank.desc(), F.col(id_col)).limit(k)


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


# ------------------------------------------------- product quantization

def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iterations: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train a product-quantization codebook: split each vector into ``m``
    contiguous subvectors and run deterministic k-means (``k`` codes) in
    each subspace. Returns ``codebook[sub][code] -> subvector centroid``
    (driver-side: m*k*(d/m) floats — a few KB).

    PQ compresses an embedding to ``m`` small codes (m bytes at k<=256) —
    the memory side of billion-scale ANN (Jegou et al. 2011); IVF
    (``ivf_index``) is the pruning side. Training cost: m small k-means
    runs over subvector projections, each a slice() map + the shared
    kmeans shuffle shape.
    """
    dim = embeddings.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    codebook = []
    for s in range(m):
        proj = embeddings.select(
            F.slice(_as_double(F.col(vec_col)), s * sub + 1, sub)
            .alias("embedding")
        )
        codebook.append(
            kmeans_centroids(
                proj, n_cells=k, iterations=iterations, seed=seed + s
            )
        )
    return codebook


def _sub_code(v: Column, sub_cents, offset: int, sub: int) -> Column:
    """Argmin code for one subspace against literal centroids.

    Built as ``array_position(dists, array_min(dists))`` so the expression
    stays LINEAR in k — a chained when(d < best_dist) would nest the
    running-best subtree inside every branch and blow up exponentially.
    Ties resolve to the lowest code (first position)."""
    piece = F.slice(v, offset + 1, sub)
    dists = F.array(*[
        F.aggregate(
            F.zip_with(
                piece,
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        for cent in sub_cents
    ])
    return (
        F.array_position(dists, F.array_min(dists)) - 1
    ).cast("int")


def pq_encode(
    embeddings: DataFrame,
    codebook: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes (``array<int>`` of length m): per
    subspace, the argmin-distance code against the literal codebook.
    Map-side only — zero shuffles; at 256 codes the array packs to m
    bytes in parquet."""
    m = len(codebook)
    sub = len(codebook[0][0])
    v = _as_double(F.col(vec_col))
    codes = F.array(*[
        _sub_code(v, codebook[s], s * sub, sub) for s in range(m)
    ])
    return embeddings.withColumn("pq_code", codes)


def pq_topk(
    encoded: DataFrame,
    query_vec,
    codebook: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays exact; each
    subspace contributes a table lookup ``dist(query_sub, codebook[s][c])``
    and distances sum across subspaces. The per-subspace lookup tables are
    literal CASE maps (m*k floats), so scoring is pure codegen over the
    m-byte codes — no float vectors are read at query time.
    """
    import math as _m

    m = len(codebook)
    sub = len(codebook[0][0])
    total = None
    for s in range(m):
        qs = query_vec[s * sub:(s + 1) * sub]
        table = [
            sum((qs[i] - cent[i]) ** 2 for i in range(sub))
            for cent in codebook[s]
        ]
        code = F.element_at("pq_code", s + 1)
        lut = F.array(*[F.lit(float(dv)) for dv in table])
        expr = F.element_at(lut, code + 1)
        total = expr if total is None else total + expr
    return (
        encoded.select(id_col, total.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )
