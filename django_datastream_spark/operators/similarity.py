"""Similarity search over embedding columns (extension surface).

- ``cosine_topk``      — brute-force top-k: broadcast the (small) query set
                         against the corpus, rank per query. The baseline
                         and the rerank step of the scale path.
- ``rp_lsh_topk``      — random-hyperplane LSH: bucket corpus + queries by
                         sign-bit signatures (with multi-probe via band
                         split), then exact rerank inside buckets. The
                         100 TB path: candidate generation is an equi-join
                         on bucket keys, never a cross join.

Vectors are cast to float64 and reduced with sequential folds so results
are deterministic and oracle-reproducible.
"""

from __future__ import annotations

import math
import random

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force).

    Returns (query_id, rank, neighbor_id, cosine). Ties break on lower
    neighbor id. The query side is broadcast — suitable for query sets
    up to ~10^5 rows; beyond that use rp_lsh_topk.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_qn", F.sqrt(_dot(F.col("_qv"), F.col("_qv"))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("_cn", F.sqrt(_dot(F.col("_cv"), F.col("_cv"))))
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def rp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of a vector against fixed hyperplanes → BIGINT.

    Reference expression form (pure Catalyst). NOTE: n_planes folded dot
    products generate ~1.5 ms/row of codegen — use ``rp_signature_udf``
    (Arrow + BLAS matrix multiply, ~100× faster) in any real plan; this
    stays as the semantics oracle for tests."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(x) for x in p]))
        sig = sig.bitwiseOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def rp_signature_udf(planes: list[list[float]]):
    """Vectorized signature: one BLAS matmul per Arrow batch.

    The plane matrix is captured by value in the closure (no module
    references — safe on executors without this package on PYTHONPATH)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64)
    assert P.shape[0] <= 63, "signature must fit in a signed 64-bit value"

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        bits = (X @ P.T) >= 0  # (n, n_planes)
        out = np.zeros(len(X), dtype=np.int64)
        for i in range(P.shape[0]):
            out |= bits[:, i].astype(np.int64) << i
        return pd.Series(out)

    return sig


#: fitted-model cache — a real deployment persists the IVF index next to
#: the corpus instead of refitting per query batch
_IVF_CACHE: dict[tuple, object] = {}


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    KMeans cells, probe the ``n_probe`` nearest cells per query, exact-
    rerank inside them.

    The 100 TB shape: the corpus is clustered once (train on a sample),
    assignments are a narrow (id, cell) table co-partitioned with the
    vectors, and each query touches n_probe/n_cells of the data via an
    equi-join on cell id — no cross join anywhere. Returns
    (query_id, rank, neighbor_id, cosine)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    ml_df = c.select("neighbor_id", array_to_vector("_cv").alias("features"))
    ck = (cache_key, n_cells, seed) if cache_key else None
    model = _IVF_CACHE.get(ck) if ck else None
    if model is None:
        model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(ml_df)
        if ck:
            _IVF_CACHE[ck] = model
    assigned = model.transform(ml_df).select(
        "neighbor_id", F.col("prediction").alias("cell")
    )
    corpus_cells = c.join(assigned, "neighbor_id")

    centroids = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(centroids, "cell int, centroid array<double>")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    # nearest n_probe cells per query: tiny centroid dim is broadcast
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("_qv"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    wq = Window.partitionBy("query_id").orderBy(dist.asc(), F.col("cell").asc())
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "_qv", "cell")
    )

    cand = probes.join(corpus_cells, "cell")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    qn = F.sqrt(_dot(F.col("_qv"), F.col("_qv")))
    cn = F.sqrt(_dot(F.col("_cv"), F.col("_cv")))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("_qv"), F.col("_cv")) / (qn * cn)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine"
        )
    )


def rp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: block on hyperplane-signature bands (a query and
    candidate collide if they agree on ALL bits of ≥1 band), exact-rerank
    within the candidate set. Recall grows with bands; cost is bounded by
    bucket sizes. Returns (query_id, rank, neighbor_id, cosine)."""
    assert n_planes % bands == 0
    rows = n_planes // bands
    planes = _hyperplanes(dim, n_planes, seed)

    sig_udf = rp_signature_udf(planes)

    def with_bands(df: DataFrame, role: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        sig = sig_udf(v)
        band_arr = F.array(
            *[
                F.shiftright(sig, b * rows)
                .bitwiseAND(F.lit((1 << rows) - 1))
                .cast("long")
                for b in range(bands)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            v.alias(f"_{role}v"),
            F.posexplode(band_arr).alias("band", "key"),
        )

    qb = with_bands(queries, "query")
    cb = with_bands(corpus, "neighbor")
    cand = (
        qb.join(cb, ["band", "key"])
        .select("query_id", "neighbor_id", "_queryv", "_neighborv")
        .distinct()
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    qn = F.sqrt(_dot(F.col("_queryv"), F.col("_queryv")))
    cn = F.sqrt(_dot(F.col("_neighborv"), F.col("_neighborv")))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("_queryv"), F.col("_neighborv")) / (qn * cn)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", "cosine")
    )
