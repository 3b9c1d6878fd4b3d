"""K-means clustering and SemDeDup-style semantic dedup over embedding
columns (extension surface; reference has no clustering — SURVEY §2.10).

Design constraints, in order:

1. **Fully declarative.** Centroids are a DataFrame at every step, never
   a driver-side list: assignment is a broadcast cross-join (k rows)
   followed by a per-vector window argmin, and the centroid update is a
   per-dimension average. Building the plan therefore launches ZERO
   Spark jobs (the registry-wide invariant pinned by tests/test_plans),
   and a Lloyd iteration adds one broadcast + one hash-agg exchange to
   the plan — no collect, no loop over the driver.
2. **Oracle-exact.** Every reduction runs in float64 in array order
   (``F.aggregate`` sequential fold), and updated centroids are rounded
   to 6 decimals, so an unrolled DuckDB replay of the same iterations
   reproduces assignments bit-for-bit (distances over identical rounded
   centroids and identical float32 inputs are deterministic on both
   engines).
3. **100 TB shape.** Per iteration: corpus is scanned once, the cross
   join fans out k small rows to every vector partition (k ≤ a few
   thousand — the broadcast is k×dim doubles), the argmin is a window
   over ``id`` (map-side-combinable via the two-pass agg form is not
   needed: the partition key is the vector id, so no skew), and the
   update is one hash aggregate producing k rows. Iterations are a
   plan-depth constant chosen by the caller; for production-scale k-means
   use a sampled fit (see operators/similarity.ivf_fit) and this module
   for the exact, auditable small-k path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def suggested_k(n_vectors: int, target_cluster_size: int | None = None) -> int:
    """Cluster-count calibration for ``kmeans_assign``/``semdedup``.

    CONTRACT: SemDeDup's within-cluster pair join is O(Σ cluster²) ≈
    N²/k for balanced clusters, so **k must grow with the corpus** — a
    fixed small k silently reverts toward all-pairs at scale. Default
    k = ⌈√N⌉ keeps candidate pairs ≈ N^1.5 (the growth law pinned by
    tests/test_clustering.py between sf0.01 and sf0.1); pass
    ``target_cluster_size`` to hold expected cluster size constant
    instead (k = ⌈N/size⌉ ⇒ pairs ≈ N·size, fully linear — the
    SemDeDup paper's shape: tens of thousands of clusters at
    hundreds-of-millions scale)."""
    if n_vectors <= 0:
        return 1
    if target_cluster_size is not None:
        if target_cluster_size <= 0:
            raise ValueError("target_cluster_size must be positive")
        return max(1, math.ceil(n_vectors / target_cluster_size))
    return max(2, math.ceil(math.sqrt(n_vectors)))


def _sq_dist(a: Column, b: Column) -> Column:
    """Σ (a_i − b_i)² in float64, sequential fold in array order."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def initial_centroids(
    vecs: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic init: the k vectors with the smallest ids, with
    cluster id = rank in that order. A window rank (not ``limit`` on a
    sort) keeps the result stable under any partitioning; the input to
    the rank is k rows per partition at most after the pushed
    ``orderBy``-free min-k — Spark evaluates this as a windowed rank
    over the (tiny after filter) id domain, and at 100 TB one would
    seed from a sample instead; determinism is the contract here."""
    w = Window.orderBy(id_col)
    return (
        vecs.select(id_col, vec_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            (F.col("_rk") - 1).cast("long").alias("cid"),
            F.col(vec_col).alias("centroid"),
        )
    )


def assign(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_dist: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment; ties break to the lowest cid.
    centroids: (cid, centroid). Returns (id, vec, cid[, d2 — the
    squared distance to the winning centroid, if requested]).

    The argmin is ``min_by`` over a lexicographic (d2, cid) struct —
    an ordinary aggregate, so the cross-join fan-out is combined
    map-side (k candidate rows per vector collapse before the
    exchange) and there is no per-id window sort. Lexicographic
    struct comparison gives the lowest-cid tie-break for free."""
    d = (
        vecs.crossJoin(F.broadcast(centroids))
        .withColumn("d2", _sq_dist(F.col(vec_col), F.col("centroid")))
    )
    out = (
        d.groupBy(id_col)
        .agg(
            F.min_by(
                F.struct("cid", vec_col, "d2"), F.struct("d2", "cid")
            ).alias("_w")
        )
        .select(
            id_col,
            F.col("_w.cid").alias("cid"),
            F.col(f"_w.{vec_col}").alias(vec_col),
            F.col("_w.d2").alias("d2"),
        )
    )
    return out if keep_dist else out.drop("d2")


def update_centroids(
    assigned: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension mean of each cluster's members, rounded to 6
    decimals (the cross-engine determinism anchor: float64 averages
    agree across partial-agg orders far below 1e-6). One hash
    aggregate; output is k rows."""
    # r11: one parsed expression — the per-dimension Column form cost
    # ~4 py4j round trips x dim per plan build (and kmeans builds this
    # once per Lloyd iteration)
    cols = ", ".join(
        f"round(avg(cast({vec_col}[{i}] as double)), 6)" for i in range(dim)
    )
    return assigned.groupBy("cid").agg(
        F.expr(f"array({cols}) AS centroid")
    )


def kmeans_assign(
    vecs: DataFrame,
    k: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's algorithm, declaratively unrolled: ``iters`` rounds of
    assign+update starting from the k lowest-id vectors, then a final
    assignment under the last centroids. Returns vecs + ``cid``.

    ``k`` is a scale parameter, not a constant: size it with
    ``suggested_k(N)`` (k ∝ √N, or N/target_cluster_size) when the
    assignment feeds ``semdedup`` — see that contract for why."""
    cent = initial_centroids(vecs, k, id_col, vec_col)
    for _ in range(iters):
        cent = update_centroids(
            assign(vecs, cent, id_col, vec_col), dim, vec_col
        )
    return assign(vecs, cent, id_col, vec_col, keep_dist=True)


def semdedup(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) shape: within each cluster, mark as
    duplicate every vector that has a higher-similarity twin with a
    LOWER id (keep-first). Pair generation is an equi-join on ``cid``
    — the whole point of clustering first: candidate pairs are
    O(Σ cluster²), never corpus². That bound only holds if the
    upstream k GREW with the corpus (``suggested_k``): with k fixed,
    Σ cluster² → N² and this join IS all-pairs. Returns
    (id, cid, is_dup)."""
    # norms are computed ONCE per vector before the self-join — an
    # in-pair norm would run 3 array folds per candidate pair instead
    # of 1, tripling the O(cluster²) dominant cost
    nrm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    with_nrm = assigned.withColumn("_nrm", nrm)
    a = with_nrm.select(
        F.col("cid"),
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    b = with_nrm.select(
        F.col("cid"),
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("_va"), F.col("_vb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, on="cid")
        .filter(F.col("_ida") < F.col("_idb"))
        .withColumn("_cos", dot / (F.col("_na") * F.col("_nb")))
        .filter(F.col("_cos") >= threshold)
        .select("_idb")
        .distinct()
    )
    return assigned.select(id_col, "cid").join(
        pairs, assigned[id_col] == pairs["_idb"], "left"
    ).select(
        id_col,
        "cid",
        F.col("_idb").isNotNull().alias("is_dup"),
    )
