"""K-means + SemDeDup operator tests (operators/clustering.py).

Behavioral pins that the DuckDB oracle (q108/q109) can't express:
planted-structure recovery, the lowest-cid tie-break, keep-first
dup marking, and the zero-jobs-at-build invariant for the iterative
plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from django_datastream_spark.operators import clustering as cl

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], SCHEMA
    )


def test_kmeans_recovers_planted_clusters(spark):
    # two tight blobs far apart; init = 2 lowest ids, one in each blob
    rows = [
        (0, [0.0, 0.0]), (2, [0.1, 0.0]), (4, [0.0, 0.1]),
        (1, [10.0, 10.0]), (3, [10.1, 10.0]), (5, [10.0, 10.1]),
    ]
    out = cl.kmeans_assign(_df(spark, rows), k=2, iters=2, dim=2)
    got = {r["vec_id"]: r["cid"] for r in out.collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}


def test_assign_tie_breaks_to_lowest_cid(spark):
    vecs = _df(spark, [(7, [5.0, 0.0])])
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 0.0])],
        StructType(
            [
                StructField("cid", LongType()),
                StructField("centroid", ArrayType(FloatType())),
            ]
        ),
    )
    got = cl.assign(vecs, cent).collect()
    assert len(got) == 1 and got[0]["cid"] == 0


@pytest.mark.slow
def test_semdedup_marks_keep_first(spark):
    # 0 and 3 identical (cos=1), 1 near-dup of 0, 2 orthogonal
    rows = [
        (0, [1.0, 0.0]), (1, [0.999, 0.01]),
        (2, [0.0, 1.0]), (3, [1.0, 0.0]),
    ]
    assigned = cl.kmeans_assign(_df(spark, rows), k=1, iters=1, dim=2)
    got = {
        r["vec_id"]: r["is_dup"]
        for r in cl.semdedup(assigned, threshold=0.99).collect()
    }
    # lowest id of each dup group survives; orthogonal vec untouched
    assert got == {0: False, 1: True, 2: False, 3: True}


@pytest.mark.slow
def test_kmeans_build_launches_no_jobs(spark):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    vecs = _df(spark, [(i, [float(i), 0.0]) for i in range(6)])
    df = cl.kmeans_assign(vecs, k=2, iters=2, dim=2)
    _ = df.columns  # forces analysis, not execution
    after = tracker.getJobIdsForGroup(None)
    assert before == after


def test_update_centroids_rounds_to_6(spark):
    rows = [(0, [0.1234567, 1.0]), (1, [0.1234569, 1.0])]
    assigned = _df(spark, rows).withColumn("cid", F.lit(0))
    [(cid, cent)] = [
        (r["cid"], r["centroid"])
        for r in cl.update_centroids(assigned, dim=2).collect()
    ]
    assert cid == 0
    assert abs(cent[0] - round((0.1234567 + 0.1234569) / 2, 6)) < 1e-12
    assert cent[1] == 1.0


@pytest.mark.slow
def test_suggested_k_keeps_pair_growth_subquadratic(spark):
    """The k ∝ √N calibration contract (VERDICT r5 #3): with
    k = suggested_k(N), SemDeDup's within-cluster candidate pairs
    Σ c·(c−1)/2 must grow ≈ N^1.5 between sf0.01 (N=500) and sf0.1
    (N=2000) — measured ratio ≈ 8 = 4^1.5 — and stay far below
    all-pairs. A fixed k (the silent-reversion failure mode) grows
    pairs ≈ N² = 16× here and busts the bound."""
    import os

    from django_datastream_spark.operators import clustering as cl

    stats = {}
    for sf in ("0.01", "0.1"):
        p = f"/root/testdata/sf{sf}/embeddings.parquet"
        if not os.path.exists(p):
            import pytest

            pytest.skip(f"testdata {p} missing")
        vecs = spark.read.parquet(p).select("vec_id", "embedding")
        n = vecs.count()
        k = cl.suggested_k(n)
        assigned = cl.kmeans_assign(vecs, k=k, iters=1, dim=64)
        sizes = assigned.groupBy("cid").count().collect()
        pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
        stats[sf] = (n, pairs)

    (n_s, p_s), (n_b, p_b) = stats["0.01"], stats["0.1"]
    n_ratio = n_b / n_s
    pair_ratio = p_b / p_s
    # near-N^1.5 growth, with margin for cluster imbalance; all-pairs
    # would be n_ratio**2
    assert pair_ratio <= n_ratio ** 1.75, (pair_ratio, n_ratio)
    # and nowhere near the quadratic frontier in absolute terms
    assert p_b <= 0.05 * (n_b * (n_b - 1) // 2), p_b


def test_suggested_k_contract():
    from django_datastream_spark.operators.clustering import suggested_k

    assert suggested_k(0) == 1
    assert suggested_k(500) == 23  # ceil(sqrt(500))
    assert suggested_k(10**8) == 10**4  # paper-scale: tens of thousands
    assert suggested_k(10**6, target_cluster_size=100) == 10**4
    import pytest

    with pytest.raises(ValueError):
        suggested_k(10, target_cluster_size=0)


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------
def test_pq_roundtrip_exact_on_codebook_points(spark):
    """Vectors lying exactly on codebook points encode losslessly, so
    ADC == exact dot product and PQ top-k == brute force."""
    import numpy as np

    from django_datastream_spark.operators import similarity as sim

    # 4 codewords per subspace, m=2, dsub=2 — vectors are codeword
    # concatenations chosen by closed form
    books = [
        [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.5, 0.5]],
        [[2.0, 0.0], [0.0, 2.0], [1.0, 1.0], [-2.0, 0.0]],
    ]
    rows = []
    for i in range(40):
        a, b = books[0][i % 4], books[1][(i // 4) % 4]
        rows.append((i, [*a, *b]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes = sim.pq_encode(df, books)
    got_codes = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    for i in range(40):
        assert got_codes[i] == [i % 4, (i // 4) % 4]
    top = sim.pq_adc_topk(df.limit(5), codes, books, k=3)
    got = {(r["query_id"], r["rank"]): r for r in top.collect()}
    X = np.array([v for _, v in rows])
    for q in range(5):
        s = X @ X[q]
        s[q] = -1e18  # exclude self
        order = np.lexsort((np.arange(40), -s))[:3]
        for rk in range(3):
            assert got[(q, rk + 1)]["neighbor_id"] == order[rk], (q, rk)
            assert got[(q, rk + 1)]["adc_score"] == pytest.approx(
                float(s[order[rk]])
            )


def test_pq_trained_recall_at_k(spark):
    """Standard PQ evaluation: the exact nearest neighbor must appear
    in the ADC top-k. (Recall@1 is the WRONG metric under
    quantization: same-cell points share codes, so ADC legitimately
    ties them — k gives the reranker its shortlist, which is how PQ
    is deployed.)"""
    import numpy as np

    from django_datastream_spark.operators import similarity as sim

    rng = np.random.default_rng(5)
    # 20 well-separated triplets: each point's exact NN is a sibling
    centers = rng.normal(size=(20, 16)) * 3
    X = np.vstack([
        c + rng.normal(size=(3, 16)) * 0.05 for c in centers
    ])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    books = sim.pq_train_codebooks(df, m=4, n_codes=32, seed=7)
    assert len(books) == 4 and len(books[0]) == 32
    codes = sim.pq_encode(df, books)
    top = sim.pq_adc_topk(df, codes, books, k=5).collect()
    shortlist = {}
    for r in top:
        shortlist.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = 0
    for q in range(len(X)):
        s = X @ X[q]
        s[q] = -1e18
        hits += int(int(np.argmax(s)) in shortlist[q])
    assert hits >= int(0.85 * len(X)), hits


def test_ivfpq_full_probe_equals_pure_pq(spark):
    import numpy as np

    from django_datastream_spark.operators import similarity as sim

    rng = np.random.default_rng(9)
    X = rng.normal(size=(60, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    books = sim.pq_train_codebooks(df, m=2, n_codes=16, seed=3)
    cents = [[float(x) for x in c] for c in rng.normal(size=(4, 8))]
    codes = sim.pq_encode(df, books)
    pure = sim.pq_adc_topk(df.limit(10), codes, books, k=3).collect()
    full = sim.ivfpq_topk(
        df.limit(10), df, 3, books, cents, n_probe=4
    ).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in rows
    )
    assert key(pure) == key(full)


def test_ivfpq_partial_probe_prunes_but_keeps_neighbors(spark):
    """Constructed cells: 4 orthogonal 10*e_c groups; every query's
    true top neighbors share its cell, so probing 2 of 4 cells must
    return exactly the brute-force answer while scanning half the
    corpus."""
    import numpy as np

    from django_datastream_spark.operators import similarity as sim

    books = [
        [[10.0, 0.0], [0.0, 10.0], [0.0, 0.0],
         [10.0, 0.25], [10.0, 0.5], [0.25, 0.0], [0.5, 0.0],
         [0.0, 0.25], [0.0, 0.5], [0.25, 10.0], [0.5, 10.0]],
        [[10.0, 0.0], [0.0, 10.0], [0.0, 0.0],
         [10.0, 0.25], [10.0, 0.5], [0.25, 0.0], [0.5, 0.0],
         [0.0, 0.25], [0.0, 0.5], [0.25, 10.0], [0.5, 10.0]],
    ]
    cents = [
        [10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0], [0, 0, 0, 10.0]
    ]
    rows = []
    for i in range(64):
        c, kk = i % 4, (i // 4) % 3
        v = [0.0] * 4
        v[c] = 10.0
        v[(c + 1) % 4] += 0.25 * kk
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    top = sim.ivfpq_topk(
        df.limit(16), df, 3, books, cents, n_probe=2
    ).collect()
    X = np.array([v for _, v in rows])
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in top}
    for q in range(16):
        s = X @ X[q]
        s[q] = -1e18
        order = np.lexsort((np.arange(64), -s))[:3]
        for rk in range(3):
            assert got[(q, rk + 1)] == order[rk], (q, rk)


def test_ivfpq_residual_mode_improves_within_cell_resolution(spark):
    """Residual quantization: with codebooks trained on residuals,
    within-cell displacements survive quantization that would collapse
    under raw-vector coding — recall@1 must be strictly better here."""
    import numpy as np

    from django_datastream_spark.operators import similarity as sim

    rng = np.random.default_rng(21)
    # far-apart cells + informative within-cell structure
    C = rng.normal(size=(4, 8)) * 50
    X = np.vstack([
        C[c] + rng.normal(size=(20, 8)) for c in range(4)
    ])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    cents = [[float(x) for x in c] for c in C]
    # residual books trained on displacements; raw books on raw vecs
    resid = np.vstack([X[c * 20 : (c + 1) * 20] - C[c] for c in range(4)])
    rdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(resid)],
        "vec_id long, embedding array<double>",
    )
    books_res = sim.pq_train_codebooks(rdf, m=4, n_codes=16, seed=3)
    books_raw = sim.pq_train_codebooks(df, m=4, n_codes=16, seed=3)

    def recall(books, residual):
        top = sim.ivfpq_topk(
            df, df, 1, books, cents, n_probe=1, residual=residual
        ).collect()
        exact = {}
        for q in range(len(X)):
            s = X @ X[q]
            s[q] = -1e18
            exact[q] = int(np.argmax(s))
        return sum(
            1 for r in top if exact[r["query_id"]] == r["neighbor_id"]
        )

    r_res = recall(books_res, True)
    r_raw = recall(books_raw, False)
    assert r_res > r_raw, (r_res, r_raw)
    assert r_res >= int(0.6 * len(X)), r_res
