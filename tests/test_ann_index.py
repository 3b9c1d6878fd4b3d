"""Persistent ANN index: build/load round trip, reload-equivalence
with the in-module IVF-PQ operator, incremental add_vectors with
index-version time travel, partition pruning of the codes table, and
the flat-PQ / residual / error paths."""

import random

import pytest
from pyspark.sql import functions as F

from django_datastream_spark.operators import ann_index as AI
from django_datastream_spark.operators import similarity as sim

BOOKS = [
    [[10.0, 0.0], [0.0, 10.0], [0.0, 0.0],
     [10.0, 0.25], [10.0, 0.5], [0.25, 0.0], [0.5, 0.0],
     [0.0, 0.25], [0.0, 0.5], [0.25, 10.0], [0.5, 10.0]],
    [[10.0, 0.0], [0.0, 10.0], [0.0, 0.0],
     [10.0, 0.25], [10.0, 0.5], [0.25, 0.0], [0.5, 0.0],
     [0.0, 0.25], [0.0, 0.5], [0.25, 10.0], [0.5, 10.0]],
]
CENTS = [
    [10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0],
    [0.0, 0.0, 10.0, 0.0], [0.0, 0.0, 0.0, 10.0],
]


def _orthocell_vecs(spark, n=64):
    """q199's construction: n vectors in 4 orthogonal cells with a
    small in-cell perturbation — every step of IVF-PQ is exact on
    them, so persisted-vs-inline comparisons are row-identical."""
    docs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 4).cast("int").alias("c"),
        ((F.col("id") / 4).cast("long") % 3).cast("double").alias("kk"),
    )
    comps = [
        (
            F.when(F.col("c") == j, F.lit(10.0)).otherwise(F.lit(0.0))
            + F.when(
                (F.col("c") + 1) % 4 == j, 0.25 * F.col("kk")
            ).otherwise(F.lit(0.0))
        )
        for j in range(4)
    ]
    return docs.select("vec_id", F.array(*comps).alias("embedding"))


def _rows(df):
    return [tuple(r) for r in df.orderBy("query_id", "rank").collect()]


def test_build_load_model_roundtrip(spark, tmp_path):
    root = str(tmp_path / "idx")
    vecs = _orthocell_vecs(spark)
    v = AI.build_ann_index(
        spark, root, vecs, codebooks=BOOKS, centroids=CENTS
    )
    assert v == 1
    model = AI.load_ann_model(spark, root)
    assert model.codebooks == BOOKS
    assert model.centroids == CENTS
    assert model.m == 2 and model.dsub == 2 and model.n_cells == 4
    assert model.residual is False


def test_reloaded_index_matches_inline_ivfpq(spark, tmp_path):
    root = str(tmp_path / "idx")
    vecs = _orthocell_vecs(spark)
    AI.build_ann_index(
        spark, root, vecs, codebooks=BOOKS, centroids=CENTS
    )
    queries = vecs.filter(F.col("vec_id") < 16)
    got = AI.query_ann_index(spark, root, queries, k=3, n_probe=2)
    want = sim.ivfpq_topk(queries, vecs, 3, BOOKS, CENTS, n_probe=2)
    assert _rows(got) == _rows(want)


def test_add_vectors_and_version_time_travel(spark, tmp_path):
    root = str(tmp_path / "idx")
    vecs = _orthocell_vecs(spark)
    first, rest = (
        vecs.filter(F.col("vec_id") < 48),
        vecs.filter(F.col("vec_id") >= 48),
    )
    v1 = AI.build_ann_index(
        spark, root, first, codebooks=BOOKS, centroids=CENTS
    )
    v2 = AI.add_vectors(spark, root, rest)
    assert (v1, v2) == (1, 2)
    assert AI.index_versions(spark, root) == [1, 2]
    queries = vecs.filter(F.col("vec_id") < 16)
    # v1 serves the index as of the first commit: no added neighbor ids
    at_v1 = AI.query_ann_index(
        spark, root, queries, k=3, n_probe=2, version=v1
    )
    assert all(
        r["neighbor_id"] < 48 for r in at_v1.collect()
    )
    assert _rows(at_v1) == _rows(
        sim.ivfpq_topk(queries, first, 3, BOOKS, CENTS, n_probe=2)
    )
    # latest == a fresh full build == inline over the whole corpus
    at_v2 = AI.query_ann_index(spark, root, queries, k=3, n_probe=2)
    assert _rows(at_v2) == _rows(
        sim.ivfpq_topk(queries, vecs, 3, BOOKS, CENTS, n_probe=2)
    )


def test_codes_scan_prunes_to_probed_cells(spark, tmp_path):
    from django_datastream_spark import txnlog as TL

    root = str(tmp_path / "idx")
    vecs = _orthocell_vecs(spark)
    AI.build_ann_index(
        spark, root, vecs, codebooks=BOOKS, centroids=CENTS
    )
    croot = AI.codes_root(root)
    _, all_files = TL.snapshot(croot)
    pruned = TL.txn_read(
        spark, croot, where={"cell": [0, 2]}, keep_meta=True
    )
    files = {r["__file"] for r in pruned.select("__file").collect()}
    assert files and len(files) < len(all_files)
    assert all("cell=0" in f or "cell=2" in f for f in files)
    cells = {r["cell"] for r in pruned.select("cell").collect()}
    assert cells == {0, 2}


def test_flat_pq_index_matches_pq_adc(spark, tmp_path):
    books = [
        [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.5, 0.5]],
        [[2.0, 0.0], [0.0, 2.0], [1.0, 1.0], [-2.0, 0.0]],
    ]
    docs = spark.range(64).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 4).cast("int").alias("a"),
        ((F.col("id") / 4).cast("long") % 4).cast("int").alias("b"),
    )
    b0 = F.array(*[F.array(*[F.lit(x) for x in r]) for r in books[0]])
    b1 = F.array(*[F.array(*[F.lit(x) for x in r]) for r in books[1]])
    vecs = docs.select(
        "vec_id", F.concat(b0[F.col("a")], b1[F.col("b")]).alias("embedding")
    )
    root = str(tmp_path / "flat")
    AI.build_ann_index(spark, root, vecs, codebooks=books)  # no IVF
    queries = vecs.filter(F.col("vec_id") < 16)
    got = AI.query_ann_index(spark, root, queries, k=3)
    codes = sim.pq_encode(vecs, books)
    want = sim.pq_adc_topk(queries, codes, books, k=3)
    assert _rows(got) == _rows(want)


def test_residual_mode_matches_inline(spark, tmp_path):
    rng = random.Random(7)
    rows = [
        (i, [10.0 * (i % 4 == j) + rng.uniform(-1, 1) for j in range(4)])
        for i in range(60)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    books = sim.pq_train_codebooks(vecs, m=2, n_codes=16, seed=3)
    root = str(tmp_path / "res")
    AI.build_ann_index(
        spark, root, vecs, codebooks=books, centroids=CENTS,
        residual=True,
    )
    queries = vecs.filter(F.col("vec_id") < 8)
    got = AI.query_ann_index(spark, root, queries, k=4, n_probe=2)
    want = sim.ivfpq_topk(
        queries, vecs, 4, books, CENTS, n_probe=2, residual=True
    )
    assert _rows(got) == _rows(want)


def test_trained_build_end_to_end(spark, tmp_path):
    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(5.0 * (i % 3 == j), 1.0) for j in range(6)])
        for i in range(90)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    root = str(tmp_path / "trained")
    AI.build_ann_index(
        spark, root, vecs, m=3, n_codes=16, n_cells=3, seed=5
    )
    model = AI.load_ann_model(spark, root)
    assert model.m == 3 and model.n_cells == 3 and model.n_codes == 16
    got = AI.query_ann_index(
        spark, root, vecs.filter(F.col("vec_id") < 5), k=4, n_probe=2
    )
    per_q = got.groupBy("query_id").count().collect()
    assert len(per_q) == 5 and all(r["count"] == 4 for r in per_q)


def test_error_paths(spark, tmp_path):
    root = str(tmp_path / "idx")
    vecs = _orthocell_vecs(spark, 16)
    AI.build_ann_index(
        spark, root, vecs, codebooks=BOOKS, centroids=CENTS
    )
    with pytest.raises(ValueError, match="already holds"):
        AI.build_ann_index(
            spark, root, vecs, codebooks=BOOKS, centroids=CENTS
        )
    bad = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    # dim mismatch surfaces from the encode UDF (wrapped by Spark)
    with pytest.raises(Exception, match="dim"):
        AI.add_vectors(spark, root, bad)
    with pytest.raises(ValueError, match="empty query set"):
        AI.query_ann_index(
            spark, root, vecs.filter(F.col("vec_id") < 0), k=3
        )
    with pytest.raises(ValueError, match="query dim"):
        AI.query_ann_index(spark, root, bad, k=3)


def test_remove_vectors_deletion_vector_path(spark, tmp_path):
    from django_datastream_spark import txnlog as TL

    root = str(tmp_path / "idx")
    vecs = _orthocell_vecs(spark)
    v1 = AI.build_ann_index(
        spark, root, vecs, codebooks=BOOKS, centroids=CENTS
    )
    queries = vecs.filter(F.col("vec_id") < 8)
    before = AI.query_ann_index(spark, root, queries, k=3, n_probe=2)
    gone = {
        r["neighbor_id"] for r in before.filter(F.col("rank") == 1).collect()
    }
    v2 = AI.remove_vectors(spark, root, sorted(gone))
    assert v2 == v1 + 1
    # no uint8 file was rewritten: the delete is a deletion vector
    _, files_before = TL.snapshot(AI.codes_root(root), v1)
    _, files_after = TL.snapshot(AI.codes_root(root), v2)
    assert files_before <= files_after  # only DV sidecars added
    after = AI.query_ann_index(spark, root, queries, k=3, n_probe=2)
    hit = {r["neighbor_id"] for r in after.collect()}
    assert not (hit & gone)  # removed ids never come back
    # equivalent to an index built without them
    root2 = str(tmp_path / "ref")
    AI.build_ann_index(
        spark, root2,
        vecs.filter(~F.col("vec_id").isin(sorted(gone))),
        codebooks=BOOKS, centroids=CENTS,
    )
    want = AI.query_ann_index(spark, root2, queries, k=3, n_probe=2)
    assert _rows(after) == _rows(want)
    # time travel to pre-delete still serves the removed ids
    at_v1 = AI.query_ann_index(
        spark, root, queries, k=3, n_probe=2, version=v1
    )
    assert _rows(at_v1) == _rows(before)
    # empty removal is a no-op version-wise
    assert AI.remove_vectors(spark, root, []) == v2


def test_distributed_query_matches_serving_path(spark, tmp_path):
    """query_ann_index_distributed (cogroup-by-cell, no driver collect
    on the query side) returns IDENTICAL rows to the serving path on
    the same persisted index — same ADC math, same total tie order."""
    root = str(tmp_path / "idx")
    vecs = _orthocell_vecs(spark)
    AI.build_ann_index(
        spark, root, vecs, codebooks=BOOKS, centroids=CENTS
    )
    for np_ in (1, 2, None):
        a = AI.query_ann_index(
            spark, root, vecs, k=3, n_probe=np_
        ).collect()
        b = AI.query_ann_index_distributed(
            spark, root, vecs, k=3, n_probe=np_
        ).collect()
        key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        ra = [(r["query_id"], r["rank"], r["neighbor_id"],
               round(r["adc_score"], 9)) for r in sorted(a, key=key)]
        rb = [(r["query_id"], r["rank"], r["neighbor_id"],
               round(r["adc_score"], 9)) for r in sorted(b, key=key)]
        assert ra == rb, f"n_probe={np_}"


def test_distributed_query_plan_has_no_driver_collect(spark, tmp_path):
    """The distributed mode is ONE lazy DAG: building it runs no jobs
    beyond the model load (a bounded txn_read collect of the few-
    thousand-row model table)."""
    root = str(tmp_path / "idx")
    AI.build_ann_index(
        spark, root, _orthocell_vecs(spark), codebooks=BOOKS, centroids=CENTS
    )
    sc = spark.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    df = AI.query_ann_index_distributed(
        spark, root, _orthocell_vecs(spark), k=1, n_probe=1
    )
    # model load may run bounded jobs; the QUERY side must stay lazy:
    # the returned frame is unexecuted and contains the cogroup
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "FlatMapCoGroupsInPandas" in plan or "CoGroup" in plan
    del before, sc


def test_optimize_index_preserves_answers_at_all_versions(
    spark, tmp_path
):
    """Many small add_vectors commits compact via optimize_index
    (dataChange=false) without changing any query answer at ANY
    version — the maintenance contract."""
    root = str(tmp_path / "idx")
    vecs = _orthocell_vecs(spark)
    first = vecs.filter(F.col("vec_id") < 8)
    AI.build_ann_index(
        spark, root, first, codebooks=BOOKS, centroids=CENTS
    )
    for lo in range(8, 16, 2):  # four tiny commits
        AI.add_vectors(
            spark, root,
            vecs.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 2)
            ),
        )
    versions = AI.index_versions(spark, root)
    before = {
        v: sorted(
            (r["query_id"], r["rank"], r["neighbor_id"],
             round(r["adc_score"], 9))
            for r in AI.query_ann_index(
                spark, root, first, k=2, n_probe=1, version=v
            ).collect()
        )
        for v in versions
    }
    files_before = AI.cell_stats(spark, root).agg(
        F.sum("n_files")
    ).collect()[0][0]
    AI.optimize_index(spark, root, target_file_bytes=1 << 30)
    files_after = AI.cell_stats(spark, root).agg(
        F.sum("n_files")
    ).collect()[0][0]
    assert files_after < files_before  # compaction really happened
    for v in versions:
        after = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"],
             round(r["adc_score"], 9))
            for r in AI.query_ann_index(
                spark, root, first, k=2, n_probe=1, version=v
            ).collect()
        )
        assert after == before[v], f"version {v}"


def test_cell_stats_reports_skew(spark, tmp_path):
    root = str(tmp_path / "idx")
    AI.build_ann_index(
        spark, root, _orthocell_vecs(spark), codebooks=BOOKS, centroids=CENTS
    )
    rows = AI.cell_stats(spark, root).collect()
    assert {r["cell"] for r in rows} == {0, 1, 2, 3}
    assert all(r["n_vectors"] >= 1 and r["n_files"] >= 1 for r in rows)
    # descending by population
    pops = [r["n_vectors"] for r in rows]
    assert pops == sorted(pops, reverse=True)


def test_query_with_prereloaded_model_matches_fresh_reload(spark, tmp_path):
    """r12: one disk reload may serve several operations against a root
    (the model table is immutable after build) — results must be
    IDENTICAL to per-call reloads."""
    root = str(tmp_path / "idx")
    vecs = _orthocell_vecs(spark)
    AI.build_ann_index(
        spark, root, vecs, codebooks=BOOKS, centroids=CENTS
    )
    model = AI.load_ann_model(spark, root)
    fresh = AI.query_ann_index(spark, root, vecs, k=2, n_probe=2).collect()
    reused = AI.query_ann_index(
        spark, root, vecs, k=2, n_probe=2, model=model
    ).collect()
    assert [tuple(r) for r in fresh] == [tuple(r) for r in reused]
