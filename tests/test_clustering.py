"""K-means + SemDeDup operator tests (operators/clustering.py).

Behavioral pins that the DuckDB oracle (q108/q109) can't express:
planted-structure recovery, the lowest-cid tie-break, keep-first
dup marking, and the zero-jobs-at-build invariant for the iterative
plan."""

from __future__ import annotations

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
