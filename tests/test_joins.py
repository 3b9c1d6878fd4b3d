"""Salted-join tests (operators/joins.py): exact result equivalence to
the unsalted join (inner and fact-preserving left, incl. unmatched
rows), and the actual point of the exercise — a hot key's rows spread
across many salt buckets instead of one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from django_datastream_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 2000 fact rows, 95% on key 1; dim covers keys 0..9 (fact key 99
    # is unmatched, exercising the left-join null path)
    fact = spark.range(2000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 20 < 19, F.lit(1))
        .otherwise((F.col("id") % 7) + 2)
        .alias("k"),
    ).union(
        spark.range(5).select((F.col("id") + 10_000).alias("rid"), F.lit(99).alias("k"))
    )
    dim = spark.range(10).select(
        F.col("id").alias("dk"), F.concat(F.lit("v"), F.col("id")).alias("label")
    )
    return fact, dim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_matches_plain_join(spark, skewed):
    fact, dim = skewed
    cond = fact["k"] == dim["dk"]
    plain = fact.join(dim, cond).select("rid", "k", "label")
    salted = salted_join(fact, dim, cond, n_salts=8, salt_cols=["rid"]).select(
        "rid", "k", "label"
    )
    assert _rows(salted) == _rows(plain)


def test_left_preserves_unmatched_fact_rows(spark, skewed):
    fact, dim = skewed
    cond = fact["k"] == dim["dk"]
    plain = fact.join(dim, cond, "left").select("rid", "k", "label")
    salted = salted_join(
        fact, dim, cond, n_salts=8, salt_cols=["rid"], how="left"
    ).select("rid", "k", "label")
    assert _rows(salted) == _rows(plain)
    # the key-99 rows survive with null labels
    assert sum(1 for r in salted.collect() if r["label"] is None) == 5


def test_random_salt_equivalent_without_salt_cols(spark, skewed):
    fact, dim = skewed
    cond = fact["k"] == dim["dk"]
    plain = fact.join(dim, cond).select("rid", "k", "label")
    salted = salted_join(fact, dim, cond, n_salts=8).select("rid", "k", "label")
    assert _rows(salted) == _rows(plain)


def test_hot_key_spreads_across_salts(spark, skewed):
    fact, _ = skewed
    salted = fact.withColumn(
        "_s", F.pmod(F.xxhash64("rid"), F.lit(8)).cast("int")
    )
    per_bucket = (
        salted.filter(F.col("k") == 1).groupBy("_s").count().collect()
    )
    counts = {r["_s"]: r["count"] for r in per_bucket}
    total = sum(counts.values())
    # unsalted: all `total` rows land in ONE shuffle partition's key
    # group; salted: 8 buckets, none holding more than ~2/8 of the key
    assert len(counts) == 8
    assert max(counts.values()) < total / 2


def test_unsupported_how_rejected(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, fact["k"] == dim["dk"], how="full")


def test_range_overlap_join_crafted_edges(spark):
    """range_overlap_join edge semantics: half-open boundaries (touching
    intervals do NOT overlap), pairs spanning several buckets emit
    EXACTLY once (stab rule — no dedup pass), empty intervals never
    match, and keys partition the candidate space."""
    import datetime as dt

    from django_datastream_spark.operators.timeseries import (
        range_overlap_join,
    )

    d = dt.date

    def df(rows, side):
        return spark.createDataFrame(
            rows, f"k string, {side}_id long, {side}_s date, {side}_e date"
        )

    left = df(
        [
            ("a", 1, d(2024, 1, 1), d(2024, 2, 15)),   # long: spans buckets
            ("a", 2, d(2024, 1, 1), d(2024, 1, 5)),    # touches r3 at its start
            ("a", 3, d(2024, 3, 1), d(2024, 3, 1)),    # EMPTY interval
            ("b", 4, d(2024, 1, 1), d(2024, 2, 1)),    # other key
        ],
        "l",
    )
    right = df(
        [
            ("a", 10, d(2024, 1, 10), d(2024, 3, 10)),  # overlaps l1 41 days
            ("a", 11, d(2024, 1, 5), d(2024, 1, 6)),    # [5,6): l2 ends AT 5 -> no
            ("a", 12, d(2024, 3, 1), d(2024, 3, 2)),    # l3 empty -> no
            ("b", 13, d(2024, 1, 31), d(2024, 2, 9)),   # overlaps l4 on 1 day
        ],
        "r",
    )
    for bucket in (1, 7, 30, 365):
        got = sorted(
            (r["l_id"], r["r_id"])
            for r in range_overlap_join(
                left, right, ["k"], "l_s", "l_e", "r_s", "r_e",
                bucket_days=bucket,
            ).collect()
        )
        # exactly-once across ALL bucket widths, including widths far
        # smaller than the intervals (many shared buckets)
        assert got == [(1, 10), (1, 11), (4, 13)], (bucket, got)

    import pytest

    with pytest.raises(ValueError):
        range_overlap_join(left, right, ["k"], "l_s", "l_e", "r_s", "r_e",
                           bucket_days=0)
