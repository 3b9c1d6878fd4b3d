"""Tests for deterministic sampling / corpus mixing (operators/sampling)
and repetition-quality metrics (functions/text.repetition_metrics) —
SURVEY §2.10 training-data-prep extensions. The cross-engine value check
lives in the q50/q51/q52 oracles; these pin semantics on crafted input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from django_datastream_spark.functions import text as tx
from django_datastream_spark.operators import sampling as smp


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"src{i % 4}", f"doc {i} body word{i % 7}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_repetition_metrics_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # grams: [a b, b a, a b, b a, a b] → top 'a b' 3/5
            (2, "w x y z"),              # 3 grams, all distinct
            (3, "solo"),                 # <2 tokens → no grams
            (4, None),                   # null text → no grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.repetition_metrics(docs).collect()}
    assert out[1]["n_2grams"] == 5
    assert out[1]["dup_2gram_frac"] == pytest.approx(3 / 5, abs=1e-4)
    assert out[1]["top_2gram_frac"] == pytest.approx(3 / 5, abs=1e-4)
    assert out[1]["keep"] is False
    assert out[2]["n_2grams"] == 3
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[2]["top_2gram_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert out[2]["keep"] is False  # top_frac 0.33 > 0.2
    for d in (3, 4):
        assert out[d]["n_2grams"] == 0
        assert out[d]["dup_2gram_frac"] is None
        assert out[d]["keep"] is False


def test_weighted_mix_rates_and_determinism(corpus):
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    kept = smp.weighted_mix(corpus, rates, default_rate=0.2)
    counts = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["src0"] == 100          # rate 1.0 keeps everything
    assert "src2" not in counts           # rate 0.0 keeps nothing
    assert 30 <= counts["src1"] <= 70     # ~50 of 100
    assert 5 <= counts.get("src3", 0) <= 40   # default 0.2 → ~20 of 100
    # deterministic: same input → identical kept set, run twice
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in smp.weighted_mix(corpus, rates, default_rate=0.2)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2
    # membership is row-local: a filtered subset keeps exactly the
    # intersection (no dependence on partitioning or neighbors)
    sub = corpus.filter(F.col("doc_id") % 3 == 0)
    sub_ids = sorted(
        r["doc_id"]
        for r in smp.weighted_mix(sub, rates, default_rate=0.2)
        .select("doc_id")
        .collect()
    )
    assert sub_ids == [i for i in ids1 if i % 3 == 0]


def test_train_heldout_split_partition(corpus):
    out = smp.train_heldout_split(corpus, heldout_frac=0.25)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["train"] + counts["heldout"] == 400
    assert 60 <= counts["heldout"] <= 140  # ~100
    # different salt from 'mix' draws: split is independent of mix u
    mixed = smp.weighted_mix(corpus, {}, default_rate=0.5)
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    heldout_in_mix = [r["doc_id"] for r in mixed.collect() if split_of[r["doc_id"]] == "heldout"]
    # if salts were shared, mix u<0.5 would contain ALL heldout (u<0.25)
    # rows; independence makes ~half of heldout fall outside the mix
    assert len(heldout_in_mix) < counts["heldout"]


def test_quality_weighted_sample(corpus):
    # weight 1.0 keeps everything; weight 0.0 keeps nothing
    assert smp.quality_weighted_sample(corpus, F.lit(1.0)).count() == 400
    assert smp.quality_weighted_sample(corpus, F.lit(0.0)).count() == 0
    # graded weights: higher-weight rows survive more often, and
    # membership is reproducible and row-local
    w = (F.col("doc_id") % 10) / 10.0
    kept = smp.quality_weighted_sample(corpus, w)
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in smp.quality_weighted_sample(corpus, w).select("doc_id").collect()
    )
    assert ids1 == ids2
    lo = sum(1 for i in ids1 if i % 10 <= 2)
    hi = sum(1 for i in ids1 if i % 10 >= 7)
    assert hi > 2 * lo
    # audit columns present: every survivor has u < w
    assert kept.filter(F.col("u") >= F.col("w")).count() == 0


def test_epoch_shuffle_deterministic_and_epoch_dependent(spark):
    from django_datastream_spark.operators.sampling import epoch_shuffle

    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a1 = {(r["doc_id"]): (r["batch"], r["pos"])
          for r in epoch_shuffle(docs, 3, 8).collect()}
    a2 = {(r["doc_id"]): (r["batch"], r["pos"])
          for r in epoch_shuffle(docs, 3, 8).collect()}
    b = {(r["doc_id"]): (r["batch"], r["pos"])
         for r in epoch_shuffle(docs, 4, 8).collect()}
    assert a1 == a2                      # deterministic
    assert a1 != b                       # epoch actually permutes
    # (batch, pos) is a bijection onto contiguous positions per batch
    seen = sorted(a1.values())
    per_batch = {}
    for bt, pos in seen:
        per_batch.setdefault(bt, []).append(pos)
    assert set(per_batch) == set(range(8))
    for ps in per_batch.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
