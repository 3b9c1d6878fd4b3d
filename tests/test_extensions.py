"""Property tests for the non-oracle extension operators (SURVEY §2.10):
minhash/LSH, simhash, ANN — pinned against planted near-duplicates and
brute-force recomputation, since their hash functions aren't portable to
the DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from django_datastream_spark.operators import dedup as dd
from django_datastream_spark.operators import multimodal as mm
from django_datastream_spark.operators import similarity as sim

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
    )
    rows = docs.collect()
    planted = []
    for r in rows[:5]:
        # exact duplicate
        planted.append((10_000 + r["doc_id"], r["text"]))
        # near duplicate: drop the last word
        planted.append((20_000 + r["doc_id"], r["text"].rsplit(" ", 1)[0]))
    extra = spark.createDataFrame(planted, "doc_id long, text string")
    return docs.unionByName(extra)


def test_exact_dedup_keeps_min_id(spark, docs_with_dups):
    surv = dd.exact_dedup(docs_with_dups).select("doc_id").collect()
    ids = {r["doc_id"] for r in surv}
    # originals survive, exact copies (10_000+) don't, near-dups (20_000+) do
    assert all(i < 10_000 or i >= 20_000 for i in ids)
    assert len(ids) == 50 + 5


def test_simhash_identical_and_near(spark, docs_with_dups):
    sig = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs_with_dups).collect()}
    for d in range(5):
        orig, copy, near = sig[d], sig[10_000 + d], sig[20_000 + d]
        assert orig == copy, "identical text must hash identically"
        ham = bin((orig ^ near) & (2**64 - 1)).count("1")
        assert ham <= 8, f"near-dup hamming {ham} too large"
    # different docs are far apart
    others = [sig[i] for i in range(10)]
    for i in range(5):
        for j in range(i + 1, 5):
            ham = bin((others[i] ^ others[j]) & (2**64 - 1)).count("1")
            assert ham > 8


def test_simhash_near_pairs_blocking_finds_exact_copies(spark, docs_with_dups):
    pairs = dd.simhash_near_pairs(docs_with_dups, max_hamming=3).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    for d in range(5):
        assert (d, 10_000 + d) in found, "hamming-0 pair must be blocked together"


def test_minhash_lsh_finds_planted_near_dups(spark, docs_with_dups):
    res = dd.minhash_lsh_dedup(docs_with_dups, threshold=0.5).collect()
    found = {(r["a"], r["b"]) for r in res}
    for d in range(5):
        assert (d, 10_000 + d) in found  # jaccard 1.0
        assert (d, 20_000 + d) in found  # high-jaccard near-dup
    # every reported pair's jaccard is the exact value
    pairs = spark.createDataFrame(
        [(r["a"], r["b"]) for r in res], "a long, b long"
    )
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dd.jaccard_pairs(docs_with_dups, pairs).collect()
    }
    for r in res:
        assert r["jaccard"] == pytest.approx(exact[(r["a"], r["b"])])
        assert r["jaccard"] >= 0.5


def test_cosine_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").filter(
        F.col("vec_id") < 120
    )
    got = sim.cosine_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=3
    ).collect()
    rows = emb.orderBy("vec_id").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(vecs)
    for qid in range(10):
        qv = vecs[qid]
        sims = []
        for cid in ids:
            if cid == qid:
                continue
            cv = vecs[cid]
            c = float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
            sims.append((-c, cid))
        expected = [cid for _, cid in sorted(sims)[:3]]
        mine = [r["neighbor_id"] for r in got if r["query_id"] == qid]
        assert mine == expected, f"query {qid}"


def test_rp_lsh_topk_recall_and_consistency(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    q = emb.filter(F.col("vec_id") < 30)
    exact = sim.cosine_topk(q, emb, k=1).collect()
    approx = sim.rp_lsh_topk(q, emb, k=1, dim=64, n_planes=16, bands=8).collect()
    exact_nn = {r["query_id"]: r["neighbor_id"] for r in exact}
    approx_nn = {r["query_id"]: r["neighbor_id"] for r in approx}
    hits = sum(1 for k, v in approx_nn.items() if exact_nn.get(k) == v)
    # deterministic under seed 42; generous lower bound on top-1 recall
    assert hits / len(exact_nn) >= 0.3, f"recall {hits}/{len(exact_nn)}"
    # cosines reported by the ANN path are exact for the pairs it returns
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert r["cosine"] == pytest.approx(exact_cos[key], abs=1e-12)


def test_ivf_topk_recall_and_consistency(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    q = emb.filter(F.col("vec_id") < 30)
    exact = sim.cosine_topk(q, emb, k=1).collect()
    approx = sim.ivf_topk(q, emb, k=1, n_cells=8, n_probe=4).collect()
    exact_nn = {r["query_id"]: r["neighbor_id"] for r in exact}
    approx_nn = {r["query_id"]: r["neighbor_id"] for r in approx}
    hits = sum(1 for kk, v in approx_nn.items() if exact_nn.get(kk) == v)
    # probing half the cells on near-random vectors: generous bound
    assert hits / len(exact_nn) >= 0.3, f"recall {hits}/{len(exact_nn)}"
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert r["cosine"] == pytest.approx(exact_cos[key], abs=1e-12)


def test_multimodal_stub_and_plumbing(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 20
    )
    media = mm.synth_media_from_documents(docs)
    feats = mm.extract_features(media, fake=True).collect()
    assert len(feats) == 20
    by_id = {r["media_id"]: r for r in feats}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for mid, r in by_id.items():
        assert r["n_bytes"] == len(texts[mid].encode("utf-8"))
        assert len(r["feat"]) == 8
        assert r["feat"] == mm._fake_decode(texts[mid].encode("utf-8"))
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"abc", fake=False)
