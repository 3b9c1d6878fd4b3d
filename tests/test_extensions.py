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


def test_cosine_near_pairs_lsh_subset_and_planted_recall(spark):
    """LSH-blocked cosine near-dup: every reported pair must appear in the
    brute-force result with an identical cosine (soundness), and planted
    exact duplicates (identical signatures → guaranteed band collision)
    must always be found (recall floor)."""
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .filter(F.col("vec_id") < 150)
        .select("vec_id", "embedding")
    )
    dup = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    data = emb.unionByName(dup)
    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in dd.cosine_near_pairs_lsh(data, threshold=0.35).collect()
    }
    exact = {
        (r["a"], r["b"]): r["cosine"]
        for r in dd.cosine_near_pairs(data, threshold=0.35).collect()
    }
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert v == pytest.approx(exact[k], abs=1e-12)
    for d in range(5):
        assert (d, 10_000 + d) in got  # identical vectors always collide
        assert got[(d, 10_000 + d)] == pytest.approx(1.0)


def test_cosine_near_pairs_lsh_near_dup_recall(spark):
    """Planted NEAR- (not identical-) duplicate recall: for each of 100
    base vectors, plant a perturbed copy at a known cosine drawn from
    [0.85, 0.98] (u = c·v̂ + √(1−c²)·ŵ, ŵ ⊥ v̂) and measure how many
    planted pairs the LSH blocking recovers at threshold 0.8.

    Deterministic under numpy seed 0 + LSH seed 42: measured recall is
    100/100 at the defaults (56 planes, 8 bands = 7 bits/band), and the
    output contains exactly the planted pairs (no extra pair of
    arbitrary vectors reaches cosine 0.8). 0.9 leaves headroom only for
    testdata regeneration."""
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", "embedding")
        .collect()
    )
    rng = np.random.default_rng(0)
    rows, planted = [], set()
    for r in emb:
        v = np.asarray(r["embedding"], dtype=np.float64)
        vh = v / np.linalg.norm(v)
        c = rng.uniform(0.85, 0.98)
        w = rng.standard_normal(len(v))
        w -= (w @ vh) * vh
        w /= np.linalg.norm(w)
        u = c * vh + np.sqrt(1.0 - c * c) * w
        rows.append((int(r["vec_id"]), [float(x) for x in v]))
        rows.append((int(r["vec_id"]) + 10_000, [float(x) for x in u]))
        planted.add((int(r["vec_id"]), int(r["vec_id"]) + 10_000))
    data = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["a"], r["b"])
        for r in dd.cosine_near_pairs_lsh(data, threshold=0.8).collect()
    }
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"near-dup recall {recall:.2f}"


def test_dedup_clusters_connected_components(spark):
    """Min-label propagation must find exact components, including a
    chain (multi-hop propagation) and isolated nodes."""
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # components: {0,1,2,3} as a chain, {5,7}, singletons 4,6,8,9
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (0, 1), (5, 7)], "a long, b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.dedup_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 6, 7: 5, 8: 8, 9: 9}


def test_dedup_clusters_long_chain_converges_logarithmically(spark):
    """Worst-case topology: a 200-node path. Pure min-label propagation
    needs ~199 rounds (one hop per round); the label-of-label doubling
    step must bring it down to O(log L)."""
    n = 200
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        # small_edge_cap=0 forces the distributed fixpoint this test pins
        for r in dd.dedup_clusters(docs, pairs, small_edge_cap=0).collect()
    }
    assert got == {i: 0 for i in range(n)}
    # ceil(log2(200)) = 8; the combined neighbor+halving update empirically
    # converges in ~6 rounds (+1 no-change round to detect the fixpoint)
    assert dd.dedup_clusters.last_rounds <= 12, dd.dedup_clusters.last_rounds


def test_dedup_clusters_driver_path_matches_distributed(spark):
    """The size-adaptive driver union-find (edge set under the cap) must
    produce byte-identical labels to the distributed fixpoint on a graph
    with chains, a cycle, a star, and singletons."""
    import random

    rng = random.Random(7)
    n = 120
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = (
        [(i, i + 1) for i in range(0, 30)]        # chain
        + [(40, 41), (41, 42), (42, 40)]          # cycle
        + [(60, 60 + k) for k in range(1, 8)]     # star
        + [(rng.randrange(80, 118), rng.randrange(80, 118)) for _ in range(25)]
    )
    pairs = spark.createDataFrame(edges, "a long, b long")
    fast = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.dedup_clusters(docs, pairs).collect()
    }
    assert dd.dedup_clusters.last_rounds == 0  # took the driver path
    slow = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.dedup_clusters(docs, pairs, small_edge_cap=0).collect()
    }
    assert dd.dedup_clusters.last_rounds >= 1  # took the distributed path
    assert fast == slow


def test_vocab_topk_counts_and_tiebreak(spark):
    from django_datastream_spark.functions.text import vocab_topk

    docs = spark.createDataFrame(
        [(0, "b a a"), (1, "B c a"), (2, None)], "doc_id long, text string"
    )
    got = [(r["token"], r["occurrences"]) for r in vocab_topk(docs, 3).collect()]
    assert got == [("a", 3), ("b", 2), ("c", 1)]  # lowercased; tie b<c by count


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
    # deterministic under seed 42: measured top-1 recall is 1.0 (30/30)
    # on this corpus/config; 0.9 leaves headroom only for testdata regen
    assert hits / len(exact_nn) >= 0.9, f"recall {hits}/{len(exact_nn)}"
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
    # deterministic under seed 42: measured top-1 recall is 25/30 (0.83)
    # probing half the cells; 0.7 leaves headroom only for testdata regen
    assert hits / len(exact_nn) >= 0.7, f"recall {hits}/{len(exact_nn)}"
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert r["cosine"] == pytest.approx(exact_cos[key], abs=1e-12)


def _seq_dot(a, b) -> float:
    """Sequential left fold — same IEEE operation order as the engine's
    F.aggregate(zip_with(...)) expression, so doubles match bitwise."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _rerank(cands: dict[int, set[int]], vecs: dict[int, list[float]], k: int):
    """Exact cosine rerank of candidate sets, engine tie-break (cosine
    desc, neighbor asc). Returns [(query_id, rank, neighbor_id, cosine)]."""
    import math

    out = []
    norms = {i: math.sqrt(_seq_dot(v, v)) for i, v in vecs.items()}
    for qid in sorted(cands):
        scored = [
            (-(_seq_dot(vecs[qid], vecs[nid]) / (norms[qid] * norms[nid])), nid)
            for nid in cands[qid]
            if nid != qid
        ]
        for rank, (negc, nid) in enumerate(sorted(scored)[:k], start=1):
            out.append((qid, rank, nid, -negc))
    return out


def test_simhash_matches_python_majority_vote(spark):
    """q38 oracle: exact simhash recompute — Spark supplies only the token
    xxhash64 primitive; the per-bit majority vote and signature assembly
    are recomputed independently in Python over the full q38 corpus."""
    from django_datastream_spark.functions.text import tokens

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    tok_rows = docs.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("tok")
    ).withColumn("h", F.xxhash64("tok")).collect()
    votes: dict[int, list[int]] = {}
    for r in tok_rows:
        v = votes.setdefault(r["doc_id"], [0] * 64)
        if r["h"] is None:
            continue
        h = r["h"]
        for i in range(64):
            v[i] += 1 if (h >> i) & 1 else -1
    expected = {}
    for did, v in votes.items():
        sig = 0
        for i in range(64):
            if v[i] > 0:
                sig |= 1 << i
        # python ints are unbounded; engine returns signed 64-bit
        expected[did] = sig - (1 << 64) if sig >= (1 << 63) else sig
    got = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs).collect()}
    assert got == expected


def test_minhash_lsh_matches_python_pipeline(spark):
    """q39 oracle: exact recompute of the full MinHash-LSH pipeline with
    the q39 parameters (64 hashes, 16 bands, 3-shingles, threshold 0.5).
    Spark supplies only the seeded shingle hashes; signature mins, band
    bucketing (on raw slice tuples — a superset-proof stand-in for the
    engine's slice hash), candidate generation and exact Jaccard are all
    recomputed in Python."""
    from django_datastream_spark.functions.text import word_shingles

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    sh_rows = docs.select(
        "doc_id",
        F.array_distinct(word_shingles(F.col("text"), 3)).alias("shs"),
    ).collect()
    doc_shingles = {r["doc_id"]: set(r["shs"]) for r in sh_rows}
    distinct = sorted({s for shs in doc_shingles.values() for s in shs})
    sh_df = spark.createDataFrame([(s,) for s in distinct], "sh string")
    hash_rows = sh_df.select(
        "sh", *[F.xxhash64("sh", F.lit(i)).alias(f"h{i}") for i in range(64)]
    ).collect()
    hval = {r["sh"]: [r[f"h{i}"] for i in range(64)] for r in hash_rows}

    sigs = {
        did: [min(hval[s][i] for s in shs) for i in range(64)]
        for did, shs in doc_shingles.items()
        if shs
    }
    buckets: dict[tuple, list[int]] = {}
    for did, sig in sigs.items():
        for b in range(16):
            buckets.setdefault((b, tuple(sig[b * 4 : b * 4 + 4])), []).append(did)
    cand = set()
    for members in buckets.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cand.add((min(a, b), max(a, b)))
    expected = {}
    for a, b in cand:
        sa, sb = doc_shingles[a], doc_shingles[b]
        u = len(sa | sb)
        j = len(sa & sb) / u if u else 0.0
        if j >= 0.5:
            expected[(a, b)] = j

    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dd.minhash_lsh_dedup(docs, threshold=0.5).collect()
    }
    assert set(got) == set(expected)
    for k_, v in expected.items():
        assert got[k_] == pytest.approx(v, abs=1e-12)


def test_rp_lsh_topk_matches_python_pipeline(spark):
    """q41 oracle: full-set equality against an independent numpy/Python
    recompute — hyperplane signatures, band bucketing, candidate join and
    the exact rerank (same fold order, same tie-break)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    q = emb.filter(F.col("vec_id") < 30)
    rows = emb.collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    P = np.asarray(sim._hyperplanes(64, 16, 42), dtype=np.float64)
    X = np.asarray([vecs[i] for i in sorted(vecs)], dtype=np.float64)
    ids = sorted(vecs)
    bits = (X @ P.T) >= 0
    sig = {
        ids[r]: int(sum(1 << i for i in range(16) if bits[r, i]))
        for r in range(len(ids))
    }
    rows_per_band = 16 // 8

    def band_keys(s: int) -> list[tuple[int, int]]:
        return [(b, (s >> (b * rows_per_band)) & 3) for b in range(8)]

    corpus_buckets: dict[tuple[int, int], list[int]] = {}
    for did, s in sig.items():
        for bk in band_keys(s):
            corpus_buckets.setdefault(bk, []).append(did)
    cands = {
        qid: {
            nid
            for bk in band_keys(sig[qid])
            for nid in corpus_buckets.get(bk, [])
        }
        for qid in range(30)
    }
    expected = _rerank(cands, vecs, k=3)
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in sim.rp_lsh_topk(q, emb, k=3, dim=64, n_planes=16, bands=8)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert [g[:3] for g in got] == [e[:3] for e in expected]
    for g, e in zip(got, expected):
        assert g[3] == pytest.approx(e[3], abs=1e-12)


def test_ivf_topk_matches_python_pipeline(spark):
    """q42 oracle: full-set equality against an independent Python
    recompute of assignment (argmin distance, first-min tie-break),
    probing (distance asc, cell asc) and the exact rerank. Centroids are
    taken from the operator's own cache so both sides score the same
    index."""
    import math

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    q = emb.filter(F.col("vec_id") < 30)
    got_df = sim.ivf_topk(
        q, emb, k=3, n_cells=8, n_probe=3, cache_key="test-ivf-oracle"
    )
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in got_df.orderBy("query_id", "rank").collect()
    ]
    cents = sim._IVF_CACHE[("test-ivf-oracle", 8, 42)]
    rows = emb.collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

    def eucl(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (float(x) - float(y)) * (float(x) - float(y))
        return math.sqrt(acc)

    C = np.asarray(cents, dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    assign = {}
    for did, v in vecs.items():
        d = c2 - 2.0 * (np.asarray(v, dtype=np.float64) @ C.T)
        assign[did] = int(np.argmin(d))
    cells: dict[int, list[int]] = {}
    for did, c in assign.items():
        cells.setdefault(c, []).append(did)
    cands = {}
    for qid in range(30):
        probed = sorted(
            range(len(cents)), key=lambda c: (eucl(vecs[qid], cents[c]), c)
        )[:3]
        cands[qid] = {nid for c in probed for nid in cells.get(c, [])}
    expected = _rerank(cands, vecs, k=3)
    assert [g[:3] for g in got] == [e[:3] for e in expected]
    for g, e in zip(got, expected):
        assert g[3] == pytest.approx(e[3], abs=1e-12)


def test_multimodal_resize_and_frame_sampling(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 10
    )
    media = mm.synth_media_from_documents(docs)
    texts = {r["doc_id"]: r["text"].encode("utf-8") for r in docs.collect()}

    resized = {r["media_id"]: r for r in mm.resize_images(media, 4, 4).collect()}
    assert len(resized) == 10
    for mid, r in resized.items():
        assert r["out_width"] == 4 and r["out_height"] == 4
        assert len(r["resized"]) <= 16
        if len(texts[mid]) > 16:
            assert len(r["resized"]) == 16
        # deterministic: same payload → same resized bytes
    again = {r["media_id"]: r for r in mm.resize_images(media, 4, 4).collect()}
    assert all(again[m]["resized"] == resized[m]["resized"] for m in resized)

    frames = mm.sample_frames(media, every_ms=100, max_frames=3).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(texts)
    for mid, fr in by_media.items():
        assert [x["frame_idx"] for x in sorted(fr, key=lambda x: x["frame_idx"])] == list(
            range(len(fr))
        )
        assert len(fr) <= 3
        assert all(len(x["frame"]) <= 16 for x in fr)
    with pytest.raises(Exception):
        mm.resize_images(media, 4, 4, fake=False).collect()


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


def test_ivf_index_refits_when_corpus_changes(spark, tmp_path):
    """A persisted IVF index carries a corpus fingerprint (row count +
    fit params); reusing the same index_dir against a REGENERATED corpus
    must refit instead of silently serving stale centroids (ADVICE r3)."""
    import json

    idx = str(tmp_path / "ivf_idx")
    emb_a = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").filter(
        F.col("vec_id") < 150
    )
    q = emb_a.filter(F.col("vec_id") < 5)
    sim.ivf_topk(q, emb_a, k=1, n_cells=4, n_probe=2, index_dir=idx).collect()
    with open(f"{idx}/centroids.json") as f:
        saved_a = json.load(f)
    assert saved_a["fingerprint"]["n_rows"] == 150
    cents_a = saved_a["centroids"]

    # matching fingerprint → reuse: file content unchanged after rerun
    sim.ivf_topk(q, emb_a, k=1, n_cells=4, n_probe=2, index_dir=idx).collect()
    with open(f"{idx}/centroids.json") as f:
        assert json.load(f)["centroids"] == cents_a

    # regenerated (larger) corpus at the same index_dir → refit
    emb_b = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").filter(
        F.col("vec_id") < 250
    )
    sim.ivf_topk(q, emb_b, k=1, n_cells=4, n_probe=2, index_dir=idx).collect()
    with open(f"{idx}/centroids.json") as f:
        saved_b = json.load(f)
    assert saved_b["fingerprint"]["n_rows"] == 250
    assert saved_b["centroids"] != cents_a


def test_quantize_int8_crafted(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in sim.quantize_int8(emb).collect()}
    assert out[1]["scale"] == pytest.approx(127.0)
    # floor(x*scale + 0.5): 1.0->127, -0.5->floor(-63.0)=-63, 0->0
    assert out[1]["q"] == [127, -63, 0]
    assert all(-128 <= v <= 127 for v in out[1]["q"])
    # zero vector: no defined scale, codes null rather than div-by-zero
    assert out[2]["scale"] is None
    assert out[2]["q"] == [None, None]


# ---------------------------------------------------------------------------
# benchmark decontamination (operators/decontaminate.py, q54)
# ---------------------------------------------------------------------------


def test_flag_contaminated_crafted(spark):
    from django_datastream_spark.operators import decontaminate as dc

    ev = spark.createDataFrame(
        [(100, "a b c d")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "x a b c y"),      # shares 3-gram "a b c"
            (2, "b c d b c d"),    # shares "b c d" (counted once: distinct)
            (3, "z z z z"),        # clean
            (4, "a b"),            # shorter than n -> no grams -> clean
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dc.flag_contaminated(train, ev, n=3).collect()}
    assert out[1]["n_shared"] == 1 and out[1]["contaminated"]
    assert out[2]["n_shared"] == 1 and out[2]["contaminated"]
    assert out[3]["n_shared"] == 0 and not out[3]["contaminated"]
    assert out[4]["n_shared"] == 0 and not out[4]["contaminated"]

    # min_shared raises the bar
    strict = {
        r["doc_id"]: r["contaminated"]
        for r in dc.flag_contaminated(train, ev, n=3, min_shared=2).collect()
    }
    assert not any(strict.values())

    # hashed join keys give identical results (8-byte broadcast at scale)
    hashed = {
        r["doc_id"]: (r["n_shared"], r["contaminated"])
        for r in dc.flag_contaminated(train, ev, n=3, hashed=True).collect()
    }
    assert hashed == {
        k: (v["n_shared"], v["contaminated"]) for k, v in out.items()
    }


def test_flag_contaminated_hashed_matches_string_keys_sf001(spark):
    """The documented cluster-scale path (xxhash64 gram keys, ~10x
    smaller broadcast) must agree with the bit-portable string-key path
    on real corpus data — q54's exact train/eval split at sf0.01."""
    from django_datastream_spark.operators import decontaminate as dc
    from django_datastream_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    cols = ["doc_id", "n_shared", "contaminated"]
    plain = [
        tuple(r) for r in
        dc.flag_contaminated(train, ev, n=3).select(cols).orderBy("doc_id").collect()
    ]
    hashed = [
        tuple(r) for r in
        dc.flag_contaminated(train, ev, n=3, hashed=True)
        .select(cols).orderBy("doc_id").collect()
    ]
    assert len(plain) == 490 and plain == hashed


def test_fuzzy_contaminated_crafted(spark):
    """Near-dup eval leakage is caught at jaccard >= threshold; unrelated
    docs stay clean; eval-side banded table broadcasts."""
    from django_datastream_spark.operators import decontaminate as dc

    base = " ".join(f"tok{i}" for i in range(30))
    ev = spark.createDataFrame(
        [(1000, base)], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, base.replace("tok29", "changed")),   # near-dup of eval
            (2, " ".join(f"other{i}" for i in range(30))),  # unrelated
        ],
        "doc_id long, text string",
    )
    out = dc.fuzzy_contaminated(train, ev, threshold=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["contaminated"] and rows[1]["max_jaccard"] >= 0.8
    assert rows[1]["n_matches"] == 1
    assert not rows[2]["contaminated"] and rows[2]["n_matches"] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_flag_contaminated_plan_is_broadcast(spark):
    from django_datastream_spark.operators import decontaminate as dc

    ev = spark.createDataFrame([(100, "a b c d")], "doc_id long, text string")
    train = spark.createDataFrame([(1, "x a b c y")], "doc_id long, text string")
    plan = dc.flag_contaminated(train, ev, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# time-series alignment (operators/timeseries.py, q56/q57)
# ---------------------------------------------------------------------------


def test_asof_join_crafted(spark):
    from datetime import datetime as dt

    from django_datastream_spark.operators import timeseries as tso

    left = spark.createDataFrame(
        [
            (1, 7, dt(2024, 1, 1, 0, 0, 5)),   # after r@3 -> 30.0
            (2, 7, dt(2024, 1, 1, 0, 0, 3)),   # equal ts -> inclusive, 30.0
            (3, 7, dt(2024, 1, 1, 0, 0, 1)),   # before any right -> null
            (4, 8, dt(2024, 1, 1, 0, 0, 9)),   # other key -> 80.0
            (5, 9, dt(2024, 1, 1, 0, 0, 9)),   # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, dt(2024, 1, 1, 0, 0, 2), 20.0),
            (7, dt(2024, 1, 1, 0, 0, 3), 30.0),
            (8, dt(2024, 1, 1, 0, 0, 0), 80.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in tso.asof_join(left, right, key="user_id").collect()
    }
    assert out[1]["value_asof"] == 30.0
    assert out[2]["value_asof"] == 30.0          # equal ts is inclusive
    assert out[3]["value_asof"] is None and out[3]["ts_asof"] is None
    assert out[4]["value_asof"] == 80.0
    assert out[5]["value_asof"] is None
    assert len(out) == 5                          # left rows preserved 1:1

    # tolerance: match older than 2s is nulled
    tol = {
        r["event_id"]: r["value_asof"]
        for r in tso.asof_join(
            left, right, key="user_id", tolerance_seconds=2.0
        ).collect()
    }
    assert tol[1] == 30.0                         # 2s gap, within
    assert tol[4] is None                         # 9s gap, outside


def test_asof_join_plan_single_shuffle_no_rangejoin(spark):
    from datetime import datetime as dt

    from django_datastream_spark.operators import timeseries as tso

    left = spark.createDataFrame(
        [(1, 7, dt(2024, 1, 1))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, dt(2024, 1, 1), 1.0)], "user_id long, ts timestamp, value double"
    )
    plan = tso.asof_join(left, right, key="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union trick: no join node at all, one hash exchange for the window
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_resample_ffill_crafted(spark):
    from datetime import datetime as dt

    from django_datastream_spark.operators import timeseries as tso

    df = spark.createDataFrame(
        [
            # key 1: values at hours 0 and 3 -> grid 0..3, hours 1-2 carried
            (1, 1, dt(2024, 1, 1, 0, 30), 10.0),
            (2, 1, dt(2024, 1, 1, 0, 45), 11.0),  # same bucket, higher order wins
            (3, 1, dt(2024, 1, 1, 3, 10), 40.0),
            # key 2: single point -> single-bucket grid
            (4, 2, dt(2024, 1, 1, 5, 0), 99.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = tso.resample_ffill(
        df, key="user_id", step_seconds=3600, order_col="event_id"
    ).collect()
    k1 = sorted(
        [(r["bucket_start"], r["value"], r["filled"]) for r in out if r["user_id"] == 1]
    )
    base = int(dt(2024, 1, 1).timestamp())
    assert k1 == [
        (base, 11.0, False),          # last-wins within bucket (event 2)
        (base + 3600, 11.0, True),    # carried
        (base + 7200, 11.0, True),    # carried
        (base + 10800, 40.0, False),
    ]
    k2 = [(r["value"], r["filled"]) for r in out if r["user_id"] == 2]
    assert k2 == [(99.0, False)]


def test_levenshtein_near_pairs_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "s1", 44),
            (2, "the quick brown fox jumps over the lazy cat", "s1", 44),  # 3 edits
            (3, "completely different text with other words!!", "s1", 44),
            (4, "the quick brown fox jumps over the lazy dog", "s2", 44),  # other block
            (5, "x" * 250, "s1", 250),                                     # other band
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    out = dd.levenshtein_near_pairs(docs, threshold=0.8)
    pairs = {(r["a"], r["b"]): r for r in out.collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["dist"] == 3
    assert pairs[(1, 2)]["sim"] == pytest.approx(1 - 3 / 43)
    # cross-source and cross-length-band pairs are never candidates
    assert all(a != 4 and b != 4 and a != 5 and b != 5 for a, b in pairs)
    # low-similarity pair within the block is filtered
    assert (1, 3) not in pairs
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_levenshtein_pairs_boundary_straddling_band(spark):
    """A near-dup pair whose lengths straddle a length-band edge (98 vs
    104 chars over the 100 boundary) is caught by the offset-band/2 grid
    — the single-offset banding this replaces provably missed it."""
    base = " ".join(f"t{i:02d}" for i in range(24))  # 95 chars, 24 tokens
    t1 = base + " ab"        # 98 chars
    t2 = base + " abcdefgh"  # 104 chars, dist = 6
    assert (len(t1), len(t2)) == (98, 104)
    assert len(t1) // 100 != len(t2) // 100  # straddles the offset-0 grid
    docs = spark.createDataFrame(
        [(1, t1, "s1", len(t1)), (2, t2, "s1", len(t2))],
        "doc_id long, text string, source string, n_chars long",
    )
    out = {(r["a"], r["b"]): r for r in
           dd.levenshtein_near_pairs(docs, threshold=0.8).collect()}
    assert (1, 2) in out
    assert out[(1, 2)]["dist"] == 6
    assert out[(1, 2)]["sim"] == pytest.approx(1 - 6 / 104)


def test_approx_percentile_error_bound(spark):
    """q64's scale contract: Greenwald-Khanna guarantees the returned
    value's rank is within ±n/accuracy of the target rank. With values
    0..n−1 the value IS its rank, so the bound is directly checkable in
    the regime where the sketch actually compresses (n ≫ accuracy)."""
    n, acc = 50_000, 1_000
    df = spark.range(n).select((F.col("id") * 977 % n).alias("value"))
    ps = [0.5, 0.95, 0.99]
    row = df.agg(
        F.approx_percentile(
            "value", F.array(*[F.lit(p) for p in ps]), F.lit(acc)
        ).alias("p")
    ).head()
    for p, got in zip(ps, row["p"]):
        target = p * n
        assert abs(got - target) <= n / acc + 1, (p, got, target)


@pytest.mark.slow
def test_approx_distinct_error_bound(spark):
    """q66's contract: HLL++ relative error stays within a few rsd of
    exact, checked in the regime where the sketch actually estimates
    (100k distinct keys, far past linear counting)."""
    n, rsd = 100_000, 0.01
    df = spark.range(3 * n).select(
        (F.col("id") % 3).alias("g"), (F.col("id") / 3).cast("long").alias("k")
    )
    rows = (
        df.groupBy("g")
        .agg(
            F.approx_count_distinct("k", rsd).alias("a"),
            F.countDistinct("k").alias("e"),
        )
        .collect()
    )
    assert len(rows) == 3
    for r in rows:
        assert abs(r["a"] - r["e"]) / r["e"] <= 4 * rsd, (r["a"], r["e"])


def test_interpreted_projection_session(spark):
    """q66's r11 optimization: the interpreted-factory session clone
    must return bit-identical HLL estimates, cache per parent session,
    and leave the parent's codegen factory mode untouched."""
    from django_datastream_spark.session import (
        interpreted_projection_session,
    )

    clone = interpreted_projection_session(spark)
    assert clone is interpreted_projection_session(spark)  # cached
    assert clone is not spark
    assert clone.conf.get("spark.sql.codegen.factoryMode") == "NO_CODEGEN"
    assert (
        spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
        == "FALLBACK"
    )
    df = spark.range(5000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") * 7919 % 997).alias("k")
    )
    agg = lambda s: (  # noqa: E731
        s.createDataFrame(df.collect(), df.schema)
        .groupBy("g")
        .agg(F.approx_count_distinct("k", 0.01).alias("a"))
        .orderBy("g")
        .collect()
    )
    assert agg(spark) == agg(clone)


@pytest.mark.slow
def test_pack_greedy_crafted(spark):
    """Greedy fill edge cases: exact-fit stays in the pack, overflow
    starts a new one, an oversize doc gets its own pack, and packing is
    independent of input partitioning."""
    from django_datastream_spark.operators import sampling as smp

    rows = [
        # (doc_id, text, source): token counts 3, 2, 5, 1, 9, 2 at cap 5
        (1, "a b c", "s1"),        # pack 0 (fill 3)
        (2, "a b", "s1"),          # fits exactly: pack 0 (fill 5)
        (3, "a b c d e", "s1"),    # overflow -> pack 1 (fill 5, exact cap)
        (4, "a", "s1"),            # overflow -> pack 2
        (5, "a b c d e f g h i", "s1"),  # oversize (9 > 5) -> pack 3 alone
        (6, "a b", "s1"),          # pack 4
        (7, "x y z", "s2"),        # independent group: pack 0
    ]
    expected = {1: 0, 2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 0}
    for parts in (1, 7):
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).repartition(parts)
        out = {
            r["doc_id"]: r["pack_idx"]
            for r in smp.pack_greedy(docs, max_tokens=5).collect()
        }
        assert out == expected, (parts, out)


def test_stratified_sample_exact_k_and_deterministic(spark):
    from django_datastream_spark.operators import sampling as smp

    rows = [(i, f"s{i % 3}") for i in range(40)] + [(100, "tiny")]
    picks = []
    for parts in (1, 8):
        docs = spark.createDataFrame(
            rows, "doc_id long, source string"
        ).repartition(parts)
        got = smp.stratified_sample(docs, k=4).collect()
        by_src = {}
        for r in got:
            by_src.setdefault(r["source"], set()).add(r["doc_id"])
        assert {s: len(v) for s, v in sorted(by_src.items())} == {
            "s0": 4, "s1": 4, "s2": 4, "tiny": 1  # min(k, |stratum|)
        }
        picks.append({s: frozenset(v) for s, v in by_src.items()})
    assert picks[0] == picks[1]  # partitioning-independent


def test_chunk_documents_crafted(spark):
    """Chunk boundary semantics: stride windows, suffix-covered trailing
    start dropped, exact-fit single chunk, empty doc yields nothing."""
    from django_datastream_spark.functions.text import chunk_documents

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    docs = spark.createDataFrame(
        [(1, words(100)), (2, words(10)), (3, words(64)),
         (4, words(65)), (5, "")],
        "doc_id long, text string",
    )
    out = {}
    for r in chunk_documents(docs, chunk_size=64, stride=48).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        )
        assert r["chunk_text"].split(" ")[0] == f"w{48 * r['chunk_idx']}"
    # 100 tokens: chunks at 0 (64 tok) and 48 (52 tok); start 96 would
    # only repeat tokens already inside chunk 1 -> dropped
    assert [(i, n) for i, n, _ in sorted(out[1])] == [(0, 64), (1, 52)]
    assert [(i, n) for i, n, _ in sorted(out[2])] == [(0, 10)]
    assert [(i, n) for i, n, _ in sorted(out[3])] == [(0, 64)]  # exact fit
    assert [(i, n) for i, n, _ in sorted(out[4])] == [(0, 64), (1, 17)]
    assert 5 not in out  # empty doc -> no chunks


def test_ewma_crafted(spark):
    from django_datastream_spark.operators import timeseries as tso
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # key 1 delivered out of order; recurrence must follow (ts, id)
        (1, 3, t0 + dt.timedelta(seconds=30), 30.0),
        (1, 1, t0, 10.0),
        (1, 2, t0 + dt.timedelta(seconds=10), 20.0),
        (2, 4, t0, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {r["event_id"]: r["ewma"] for r in tso.ewma(df, alpha=0.3).collect()}
    assert out[1] == pytest.approx(10.0)
    assert out[2] == pytest.approx(0.7 * 10 + 0.3 * 20)      # 13.0
    assert out[3] == pytest.approx(0.7 * 13 + 0.3 * 30)      # 18.1
    assert out[4] == pytest.approx(5.0)                      # fresh key


def test_pack_greedy_invariants_random(spark):
    """Invariants over a randomized corpus: (1) every pack except
    single-oversize-doc packs fits the cap; (2) pack indexes are dense
    0..max per group; (3) greedy is maximal — a doc never fits in the
    previous pack; (4) every doc is assigned exactly once."""
    import random

    from django_datastream_spark.operators import sampling as smp

    rnd = random.Random(77)
    rows = [
        (i, " ".join("w" for _ in range(rnd.randint(0, 30))), f"s{i % 4}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    cap = 48
    out = smp.pack_greedy(docs, max_tokens=cap).collect()
    assert len(out) == 200 and len({r["doc_id"] for r in out}) == 200
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    for g, rs in by_group.items():
        rs.sort(key=lambda r: r["doc_id"])
        packs: dict = {}
        for r in rs:
            packs.setdefault(r["pack_idx"], []).append(r["n_tokens"])
        assert sorted(packs) == list(range(len(packs))), g  # dense
        for idx, toks in packs.items():
            if len(toks) > 1:
                assert sum(toks) <= cap, (g, idx, toks)
            if idx + 1 in packs:  # maximality: next pack's head can't fit
                assert sum(toks) + packs[idx + 1][0] > cap, (g, idx)


def test_chunk_documents_full_coverage_random(spark):
    """Every token position is covered by ≥1 chunk, and removing each
    chunk's leading overlap reconstructs the document exactly — for a
    spread of (n_tokens, chunk_size, stride) shapes."""
    from django_datastream_spark.functions.text import chunk_documents

    for size, stride in ((64, 48), (32, 32), (10, 7)):
        rows = [
            (n, " ".join(f"t{n}_{i}" for i in range(n)))
            for n in (1, 5, size - 1, size, size + 1, 3 * stride, 100)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        chunks: dict = {}
        for r in chunk_documents(docs, chunk_size=size, stride=stride).collect():
            chunks.setdefault(r["doc_id"], {})[r["chunk_idx"]] = (
                r["chunk_text"].split(" ")
            )
        for n, _text in rows:
            got = chunks[n]
            rebuilt = list(got[0])
            for i in range(1, len(got)):
                overlap = len(rebuilt) - i * stride  # tokens already present
                rebuilt.extend(got[i][overlap:])
            assert rebuilt == [f"t{n}_{i}" for i in range(n)], (n, size, stride)


def _distinct_vocab_corpus(n_docs: int, n_dup_pairs: int):
    """Docs with pairwise-disjoint vocab (no shared shingles), all one
    source, all in one length band — the exact regime where
    source×length blocking alone degenerates to all-pairs — plus
    planted near-dup pairs."""
    rows = []
    for i in range(n_docs):
        text = " ".join(f"w{i:04d}x{j:02d}" for j in range(14))
        rows.append((i, text, "s1", len(text)))
    for k in range(n_dup_pairs):
        orig = rows[k][1]
        near = orig.rsplit(" ", 1)[0] + " zzchanged"
        rows.append((100_000 + k, near, "s1", len(near)))
    return rows


@pytest.mark.slow
def test_levenshtein_candidates_subquadratic(spark):
    """Candidate count is O(planted near-dups), flat in corpus size —
    not ∝N² as fixed-cardinality (source, length-band) blocking was
    (r4: 10× rows → 99× candidates). Doubling the distinct-doc corpus
    must not grow candidates."""
    small = spark.createDataFrame(
        _distinct_vocab_corpus(300, 5),
        "doc_id long, text string, source string, n_chars long",
    )
    big = spark.createDataFrame(
        _distinct_vocab_corpus(600, 5),
        "doc_id long, text string, source string, n_chars long",
    )
    c_small = dd.levenshtein_candidates(small).count()
    c_big = dd.levenshtein_candidates(big).count()
    # all 5 planted pairs are candidates; essentially nothing else is
    assert 5 <= c_small <= 20, c_small    # vs 300*299/2 ≈ 45k all-pairs
    assert 5 <= c_big <= 20, c_big        # vs 600*599/2 ≈ 180k
    assert c_big <= c_small + 5           # flat in N, not ∝N²
    # and the planted pairs all verify through the full operator
    found = {(r["a"], r["b"]) for r in
             dd.levenshtein_near_pairs(big, threshold=0.7).collect()}
    assert {(k, 100_000 + k) for k in range(5)} <= found


def test_hll_sketch_rollup_reaggregates_exactly(spark):
    """The q92 pattern: per-day HLL sketches merged with hll_union_agg
    must estimate IDENTICALLY to a one-shot sketch over the raw rows
    (register-max inserts are order/partition-independent), and land
    within the sketch's error bound of the exact distinct count."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_type", "ts", "user_id"
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = {
        r["event_type"]: r["est"]
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    oneshot = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged == oneshot  # re-aggregation is lossless
    for et, n in exact.items():
        assert abs(merged[et] - n) / n < 0.05, (et, merged[et], n)


def test_count_min_sketch_heavy_hitters_and_merge(spark):
    """The q92 pattern for FREQUENCIES: per-day count-min sketches built
    with F.count_min_sketch merge (JVM mergeInPlace) into the same
    counts a one-shot sketch gives, and every estimate obeys the CMS
    guarantee: exact <= est <= exact + eps*N (here eps=0.5%, N=1000,
    seed fixed so runs are deterministic). Finalization reads the
    sketch bytes back through Spark's own CountMinSketch class — the
    driver-side cost is |sketch| bytes, never |data|."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "user_id", "ts"
    )
    jvm = spark.sparkContext._jvm

    def read_cms(b: bytes):
        return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(b))
        )

    sk = F.count_min_sketch("user_id", F.lit(0.005), F.lit(0.01), F.lit(7))
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(sk.alias("sk"))
        .collect()
    )
    assert len(daily) > 1  # the merge below is real
    merged = read_cms(daily[0]["sk"])
    for r in daily[1:]:
        merged.mergeInPlace(read_cms(r["sk"]))

    oneshot = read_cms(ev.agg(sk.alias("sk")).collect()[0]["sk"])
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(exact.values())
    assert merged.totalCount() == oneshot.totalCount() == n_total
    eps_bound = 0.005 * n_total
    for uid, n in exact.items():
        est_m = merged.estimateCount(jvm.java.lang.Long(uid))
        est_o = oneshot.estimateCount(jvm.java.lang.Long(uid))
        assert est_m == est_o  # merge is lossless (same width/depth/seed)
        assert n <= est_m <= n + eps_bound, (uid, n, est_m)


def test_asof_join_forward_crafted(spark):
    from datetime import datetime as dt

    from django_datastream_spark.operators import timeseries as tso

    left = spark.createDataFrame(
        [
            (1, 7, dt(2024, 1, 1, 0, 0, 1)),   # next right is r@2 -> 20.0
            (2, 7, dt(2024, 1, 1, 0, 0, 3)),   # equal ts -> inclusive, 30.0
            (3, 7, dt(2024, 1, 1, 0, 0, 4)),   # after all rights -> null
            (4, 8, dt(2024, 1, 1, 0, 0, 0)),   # other key -> 80.0
            (5, 9, dt(2024, 1, 1, 0, 0, 0)),   # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (7, dt(2024, 1, 1, 0, 0, 2), 20.0),
            (7, dt(2024, 1, 1, 0, 0, 3), 30.0),
            (8, dt(2024, 1, 1, 0, 0, 5), 80.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in tso.asof_join(
            left, right, key="user_id", direction="forward"
        ).collect()
    }
    assert out[1]["value_asof"] == 20.0
    assert out[2]["value_asof"] == 30.0          # equal ts is inclusive
    assert out[3]["value_asof"] is None and out[3]["ts_asof"] is None
    assert out[4]["value_asof"] == 80.0
    assert out[5]["value_asof"] is None
    assert len(out) == 5

    # tolerance applies to the FORWARD gap
    tol = {
        r["event_id"]: r
        for r in tso.asof_join(
            left, right, key="user_id", direction="forward",
            tolerance_seconds=1.5,
        ).collect()
    }
    assert tol[1]["value_asof"] == 20.0          # gap 1s <= 1.5
    assert tol[4]["value_asof"] is None          # gap 5s > 1.5


def test_containment_catches_doc_contains_doc(spark):
    from django_datastream_spark.operators import dedup as dd

    big = " ".join(f"w{i}" for i in range(100))
    small = " ".join(f"w{i}" for i in range(40, 52))  # contiguous slice
    other = " ".join(f"x{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, big), (1, small), (2, other)], "doc_id long, text string"
    )
    cont = {
        (r["a"], r["b"]): r["containment"]
        for r in dd.containment_pairs(docs).collect()
    }
    jac = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dd.jaccard_pairs(docs).collect()
    }
    # the embedded doc is a PERFECT containment hit ...
    assert cont[(0, 1)] == 1.0
    # ... that symmetric jaccard scores far below any dedup threshold
    assert jac[(0, 1)] < 0.15
    # unrelated doc shares no shingles: not even a candidate pair
    assert (0, 2) not in cont and (1, 2) not in cont


def test_bigram_lm_scores_crafted_and_bounded(spark):
    from django_datastream_spark.functions import text as tx

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b b")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in tx.bigram_lm_scores(docs).collect()
    }
    # firsts: a×2, b×2; bigrams: "a b"×2, "b c"×1, "b b"×1 — both docs
    # score avg(ln(2/2), ln(1/2)) = −ln(2)/2
    import math

    expect = -math.log(2) / 2
    for d in (0, 1):
        assert got[d]["n_bigrams"] == 2
        assert abs(got[d]["avg_logp"] - expect) < 1e-9
    # MLE conditionals: count(bigram) ≤ count(first word) ⇒ logp ≤ 0,
    # for every doc in the real corpus too
    corpus = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bad = (
        tx.bigram_lm_scores(corpus)
        .filter(F.col("avg_logp") > 1e-12)
        .count()
    )
    assert bad == 0


def test_source_kl_divergence_gibbs(spark):
    from django_datastream_spark.functions import text as tx

    # identical per-source distributions ⇒ every KL term is ln(1) = 0
    same = spark.createDataFrame(
        [(0, "x y", "A"), (1, "x y", "B")],
        "doc_id long, text string, source string",
    )
    for r in tx.source_kl_divergence(same).collect():
        assert abs(r["kl"]) < 1e-12
    # Gibbs' inequality: KL(source ‖ corpus) ≥ 0 on the real corpus
    corpus = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    neg = (
        tx.source_kl_divergence(corpus)
        .filter(F.col("kl") < -1e-9)
        .count()
    )
    assert neg == 0


def test_chunk_dedup_rewrite_global_uniqueness(spark):
    """q132's survivors must collectively hold each distinct chunk
    exactly once: sum(n_kept) == |distinct chunks|, computed
    independently of the window/rewrite path."""
    from django_datastream_spark.functions import text as tx
    from django_datastream_spark.plans import declared

    out = declared.QUERIES["q132_chunk_dedup_rewrite"](
        spark, SF_SMOKE
    ).toPandas()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ch = tx.chunk_documents(docs, chunk_size=10, stride=10)
    n_distinct = ch.select("chunk_text").distinct().count()
    n_total = ch.count()
    assert int(out["n_kept"].sum()) == n_distinct
    assert int(out["n_chunks"].sum()) == n_total
    assert (out["n_kept"] <= out["n_chunks"]).all()


def test_pagerank_mass_conservation(spark):
    """Damped PageRank with in-plan teleport 0.15/N preserves unit
    probability mass when the graph has no dangling nodes (every
    co-occurrence node has out-edges): sum(pr) == 1 each iteration."""
    from django_datastream_spark.plans import declared

    out = declared.QUERIES["q145_token_pagerank"](
        spark, SF_SMOKE
    ).toPandas()
    assert abs(out["pr"].sum() - 1.0) < 1e-3  # rounded to 6dp per row
    assert (out["pr"] > 0).all()


def test_survivor_policies_non_vacuous_and_disagreeing(spark):
    """q149 must exercise its policy logic at the GATE scale: groups
    exist, and at least one group's keep-longest differs from
    keep-first (a vacuous empty-vs-empty hash match, or structurally
    identical policies, would pass the oracle while pinning
    nothing)."""
    from django_datastream_spark.plans import declared

    out = declared.QUERIES["q149_survivor_policies"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(out) > 0
    assert bool(out["policies_disagree"].any())
    assert (out["n_members"] > 1).all()


def test_bigram_lm_scale_invariance(spark):
    """Duplicating the whole corpus doubles every bigram AND every
    first-word count, so each MLE conditional — and every doc's mean
    log-prob — is unchanged.  A normalization bug (e.g. dividing by
    corpus totals instead of first-word counts) breaks this law."""
    from django_datastream_spark.functions import text as tx

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 50
    )
    twin = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    base = {
        r["doc_id"]: r["avg_logp"]
        for r in tx.bigram_lm_scores(docs).collect()
    }
    doubled = {
        r["doc_id"]: r["avg_logp"]
        for r in tx.bigram_lm_scores(
            docs.select("doc_id", "text").unionByName(twin)
        ).collect()
        if r["doc_id"] < 1000
    }
    assert set(base) == set(doubled)
    for k in base:
        assert abs(base[k] - doubled[k]) < 1e-9, k


def test_bm25_tf_monotonicity_crafted(spark):
    """Equal-length docs: more occurrences of a query term ⇒ strictly
    higher BM25 score (saturating but monotone in tf)."""
    from django_datastream_spark.plans.extensions import _bm25_scores

    filler = ["w"] * 10
    d0 = " ".join(["spark"] * 1 + filler + ["x"] * 2)   # 13 tokens
    d1 = " ".join(["spark"] * 3 + filler)               # 13 tokens
    docs = spark.createDataFrame(
        [(0, d0), (1, d1), (2, " ".join(filler))],
        "doc_id long, text string",
    )
    sc = {
        r["doc_id"]: r["score"]
        for r in _bm25_scores(docs, ["spark"]).collect()
    }
    assert sc[1] > sc[0] > 0
    assert 2 not in sc  # no query term -> no score row


def test_cumulative_distinct_users_consistency(spark):
    """q150 laws: cum_users is non-decreasing, increments by exactly
    new_users each day, and ends at the true global distinct count."""
    from django_datastream_spark.plans import declared

    out = declared.QUERIES["q150_cumulative_distinct_users"](
        spark, SF_SMOKE
    ).toPandas()
    assert (out["cum_users"].diff().dropna() >= 0).all()
    assert (
        out["cum_users"] == out["new_users"].cumsum()
    ).all()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    truth = ev.select("user_id").distinct().count()
    assert int(out["cum_users"].iloc[-1]) == truth


def test_centroid_drift_identity_law(spark):
    """q144's statistic: when every vector is identical, every label
    centroid IS the corpus centroid — cosine exactly 1 for all labels."""
    import pandas as pd
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(20),
                "embedding": [[1.0, 2.0, 3.0]] * 20,
                "label": [i % 4 for i in range(20)],
            }
        )
    )
    # same plan shape as q144's builder, on a crafted frame

    dims = emb.select(
        "label", F.posexplode("embedding").alias("i0", "v")
    ).select("label", (F.col("i0") + 1).alias("i"), "v")
    lc = dims.groupBy("label", "i").agg(
        F.avg("v").alias("m"), F.count(F.lit(1)).alias("n")
    )
    gc = lc.groupBy("i").agg(
        (F.sum(F.col("m") * F.col("n")) / F.sum("n")).alias("g")
    )
    dot = (
        lc.join(gc, "i")
        .groupBy("label")
        .agg(
            F.sum(F.col("m") * F.col("g")).alias("d"),
            F.sum(F.col("m") * F.col("m")).alias("mm"),
            F.sum(F.col("g") * F.col("g")).alias("gg"),
        )
    )
    for r in dot.collect():
        cos = r["d"] / (r["mm"] ** 0.5 * r["gg"] ** 0.5)
        assert abs(cos - 1.0) < 1e-12


def test_equidepth_bands_partition_laws(spark):
    """q131 laws: bands tile the value range in order (hi_i <= lo_{i+1})
    and the band counts sum to the table's row count."""
    from django_datastream_spark.plans import declared

    out = (
        declared.QUERIES["q131_equidepth_bands"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("band")
        .reset_index(drop=True)
    )
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    assert int(out["n"].sum()) == li.count()
    for i in range(len(out) - 1):
        assert out.loc[i, "hi"] <= out.loc[i + 1, "lo"] + 1e-9
