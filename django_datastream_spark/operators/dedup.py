"""Deduplication operators (extension surface — BASELINE north star).

Five families, each a single declarative Spark plan over all documents
(no driver loops, no Python in the hot path):

- exact:        md5/xxhash group-by, keep min id
- minhash LSH:  shingle → k seeded min-hashes → band buckets → candidate
                pairs → verified Jaccard
- simhash:      64-bit bit-vote signature via explode + 64 conditional sums
- n-gram Jaccard: inverted-index join on shingles (exact, for bounded sets)
- embedding cosine: LSH-bucketed or brute-force pair generation

Scale notes: every pairwise step is bounded — LSH band buckets cap the
candidate space; the brute-force variants exist as oracles/baselines for
bounded prefixes. Skewed buckets (a shingle shared by everything) are the
classic failure: candidates are generated from *bands of signatures*, not
raw shingles, so bucket size is controlled by (bands, rows) choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import fingerprint_md5, tokens, with_shingles, word_shingles

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest id per identical (normalized) text. Returns the
    surviving rows. One hash-aggregate shuffle on the fingerprint."""
    fp = fingerprint_md5(F.col(text_col)).alias("_fp")
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    return (
        docs.select("*", fp)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_fp", "_rk")
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def _md5_band_keys_expr(num_hashes: int, bands: int) -> Column:
    """``array(md5(concat_ws(',', h0, h1)), …)`` — one band key per
    ``rows``-wide signature slice, parsed as a SINGLE SQL string.

    Plan-BUILD time is real bench time (OPTIMIZATION_r11.md finding 3):
    assembling this array from Column objects costs ``bands×(rows+2)``
    py4j round trips per builder call; one ``F.expr`` parse is one.
    Bit-identical to the Column form — same parsed expression tree."""
    rows = num_hashes // bands
    slices = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"h{b * rows + r}" for r in range(rows))
        + "))"
        for b in range(bands)
    )
    return F.expr(f"array({slices})")


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signatures ARRAY<BIGINT>[num_hashes]) via k seeded xxhash64
    min-aggregations — one explode + one groupBy, all JVM-side."""
    sh = with_shingles(docs, shingle_n, text_col, id_col).select(
        F.col(id_col), F.explode_outer("_sh").alias("sh")
    )
    # ONE F.expr parse for the whole aggregate instead of ~5 py4j round
    # trips per hash (finding 3). The optimizer collapses the old
    # agg-then-Project(array) into exactly this Aggregate[array(min…)]
    # shape, so the optimized plan — and every row — is unchanged
    # (SQL integral literals parse as INT, same as F.lit(i)).
    mins = ", ".join(f"min(xxhash64(sh, {i}))" for i in range(num_hashes))
    return sh.groupBy(id_col).agg(F.expr(f"array({mins}) AS signatures"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Docs agreeing on all rows of ≥1 band → candidate pair (a < b).

    Band key = hash of the signature slice; self-join per (band, key)
    bucket. The join is an equi-join on the band key — Catalyst plans a
    shuffle-hash join whose width is the bucket size, never all-pairs.
    """
    # one selectExpr parse instead of ~15 py4j round trips assembling the
    # lambda chain (finding 3); same parsed higher-order expression
    bands_df = signatures.selectExpr(
        id_col,
        f"posexplode(transform(sequence(0, {bands - 1}), "
        f"b -> xxhash64(concat_ws(',', cast(slice(signatures, "
        f"cast(b * {rows_per_band} + 1 as int), {rows_per_band}) "
        f"as array<string>))))) AS (band, key)",
    )
    a = bands_df.select(
        F.col(id_col).alias("a"), F.col("band"), F.col("key")
    )
    b = bands_df.select(
        F.col(id_col).alias("b"), F.col("band"), F.col("key")
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate pairs (a, b) — or for
    ALL pairs sharing ≥1 shingle when pairs is None (inverted-index join;
    only safe on bounded inputs)."""
    sets_df = with_shingles(docs, shingle_n, text_col, id_col).select(
        F.col(id_col).alias("_id"), F.col("_sh")
    )
    if pairs is None:
        inv = sets_df.select("_id", F.explode("_sh").alias("s"))
        pairs = (
            inv.alias("x")
            .join(inv.alias("y"), "s")
            .filter(F.col("x._id") < F.col("y._id"))
            .select(
                F.col("x._id").alias("a"), F.col("y._id").alias("b")
            )
            .distinct()
        )
    a_sets = sets_df.select(F.col("_id").alias("a"), F.col("_sh").alias("_sha"))
    b_sets = sets_df.select(F.col("_id").alias("b"), F.col("_sh").alias("_shb"))
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size(F.array_distinct(F.concat("_sha", "_shb")))
    return (
        pairs.join(a_sets, "a")
        .join(b_sets, "b")
        .select(
            "a",
            "b",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with verified Jaccard ≥ threshold, found via
    MinHash LSH candidates. Returns (a, b, jaccard)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    cand = lsh_candidate_pairs(sig, id_col, bands, rows_per_band)
    verified = jaccard_pairs(docs, cand, text_col, id_col, shingle_n)
    return verified.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# portable (md5-based) twins — driver-oracle-checkable
# ---------------------------------------------------------------------------


def minhash_signatures_md5(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Portable twin of :func:`minhash_signatures`: per-seed min-hash =
    the lexicographic MIN of ``md5(seed || ':' || shingle)`` hex strings.
    md5 exists bit-identically in every engine (DuckDB included), so an
    external SQL oracle can reproduce the whole signature — unlike the
    xxhash64 fast path. Same plan shape: one explode + one groupBy with
    ``num_hashes`` min-aggregations, all JVM-side."""
    sh = with_shingles(docs, shingle_n, text_col, id_col).select(
        F.col(id_col), F.explode("_sh").alias("sh")
    )
    # one parse per agg instead of ~5 py4j round trips each (finding 3)
    aggs = [
        F.expr(f"min(md5(concat('{i}:', sh))) AS h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_dedup_md5(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Portable twin of :func:`minhash_lsh_dedup` (same LSH pipeline
    shape — signatures → band buckets → equi-join candidates → verified
    Jaccard) built entirely from md5 so the driver's DuckDB oracle can
    hash-verify it end to end. Band key = md5 of the comma-joined
    signature slice. Returns (a, b, jaccard ≥ threshold)."""
    rows = num_hashes // bands
    if rows * bands != num_hashes:
        raise ValueError("rows * bands must equal num_hashes")
    sig = minhash_signatures_md5(docs, text_col, id_col, num_hashes, shingle_n)
    band_keys = _md5_band_keys_expr(num_hashes, bands)
    banded = sig.select(
        F.col(id_col).alias("_id"), F.posexplode(band_keys).alias("band", "bkey")
    )
    cand = (
        banded.select(F.col("_id").alias("a"), "band", "bkey")
        .join(banded.select(F.col("_id").alias("b"), "band", "bkey"), ["band", "bkey"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    verified = jaccard_pairs(docs, cand, text_col, id_col, shingle_n)
    return verified.filter(F.col("jaccard") >= threshold)


def simhash_md5(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Portable twin of :func:`simhash`: a ``bits``-bit (≤16) bit-vote
    signature where token-hash bit *i* is bit ``3 - i%4`` of hex digit
    ``i//4`` of ``md5(token)`` — pure string/arithmetic ops an external
    SQL oracle reproduces exactly. Same plan: explode tokens → one
    groupBy with ``bits`` conditional ±1 sums → bit reassembly."""
    if bits > 16:
        raise ValueError("bits must be <= 16")
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.md5("tok"))
    # r11: expr-string form (see simhash) — one parse per aggregate
    # instead of ~6 py4j round trips per bit per plan build
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftright(cast(conv(substring(h, {i // 4 + 1}, 1),"
            f" 16, 10) as int), {3 - i % 4}) & 1) = 1 THEN 1 ELSE -1 END)"
            f" AS s{i}"
        )
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    )
    return agg.select(
        id_col, F.expr(f"cast(({sig}) as bigint) AS simhash16")
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, simhash BIGINT): per-bit majority vote over token xxhash64s.

    Native plan: explode tokens → one groupBy with ``bits`` conditional
    sums (+1/−1 per bit) → reassemble the signature with bit arithmetic.
    """
    toks = docs.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    # r11: the 64 vote aggregates and the signature reassembly are
    # parsed as SQL strings — the Column-API form issued ~800 py4j
    # round trips PER PLAN BUILD (measured 2.0 s of driver time per
    # bench invocation before any job ran; 0.33 s as expr strings,
    # identical plan and bit-identical output)
    votes = [
        F.expr(
            f"sum(CASE WHEN h IS NULL THEN 0 "
            f"WHEN (shiftright(h, {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        )
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = " | ".join(
        f"(CASE WHEN b{i} > 0 THEN shiftleft(cast(1 as bigint), {i}) "
        f"ELSE cast(0 as bigint) END)"
        for i in range(bits)
    )
    return agg.select(id_col, F.expr(f"({sig}) AS simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, blocked on 4 16-bit
    chunks (any pair within hamming ≤ 3 of a 64-bit hash agrees on ≥1 of
    4 chunks — pigeonhole), so the join is equi on a chunk, never all-pairs."""
    sig = simhash(docs, text_col, id_col)
    chunks = sig.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).cast("long")
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("_sa"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("_sb"), "chunk_idx", "chunk"
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", hamming_distance(F.col("_sa"), F.col("_sb")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    small_edge_cap: int = 100_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every doc gets
    ``cluster_id`` = the minimum doc id in its component (the canonical
    survivor a training pipeline keeps). Returns (id, cluster_id).

    Spark-first iterative shape (Spark has no recursive SQL): min-label
    propagation to fixpoint with a pointer-doubling hop — each round is
    (1) neighbor-min over the edge set (one join + one aggregation) then
    (2) label-of-label path halving (one self-join on the label table),
    with lineage pinned per round (localCheckpoint) and a driver-side
    convergence check, the GraphX/Pregel + hash-to-min pattern. Both
    steps only ever DECREASE a label to another node id in the same
    component, so the fixpoint is exactly the per-component minimum; the
    doubling step makes a chain of length L converge in O(log L) rounds
    instead of L (pinned by a 200-node-path test).

    The iteration runs over EDGE ENDPOINTS only, not the corpus: a doc
    in no near-dup pair is trivially its own singleton cluster, so it
    joins back once at the end (left join + coalesce) instead of riding
    every round. At 100 TB the label table is O(near-dup nodes) — tiny
    under LSH blocking — and the per-round joins never touch corpus-
    sized data. The round count of the last call is exposed as
    ``dedup_clusters.last_rounds`` (diagnostic/testing).

    Size-adaptive (r11, guide §2/§3 "derive from input size"): when the
    deduplicated edge set is at most ``small_edge_cap`` rows (counted on
    the already-pinned checkpoint, one tiny job), the components are
    solved with a driver-side union-find and shipped back as a
    broadcast-sized label table — the same bounded-collect class as a
    broadcast join's build side (~MBs at the default cap), and the exact
    same labels. Above the cap the distributed fixpoint runs unchanged;
    ``small_edge_cap=0`` forces it (used by the convergence tests)."""
    und = (
        pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(pairs.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if small_edge_cap > 0 and und.count() <= small_edge_cap:
        parent: dict = {}

        def _find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for r in und.collect():
            x, y = r["x"], r["y"]
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            rx, ry = _find(x), _find(y)
            if rx != ry:
                parent[ry] = rx
        comp_min: dict = {}
        for v in parent:
            root = _find(v)
            m = comp_min.get(root)
            if m is None or v < m:
                comp_min[root] = v
        dedup_clusters.last_rounds = 0
        spark = docs.sparkSession
        x_type = und.schema["x"].dataType
        labels = spark.createDataFrame(
            [(v, comp_min[_find(v)]) for v in parent],
            T.StructType(
                [T.StructField("x", x_type), T.StructField("_mn", x_type)]
            ),
        ).select("x", F.col("_mn").cast("long").alias("cluster_id"))
        return docs.select(F.col(id_col)).join(
            F.broadcast(labels).withColumnRenamed("x", id_col), id_col, "left"
        ).select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col).cast("long")).alias(
                "cluster_id"
            ),
        )
    labels = (
        und.select("x")
        .distinct()
        .select("x", F.col("x").cast("long").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while True:
        rounds += 1
        nbr = (
            und.join(
                labels.select(F.col("x").alias("y"), F.col("cluster_id").alias("_nl")),
                "y",
            )
            .groupBy("x")
            .agg(F.min("_nl").alias("_nl"))
        )
        hop1 = labels.join(nbr, "x", "left").select(
            "x",
            F.col("cluster_id").alias("_pre"),
            F.least(
                F.col("cluster_id"), F.coalesce("_nl", F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        # path halving: follow the label pointer one more step —
        # label(x) := min(label(x), label(label(x))). label(x) is itself a
        # node id, so the lookup is a self-join on the label table.
        lmap = hop1.select(
            F.col("x").alias("_cx"), F.col("cluster_id").alias("_ll")
        )
        # r11 (guide §1.2 — fewer driver-orchestrated jobs per round):
        # the convergence probe rides the SAME materialization — the
        # pre-round label (`_pre`, labels.cluster_id carried through
        # both joins) makes `changed` a filter over the persisted
        # frame, replacing the old-vs-new shuffle join the pre-r11
        # shape ran as a second job per round
        new_labels = (
            hop1.join(lmap, hop1["cluster_id"] == lmap["_cx"], "left")
            .select(
                "x",
                "_pre",
                F.least(
                    F.col("cluster_id"), F.coalesce("_ll", F.col("cluster_id"))
                ).alias("_half"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_half") != F.col("_pre")).head(1)
        labels = new_labels.select("x", F.col("_half").alias("cluster_id"))
        if not changed:
            break
    dedup_clusters.last_rounds = rounds
    return docs.select(F.col(id_col)).join(
        labels.select(F.col("x").alias(id_col), "cluster_id"), id_col, "left"
    ).select(
        id_col,
        F.coalesce("cluster_id", F.col(id_col).cast("long")).alias("cluster_id"),
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_near_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 56,
    bands: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """The 100 TB form of ``cosine_near_pairs``: random-hyperplane band
    blocking generates candidate pairs with an equi self-join on
    (band, key) — never all-pairs — then exact cosine verifies against
    ``threshold``. Candidates carry only id pairs through the dedup
    shuffle; vectors re-attach afterwards. Approximate on the candidate
    side (a pair at angle θ collides on ≥1 band w.p.
    1−(1−(1−θ/π)^r)^b): identical vectors always collide, recall decays
    with angle — tune (n_planes, bands) per threshold. Returned cosines
    are exact. Returns (a, b, cosine).

    Defaults give r = n_planes/bands = 7 bits per band (128 buckets per
    band), so arbitrary pairs almost never collide while near pairs
    still do: analytically, ≥1-band collision probability is ≈0.96 at
    cosine 0.90 and ≈0.91 at 0.85; measured recall on planted near-dups
    at cosine 0.85–0.98 is pinned ≥0.85 by
    tests/test_extensions.py::test_cosine_near_pairs_lsh_near_dup_recall.
    (The old default of 2 bits per band made candidate generation
    effectively all-pairs — 4 buckets per band.)"""
    from .similarity import _hyperplanes, rp_signature_udf

    if n_planes % bands != 0:
        raise ValueError("n_planes must be divisible by bands")
    rows = n_planes // bands
    sig_udf = rp_signature_udf(_hyperplanes(dim, n_planes, seed))
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
    banded = emb.select(
        F.col(id_col).alias("_id"), F.posexplode(band_arr).alias("band", "key")
    )
    cand = (
        banded.select(F.col("_id").alias("a"), "band", "key")
        .join(banded.select(F.col("_id").alias("b"), "band", "key"), ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    av = emb.select(F.col(id_col).alias("a"), v.alias("_va")).withColumn(
        "_na", F.sqrt(_dot(F.col("_va"), F.col("_va")))
    )
    bv = emb.select(F.col(id_col).alias("b"), v.alias("_vb")).withColumn(
        "_nb", F.sqrt(_dot(F.col("_vb"), F.col("_vb")))
    )
    return (
        cand.join(av, "a")
        .join(bv, "b")
        .select(
            "a",
            "b",
            (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_near_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — brute force; intended
    for bounded prefixes or as the verify step after LSH blocking."""
    e = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_n", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    a = e.select(F.col("_id").alias("a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = e.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def levenshtein_candidates(
    docs: DataFrame,
    block_cols: tuple[str, ...] = ("source",),
    length_band: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate (a, b) pairs for fuzzy dedup: pairs must share
    ``block_cols`` AND a length band AND a minhash band.

    Content-derived blocking is what keeps this sub-quadratic: a fixed
    (source × length-band) key has *constant cardinality*, so block
    population — and candidate pairs — grow quadratically with corpus
    size. The md5-minhash band key (the q48 pipeline's signature
    machinery, :func:`minhash_signatures_md5`) has cardinality that
    grows WITH the corpus: only docs with genuinely overlapping shingle
    sets collide (an r-row band collides w.p. jaccard^r), so expected
    block size is O(near-dup cluster), independent of corpus size.

    Length banding is phase-offset doubled (offsets 0 and band/2, the
    q44 sliding-window trick): any pair within ``length_band``/2 chars
    of each other shares a band at ≥1 offset, so boundary-straddling
    near-dups are not lost to the bucket edge.

    The join is equi on (block_cols, offset, length-band, band, bkey) —
    ids only, texts re-attach downstream; 2×``bands`` rows per doc.
    Docs with fewer than ``shingle_n`` tokens have no signature and drop
    out (their near-dups are exact-dedup territory). Returns distinct
    (a, b) with a < b.
    """
    if (num_hashes // bands) * bands != num_hashes:
        raise ValueError("rows * bands must equal num_hashes")
    sig = minhash_signatures_md5(docs, text_col, id_col, num_hashes, shingle_n)
    band_keys = _md5_band_keys_expr(num_hashes, bands)
    banded = sig.select(F.col(id_col).alias("_id"), band_keys.alias("_bk"))
    half = length_band // 2
    lbs = F.array(
        F.floor(F.col(len_col) / length_band),
        F.floor((F.col(len_col) - half) / length_band),
    )
    keyed = (
        docs.select(F.col(id_col).alias("_id"), *block_cols, lbs.alias("_lbs"))
        .join(banded, "_id")
        .select(
            "_id",
            *block_cols,
            F.posexplode("_lbs").alias("off", "_lb"),
            F.col("_bk"),
        )
        .select(
            "_id", *block_cols, "off", "_lb", F.posexplode("_bk").alias("band", "bkey")
        )
    )
    key = [*block_cols, "off", "_lb", "band", "bkey"]
    a = keyed.select(F.col("_id").alias("a"), *key)
    b = keyed.select(F.col("_id").alias("b"), *key)
    return (
        a.join(b, key)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def levenshtein_near_pairs(
    docs: DataFrame,
    threshold: float = 0.4,
    block_cols: tuple[str, ...] = ("source",),
    length_band: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Fuzzy near-duplicate pairs by normalized edit similarity
    ``1 − lev(a,b) / max(len)``, ≥ ``threshold``, over
    :func:`levenshtein_candidates` blocking (source + dual-offset
    length band + md5-minhash band — see that docstring for why this
    stays sub-quadratic at corpus scale).

    Per-pair cost is bounded three ways before any DP runs:
    - length-difference prefilter: ``|len_a − len_b| ≤ (1−θ)·max_len``
      (edit distance ≥ length gap, so this is *sound* — it can only
      discard pairs already below threshold), applied on the ids+lengths
      table before texts attach;
    - thresholded ``levenshtein(a, b, k)`` with the same
      ``k = ⌊(1−θ)·max_len⌋`` bound — Spark's banded early-exit DP
      (O(k·min_len), returns −1 past the bound) instead of the full
      O(n·m) table;
    - texts only ever co-locate for surviving candidates (ids-only
      through the blocking shuffle).

    Returns (a, b, dist, sim). Recall contract: a qualifying pair is
    found iff it shares a block — near-identical docs nearly always do
    (band collision w.p. jaccard^r per band); low-overlap pairs that
    still pass a loose sim threshold may not, which is the documented
    approximation every LSH-family dedup makes.
    """
    cand = levenshtein_candidates(
        docs, block_cols, length_band, text_col, id_col, len_col,
        num_hashes, bands, shingle_n,
    )
    meta = docs.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_t"),
        F.length(text_col).alias("_len"),
    )
    la, lb = F.col("_la"), F.col("_lb_len")
    mx = F.greatest(la, lb)
    # +1e-9 guards the float representation of (1-θ) (0.6*10 = 5.999…)
    bound = F.floor((F.lit(1.0) - F.lit(threshold)) * mx + F.lit(1e-9))
    withlen = (
        cand.join(meta.select(F.col("_id").alias("a"), F.col("_len").alias("_la")), "a")
        .join(meta.select(F.col("_id").alias("b"), F.col("_len").alias("_lb_len")), "b")
        .filter(F.abs(la - lb) <= bound)
    )
    texts_a = meta.select(F.col("_id").alias("a"), F.col("_t").alias("_ta"))
    texts_b = meta.select(F.col("_id").alias("b"), F.col("_t").alias("_tb"))
    dist = F.call_function(
        "levenshtein", F.col("_ta"), F.col("_tb"), bound.cast("int")
    )
    return (
        withlen.join(texts_a, "a")
        .join(texts_b, "b")
        .select(
            "a",
            "b",
            dist.cast("long").alias("dist"),
            (F.lit(1.0) - dist / mx).alias("sim"),
        )
        .filter((F.col("dist") >= 0) & (F.col("sim") >= F.lit(threshold)))
    )


def containment_pairs(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Overlap-coefficient near-dup pairs: |A∩B| / min(|A|,|B|) over
    shingle sets — the asymmetric measure that catches doc-contains-doc
    (a page embedding a whole smaller page scores ~1.0 here but low
    Jaccard, so symmetric dedup misses it). Candidate generation is the
    same inverted-index equi-join as :func:`jaccard_pairs` (or caller-
    provided pairs, e.g. from minhash bands, at scale)."""
    sets_df = with_shingles(docs, shingle_n, text_col, id_col).select(
        F.col(id_col).alias("_id"), F.col("_sh")
    )
    if pairs is None:
        inv = sets_df.select("_id", F.explode("_sh").alias("s"))
        pairs = (
            inv.alias("x")
            .join(inv.alias("y"), "s")
            .filter(F.col("x._id") < F.col("y._id"))
            .select(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
            .distinct()
        )
    a_sets = sets_df.select(F.col("_id").alias("a"), F.col("_sh").alias("_sha"))
    b_sets = sets_df.select(F.col("_id").alias("b"), F.col("_sh").alias("_shb"))
    inter = F.size(F.array_intersect("_sha", "_shb"))
    mn = F.least(F.size("_sha"), F.size("_shb"))
    return (
        pairs.join(a_sets, "a")
        .join(b_sets, "b")
        .select(
            "a",
            "b",
            F.when(mn > 0, inter / mn).otherwise(F.lit(0.0)).alias(
                "containment"
            ),
        )
    )
