"""Benchmark decontamination (SURVEY §2.10 extension surface — the
"remove eval overlap from the training corpus" step every serious LLM
data pipeline runs between dedup and tokenization; the published recipe
is word-n-gram overlap against the benchmark text).

Scale shape (the 100 TB case): the *eval* side is a benchmark suite —
megabytes, not terabytes — so its distinct n-gram set is broadcast and
the training corpus is scanned exactly once, map-side. The only shuffle
is the per-document aggregation of *hit* rows (a small fraction of the
corpus). No all-pairs anything.

Join keys are the gram strings themselves by default, which keeps the
operator bit-portable to the DuckDB oracle (q54). At cluster scale pass
``hashed=True`` to join on ``xxhash64(gram)`` instead: 8-byte keys
shrink the broadcast ~10x, at the cost of a vanishing (~n_grams^2 / 2^64)
false-collision probability — the standard trade for decontamination,
where a rare false positive only drops one extra training doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx


def eval_ngrams(
    eval_docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Distinct word-``n``-gram set of the eval/benchmark documents.

    One column ``gram`` (string, or long when ``hashed``). Small by
    construction (benchmark suites are tiny relative to the corpus);
    callers broadcast it.
    """
    out = tx.with_shingles(
        eval_docs.select(F.lit(0).alias("__id"), text_col),
        n, text_col, "__id", distinct=False,
    ).select(F.explode("_sh").alias("gram"))
    if hashed:
        out = out.select(F.xxhash64("gram").alias("gram"))
    return out.distinct()


def flag_contaminated(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """Flag training documents that share ≥ ``min_shared`` distinct word
    ``n``-grams with any eval document.

    Returns ``train`` + ``n_shared`` (distinct overlapping grams, 0 when
    clean) + ``contaminated`` (bool). Plan: explode train grams
    (distinct per doc) → broadcast-join the eval gram set → count hits
    per doc → left-join back onto ``train``. The corpus-wide scan stays
    in whole-stage codegen; only hit rows shuffle.
    """
    train_grams = tx.with_shingles(train, n, text_col, id_col).select(
        F.col(id_col), F.explode("_sh").alias("gram")
    )
    if hashed:
        train_grams = train_grams.select(
            id_col, F.xxhash64("gram").alias("gram")
        )
    ev = F.broadcast(eval_ngrams(eval_docs, n, text_col, hashed))
    hits = (
        train_grams.join(ev, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        train.join(hits, id_col, "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_shared") >= F.lit(min_shared))
    )


def fuzzy_contaminated(
    train: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuzzy benchmark decontamination: flag training documents that are
    NEAR-duplicates of any eval document (verified shingle Jaccard ≥
    ``threshold``), not just exact n-gram overlappers — the step
    published corpus recipes run when benchmarks leak through paraphrase
    or formatting drift that :func:`flag_contaminated` (exact grams)
    misses.

    Shape: md5-minhash band signatures on BOTH sides (the q48/q59
    machinery, :func:`~..dedup.minhash_signatures_md5`), candidates from
    an equi-join on (band, key) — cross-corpus, never all-pairs — then
    exact Jaccard verification on candidates only. The eval side is a
    benchmark suite (tiny), so its banded signature table broadcasts;
    the corpus is scanned once for signatures and once for candidate
    verification. Band-collision recall at the default 8 bands × 2 rows
    is 1−(1−j²)^8 (≈0.90 at j=0.5, ≈0.995 at j=0.7); the blocking
    contract is replicated by the q72 oracle. Returns ``train`` ids +
    ``n_matches``, ``max_jaccard``, ``contaminated``."""
    from ..functions.text import with_shingles
    from .dedup import _md5_band_keys_expr, minhash_signatures_md5

    rows = num_hashes // bands
    if rows * bands != num_hashes:
        raise ValueError("rows * bands must equal num_hashes")

    def banded(docs: DataFrame, alias: str) -> DataFrame:
        sig = minhash_signatures_md5(docs, text_col, id_col, num_hashes, n)
        keys = _md5_band_keys_expr(num_hashes, bands)
        return sig.select(
            F.col(id_col).alias(alias), F.posexplode(keys).alias("band", "bkey")
        )

    cand = (
        banded(train, "t_id")
        .join(F.broadcast(banded(eval_docs, "e_id")), ["band", "bkey"])
        .select("t_id", "e_id")
        .distinct()
    )
    tsh = with_shingles(train, n, text_col, id_col).select(
        F.col(id_col).alias("t_id"), F.col("_sh").alias("_sht")
    )
    esh = with_shingles(eval_docs, n, text_col, id_col).select(
        F.col(id_col).alias("e_id"), F.col("_sh").alias("_she")
    )
    inter = F.size(F.array_intersect("_sht", "_she"))
    union = F.size(F.array_distinct(F.concat("_sht", "_she")))
    j = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    hits = (
        cand.join(tsh, "t_id")
        .join(F.broadcast(esh), "e_id")
        .select("t_id", j.alias("_j"))
        .filter(F.col("_j") >= F.lit(threshold))
        .groupBy("t_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.max("_j").alias("max_jaccard"),
        )
    )
    return (
        train.select(F.col(id_col))
        .join(hits.withColumnRenamed("t_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def semantic_contaminated(
    train: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Semantic (embedding-space) decontamination — the third leg after
    exact n-gram overlap (:func:`flag_contaminated`) and fuzzy minhash
    (:func:`fuzzy_contaminated`): flags train items whose embedding
    sits within cosine ``threshold`` of ANY eval item, catching
    paraphrases that share no surface n-grams at all.

    The eval side is small by construction (it's a benchmark), so it
    broadcasts and the scoring pass is a map-side nested loop over the
    train corpus — no shuffle touches the big side. At extreme eval
    sizes, pre-bucket both sides with the RP-LSH signature
    (similarity.rp_signature) and band-join instead.

    Returns (train id, eval id, cosine) pairs at or above threshold.
    """
    from .similarity import _dot

    t = train.select(
        F.col(id_col).alias("t_id"),
        F.col(vec_col).cast("array<double>").alias("_tv"),
    ).withColumn("_tn", F.sqrt(_dot(F.col("_tv"), F.col("_tv"))))
    e = evalset.select(
        F.col(id_col).alias("e_id"),
        F.col(vec_col).cast("array<double>").alias("_ev"),
    ).withColumn("_en", F.sqrt(_dot(F.col("_ev"), F.col("_ev"))))
    return (
        t.crossJoin(F.broadcast(e))
        .select(
            "t_id",
            "e_id",
            (
                _dot(F.col("_tv"), F.col("_ev"))
                / (F.col("_tn") * F.col("_en"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
