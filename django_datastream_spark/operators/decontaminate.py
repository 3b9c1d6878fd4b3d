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
