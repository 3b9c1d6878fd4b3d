"""Exact duplicate *span* mining — word-n-gram granularity dedup.

Doc-level dedup (operators/dedup.py) removes whole near-identical
documents; training corpora additionally carry *partial* overlap —
boilerplate headers, quoted passages, templated sentences — that
survives doc-level dedup.  The standard remedy (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") finds
exact substrings repeated across documents and masks or drops them.
This module is that operator at word-n-gram granularity, built from
one explode + one hash aggregation:

1. every document emits its ``n``-gram spans (position-tagged),
2. a gram is *duplicated* if it occurs in >= ``min_docs`` distinct docs,
3. per-doc coverage = fraction of token positions inside any
   duplicated span — the "how much of this doc is boilerplate" score
   a quality filter thresholds on.

Scale shape (100 TB): the explode is linear in corpus token count;
grams travel as md5 digests (fixed 32 bytes, never the span text), so
the duplicate-detection shuffle keys are bounded and skew-resistant.
The gram->dup membership join is a plain shuffle join on the digest;
at extreme scale the dup set can be bloom-filtered map-side first.
No window over the corpus, no driver-side state.

Reference parity: the reference exposes no span-level dedup
(SURVEY §2.10 lists doc-level only); this is one of the
beyond-reference LLM-pipeline operators the brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, shingles_from_tokens


def ngram_positions(
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, gram_h): every word ``n``-gram of every doc with its
    0-based start token position and md5 digest.  One narrow explode —
    no shuffle."""
    tk = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(shingles_from_tokens(tk, n)).alias("pos", "gram"),
    ).select("_id", "pos", F.md5("gram").alias("gram_h"))


def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 12,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Spans repeated across documents: (gram_h, n_docs, n_occ) for
    every ``n``-gram occurring in >= ``min_docs`` distinct documents.

    One explode + one hash aggregation on the gram digest (map-side
    partials apply); the HAVING filter runs inside the aggregation, so
    only duplicated grams survive the shuffle boundary.
    """
    g = ngram_positions(docs, n, id_col, text_col)
    return (
        g.groupBy("gram_h")
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def span_dup_coverage(
    docs: DataFrame,
    n: int = 12,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span coverage:
    (id, n_tokens, covered, dup_ratio) where ``covered`` counts token
    positions lying inside at least one duplicated ``n``-gram.

    Overlapping duplicated spans are merged by counting *distinct*
    covered positions (sequence-explode + distinct), so the ratio is a
    true coverage fraction in [0, 1], not an occurrence count.  Plan:
    explode -> agg (dup set) -> shuffle join on digest -> explode the
    n positions per hit -> distinct -> count.  Every stage is keyed on
    either the digest or the doc id; nothing is corpus-global.
    """
    g = ngram_positions(docs, n, id_col, text_col)
    dup = (
        g.groupBy("gram_h")
        .agg(F.countDistinct("_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gram_h")
    )
    covered = (
        g.join(dup, "gram_h")
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("tok"),
        )
        .distinct()
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("covered"))
    )
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return (
        base.join(covered, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("covered"), F.lit(0)).cast("long").alias("covered"),
            F.round(
                F.coalesce(F.col("covered"), F.lit(0))
                / F.nullif(F.col("n_tokens"), F.lit(0)),
                4,
            ).alias("dup_ratio"),
        )
    )
