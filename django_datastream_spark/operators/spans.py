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

from pyspark.sql import DataFrame, Window
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

    Overlapping duplicated spans are merged by an interval-union fold
    over each doc's sorted duplicated-gram start positions: for sorted
    starts p₁<p₂<…, covered = Σ min(pᵢ₊₁−pᵢ, n) + n — exactly the
    count of distinct covered positions, computed without materializing
    them.  Plan (optimization r11, guide §2.3/§2.4): ONE hash
    aggregation on the gram digest carries each gram's occurrence list
    through the shuffle alongside its distinct-doc count, so the gram
    table (tokenize + shingle + md5, the expensive subtree) is computed
    once — the previous agg-then-self-join shape recomputed it for the
    join probe side — and the former n-way position explode + distinct
    exchange on (doc, position) collapses into a per-doc fold over
    start positions (measured 5.2 s → 2.2 s at sf0.1, output
    bit-equal).  Every stage is keyed on either the digest or the doc
    id; nothing is corpus-global.  A pathological hot gram concentrates
    its occurrence list in one aggregation buffer, the same skew the
    join shape had at the probe side; ObjectHashAggregate falls back to
    sort-based aggregation (which spills) past
    ``spark.sql.objectHashAggregate.sortBased.fallbackThreshold``.
    """
    g = ngram_positions(docs, n, id_col, text_col)
    hits = (
        g.groupBy("gram_h")
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.collect_list(F.struct("_id", "pos")).alias("_hits"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(F.explode("_hits").alias("h"))
        .select(F.col("h._id").alias("_id"), F.col("h.pos").alias("pos"))
    )
    # interval-union fold: prev starts at -n so the first span always
    # contributes exactly n
    union_len = F.aggregate(
        F.sort_array(F.collect_set("pos")),
        F.struct(F.lit(-n).alias("prev"), F.lit(0).cast("long").alias("tot")),
        lambda acc, p: F.struct(
            p.alias("prev"),
            (acc["tot"] + F.least(p - acc["prev"], F.lit(n))).alias("tot"),
        ),
        lambda acc: acc["tot"],
    )
    covered = hits.groupBy("_id").agg(union_len.alias("covered"))
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


def longest_shared_spans(
    docs: DataFrame,
    min_tokens: int = 12,
    cap: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Suffix-sort shared-span mining (the word-level analogue of the
    suffix-array dedup in Lee et al. 2022): find cross-document shared
    token spans of ARBITRARY length up to ``cap``, where the fixed-n
    detector above can only answer "shares a 12-gram yes/no".

    Construction: every token position emits its suffix truncated to
    ``cap`` tokens; suffixes sort lexicographically and each compares
    with its predecessor via longest-common-prefix.  The sort is NOT a
    global single-reducer window: suffixes partition by their first
    two tokens, and within-bucket order is total — an adjacent pair
    straddling a bucket boundary shares < 2 tokens, far below any
    useful ``min_tokens``, so bucketing loses nothing.  Returns
    (a, b, span_tokens) doc pairs with max adjacent-suffix LCP >=
    ``min_tokens``.

    Semantics note: comparing only ADJACENT suffixes makes every
    reported span genuine and makes the global maximum exact (between
    any two sorted cross-doc suffixes with common prefix L some
    adjacent cross-doc pair also shares >= L), but a specific pair's
    value can under-report if a third document's suffixes interleave
    — the standard suffix-array trade.  Scale: suffix volume is
    corpus tokens x 1 row (cap-bounded arrays), the sort shuffles
    once on (w1, w2) prefix buckets, and the per-row LCP is O(cap**2)
    list work — constant per row, no pairwise blowup.
    """
    if min_tokens < 2:
        # ValueError, not assert: python -O strips asserts, and a
        # skipped check here returns silently INCOMPLETE pairs
        raise ValueError("bucketing assumes min_tokens >= 2")
    tk = tokens(F.col(text_col))
    d = docs.select(F.col(id_col).alias("_id"), tk.alias("ts"))
    sfx = (
        d.filter(F.size("ts") >= min_tokens)
        .select(
            "_id",
            F.explode(
                F.sequence(F.lit(1), F.size("ts") - F.lit(min_tokens - 1))
            ).alias("p"),
            "ts",
        )
        .select(
            "_id",
            F.slice("ts", F.col("p"), F.lit(cap)).alias("sfx"),
        )
        .select(
            "_id",
            "sfx",
            F.array_join("sfx", " ").alias("sk"),
            F.element_at("sfx", 1).alias("w1"),
            F.element_at("sfx", 2).alias("w2"),
        )
    )
    w = Window.partitionBy("w1", "w2").orderBy("sk", "_id")
    lagged = sfx.select(
        "_id",
        "sfx",
        F.lag("_id").over(w).alias("pd"),
        F.lag("sfx").over(w).alias("ps"),
    ).filter(F.col("pd").isNotNull() & (F.col("pd") != F.col("_id")))
    m = F.least(F.size("sfx"), F.size("ps"))
    lcp = F.size(
        F.filter(
            F.sequence(F.lit(1), m),
            lambda i: F.slice("sfx", F.lit(1), i)
            == F.slice("ps", F.lit(1), i),
        )
    )
    return (
        lagged.select(
            F.least("_id", "pd").alias("a"),
            F.greatest("_id", "pd").alias("b"),
            lcp.alias("l"),
        )
        .groupBy("a", "b")
        .agg(F.max("l").cast("long").alias("span_tokens"))
        .filter(F.col("span_tokens") >= min_tokens)
    )
