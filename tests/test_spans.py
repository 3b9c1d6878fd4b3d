"""Planted-duplicate tests for the span-level dedup operator
(operators/spans.py): exact expected grams, coverage-merge semantics
for overlapping spans, and the zero/full coverage extremes."""

from __future__ import annotations

from django_datastream_spark.operators import spans as sp


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_exact_set(spark):
    shared = "a b c d"  # one shared 4-gram
    docs = _docs(
        spark,
        [
            (1, f"{shared} p q r"),
            (2, f"x y z {shared}"),
            (3, "u v w only here nothing shared"),
        ],
    )
    dup = sp.duplicate_ngram_spans(docs, n=4, min_docs=2).collect()
    # only the planted gram repeats across docs
    assert len(dup) == 1
    assert dup[0]["n_docs"] == 2 and dup[0]["n_occ"] == 2


def test_coverage_extremes_and_left_join_zero(spark):
    shared = "a b c d e f"
    docs = _docs(
        spark,
        [
            (1, shared),  # doc IS the shared span -> full coverage
            (2, shared),
            (3, "g h i j k l"),  # nothing shared -> zero coverage
        ],
    )
    cov = {
        r["doc_id"]: r
        for r in sp.span_dup_coverage(docs, n=6, min_docs=2).collect()
    }
    assert cov[1]["covered"] == 6 and cov[1]["dup_ratio"] == 1.0
    assert cov[2]["covered"] == 6
    assert cov[3]["covered"] == 0 and cov[3]["dup_ratio"] == 0.0


def test_overlapping_spans_merge_positions(spark):
    # docs 1 and 2 share a 5-token run "a b c d e"; with n=4 that run
    # contains two overlapping duplicated 4-grams (positions 0 and 1).
    # Counting occurrences would give 8 token-slots; merged coverage
    # must count the 5 distinct positions exactly once.
    docs = _docs(
        spark,
        [
            (1, "a b c d e x y z"),
            (2, "q r a b c d e"),
        ],
    )
    cov = {
        r["doc_id"]: r
        for r in sp.span_dup_coverage(docs, n=4, min_docs=2).collect()
    }
    assert cov[1]["covered"] == 5
    assert cov[2]["covered"] == 5


def test_min_docs_threshold_excludes_within_doc_repeats(spark):
    # a gram repeated twice INSIDE one doc is not a cross-doc duplicate
    docs = _docs(
        spark,
        [
            (1, "a b c a b c"),
            (2, "x y z w v u"),
        ],
    )
    dup = sp.duplicate_ngram_spans(docs, n=3, min_docs=2).collect()
    assert dup == []


# ---------------------------------------------------------------------------
# PII redaction (functions/text.py PII_PATTERNS) — precision pinning
# ---------------------------------------------------------------------------
from pyspark.sql import functions as F

from django_datastream_spark.functions import text as tx


def test_pii_redaction_categories_and_precision(spark):
    rows = [
        (1, "mail jane.doe+x@corp.example.com now"),
        (2, "call +1-555-123-4567 or 555-987-6543"),
        (3, "host 192.168.0.1 responded"),
        (4, "raw digits 5551234567 stay; pi 3.14 stays; v1.2 stays"),
        (5, "combo a@b.io at 10.0.0.7 via 555-000-1111"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    cnt = tx.pii_counts(F.col("t"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            tx.redact_pii(F.col("t")).alias("red"),
            *[cnt[c].alias(c) for c in cnt],
        ).collect()
    }
    assert out[1]["red"] == "mail <EMAIL> now" and out[1]["email"] == 1
    assert out[2]["red"] == "call <PHONE> or <PHONE>" and out[2]["phone"] == 2
    assert out[3]["red"] == "host <IP> responded" and out[3]["ipv4"] == 1
    # conservative: undashed digit runs and short dotted numbers untouched
    assert out[4]["red"] == rows[3][1]
    assert out[5]["red"] == "combo <EMAIL> at <IP> via <PHONE>"


# ---------------------------------------------------------------------------
# randomized invariants (driver-side hypothesis over small Spark frames)
# ---------------------------------------------------------------------------
import random as _random


def test_redaction_idempotent_and_digit_free_tokens(spark):
    """redact(redact(x)) == redact(x): replacement tokens contain no
    digits or '@', so no pass can re-match inside a redaction. Checked
    over randomized mixes of PII and clean fragments."""
    rng = _random.Random(0xC0FFEE)
    frags = [
        "plain words here",
        "a.b@example.com",
        "+44-555-123-4567",
        "10.1.2.3",
        "v1.2.3.4",  # version that LOOKS like an IP — redacts (documented)
        "3.14159",
        "777-888-9999",
        "end.",
    ]
    rows = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 8))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    once = tx.redact_pii(F.col("t"))
    out = df.select(
        "id",
        once.alias("r1"),
        tx.redact_pii(once).alias("r2"),
    ).collect()
    for r in out:
        assert r["r1"] == r["r2"], r


def test_span_coverage_invariants_random(spark):
    """0 <= covered <= n_tokens and dup_ratio in [0,1] for random
    corpora; docs shorter than n never get coverage."""
    rng = _random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from django_datastream_spark.operators import spans as _sp

    out = _sp.span_dup_coverage(df, n=5, min_docs=2).collect()
    assert len(out) == 80
    for r in out:
        assert 0 <= r["covered"] <= r["n_tokens"], r
        assert 0.0 <= r["dup_ratio"] <= 1.0, r
        if r["n_tokens"] < 5:
            assert r["covered"] == 0, r


def test_longest_shared_spans_crafted(spark):
    from django_datastream_spark.operators import spans as sp

    shared = " ".join(f"s{i}" for i in range(15))
    short = " ".join(f"s{i}" for i in range(5))
    d = spark.createDataFrame(
        [
            (0, "aa bb " + shared + " cc dd"),
            (1, "xx yy zz " + shared + " qq"),
            (2, "p q r " + short + " t u v w x y z n m o k j"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["a"], r["b"]): r["span_tokens"]
        for r in sp.longest_shared_spans(d).collect()
    }
    # the planted 15-token run is found at its exact length ...
    assert out == {(0, 1): 15}
    # ... and a lower min_tokens surfaces the 5-token overlap too
    out5 = {
        (r["a"], r["b"]): r["span_tokens"]
        for r in sp.longest_shared_spans(d, min_tokens=3).collect()
    }
    # adjacency trade (see operator docstring): doc2's suffix sorts
    # next to exactly ONE of the twins, so one pair carries the
    # 5-token overlap and the other may be under-reported
    assert out5[(1, 2)] == 5
    assert out5[(0, 1)] == 15


def test_interval_union_fold_matches_bruteforce(spark):
    """r11 optimization pin: the per-doc interval-union fold inside
    span_dup_coverage must equal the brute-force count of distinct
    covered token positions (the pre-r11 formulation) on a corpus dense
    enough to produce overlapping, adjacent, and disjoint duplicated
    spans."""
    rng = _random.Random(7)
    vocab = [f"w{i}" for i in range(8)]  # tiny vocab -> many dup grams
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 3
    out = {
        r["doc_id"]: r["covered"]
        for r in sp.span_dup_coverage(df, n=n, min_docs=2).collect()
    }
    # brute force in python: find grams occurring in >=2 distinct docs,
    # then union their [pos, pos+n-1] windows per doc
    toks = {i: t.split() for i, t in rows}
    from collections import defaultdict

    where = defaultdict(set)
    for i, tk in toks.items():
        for p in range(len(tk) - n + 1):
            where[" ".join(tk[p : p + n])].add(i)
    dup = {g for g, ds in where.items() if len(ds) >= 2}
    for i, tk in toks.items():
        covered = set()
        for p in range(len(tk) - n + 1):
            if " ".join(tk[p : p + n]) in dup:
                covered.update(range(p, p + n))
        assert out[i] == len(covered), (i, out[i], len(covered))
