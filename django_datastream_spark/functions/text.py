"""Text-analysis expression library (extension surface, SURVEY §2.10 /
BASELINE north star: language-ID, quality scoring, token counting,
fingerprinting for large-scale training-data pipelines).

Everything here is a *column expression* over `pyspark.sql.functions` —
JVM-side, whole-stage-codegen friendly; no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Whitespace tokens (non-space runs) — portable across engines."""
    return F.regexp_extract_all(text, F.lit(r"\S+"), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_tokens(text: Column) -> Column:
    """A BPE-ish regex split: word pieces, numbers, and single punctuation
    marks as separate tokens (GPT-2-style pre-tokenizer shape)."""
    return F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )


def shingles_from_tokens(tk: Column, n: int) -> Column:
    """Word n-gram shingles, space-joined: ``arrays_zip`` of the ``n``
    shifted slices of the token array, gram = concat of one zip struct.

    The zip shape matters: expressions *captured* inside a higher-order-
    function lambda re-evaluate once per array element, so the obvious
    ``transform(sequence(...), i -> element_at(tk, i+j))`` form re-runs
    an inlined regex tokenizer ~n times per gram (measured 6.1 s for the
    3-gram explode of 5k docs vs 0.5 s for this form — Catalyst's
    CollapseProject also re-inlines any pre-materialized token column,
    so a projection boundary can't prevent it). Here ``tk`` is only
    referenced at the top level (n slices + guards, once per row) and
    the lambda touches nothing but its own struct argument."""
    k = F.size(tk)
    m = k - F.lit(n) + F.lit(1)
    slices = [F.slice(tk, j + 1, F.greatest(m, F.lit(0))) for j in range(n)]
    grams = F.transform(
        F.arrays_zip(*slices),
        lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]),
    )
    return F.when(k >= n, grams).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column, n: int) -> Column:
    """:func:`shingles_from_tokens` over :func:`tokens` — the tokenizer
    is evaluated O(n) times per row (not per gram), so this single
    expression is safe in hot paths."""
    return shingles_from_tokens(tokens(text), n)


def with_shingles(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "_sh",
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle array) — the shared projection the dedup /
    decontamination operators explode from."""
    sh = word_shingles(F.col(text_col), n)
    if distinct:
        sh = F.array_distinct(sh)
    return df.select(F.col(id_col), sh.alias(out))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_EN_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on with"
).split()


def quality_metrics(text: Column) -> dict[str, Column]:
    """Deterministic quality signals: length, token stats, punctuation and
    stopword ratios. Composable; callers alias what they need."""
    t = tokens(text)
    n_tok = F.size(t)
    punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    stop_hits = F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in _EN_STOPWORDS])))
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_token_len": F.when(
            n_tok > 0, (F.length(F.concat_ws("", t)) / n_tok)
        ),
        "punct_ratio": F.when(
            F.length(text) > 0, punct / F.length(text)
        ),
        # distinct stopwords present / distinct tokens — a crude fluency signal
        "stopword_ratio": F.when(
            F.size(F.array_distinct(t)) > 0,
            stop_hits / F.size(F.array_distinct(t)),
        ),
    }


# ---------------------------------------------------------------------------
# language identification (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

#: tiny per-language marker lexicons (public common-word lists)
LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and of to in is that it for with as his on be at by".split(),
    "fr": "le la les et de des un une est pour dans que qui sur au".split(),
    "es": "el la los las y de un una es para en que por con del".split(),
    "de": "der die das und ist ein eine zu den von mit für auf im".split(),
    "zh": "的 是 在 了 和 有 我 他 这 中 大 来 上 国 个".split(),
}


def lang_marker_df(spark) -> DataFrame:
    rows = [(lang, w) for lang, ws in LANG_MARKERS.items() for w in ws]
    from ..storage import local_rows_df

    return local_rows_df(spark, rows, "lang string, marker string")


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predict language as argmax of marker-token hits (ties → lang asc).

    Scale shape: explode tokens → broadcast-join the tiny marker lexicon →
    two aggregations. No UDFs; marker dim is broadcast so the only shuffle
    is the per-doc score aggregation.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    hits = (
        toks.join(
            F.broadcast(lang_marker_df(spark)),
            toks.tok == F.col("marker"),
        )
        .groupBy(id_col, "lang")
        .agg(F.count("*").alias("hits"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("hits").desc(), F.col("lang").asc())
    best = (
        hits.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, F.col("lang").alias("pred_lang"), F.col("hits").cast("long").alias("hits"))
    )
    # docs with zero marker hits → 'und'
    return (
        docs.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("hits", F.lit(0)).alias("hits"),
        )
    )


def vocab_topk(
    docs: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level vocabulary: the k most frequent (lowercased) tokens
    with counts (ties → token asc) — the first step of tokenizer/vocab
    construction over a training corpus. One explode + one hash aggregate
    (map-side partials) + TakeOrdered on the tiny distinct-token side; the
    full corpus is never sorted."""
    return (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def repetition_metrics(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_frac: float = 0.2,
    max_top_frac: float = 0.2,
) -> DataFrame:
    """Gopher-style repetition quality signals per document (reference:
    SURVEY §2.10 text-quality row; Rae et al. 2021 'duplicate n-gram
    fraction' / 'top n-gram fraction' filters, word-2-gram variant).

    Emits per doc: total 2-gram occurrences, the fraction of occurrences
    that repeat an earlier gram (``dup_2gram_frac``), the share held by
    the single most frequent gram (``top_2gram_frac``), and a ``keep``
    flag under the given thresholds. Docs with <2 tokens have no grams:
    fractions are NULL and ``keep`` is false.

    Scale shape (optimization r11, guide §2.3/§2.4): the metrics are
    per-document, so they compute ROW-LOCALLY — one fold over the
    row's sorted 2-gram array yields (n2, nd, tc) in a single pass
    (run-length over equal neighbours gives the top-gram count), and
    NO gram row ever crosses a shuffle.  The pre-r11 shape exploded
    every gram occurrence into a (doc, gram) hash agg + per-doc agg +
    spine join — three exchanges of corpus-token-sized data for a
    quantity each row can answer alone (measured 2.0 s → 0.5 s at
    sf0.1 with the scan scattered, output bit-equal).  Per-row cost is
    O(tokens log tokens) for the sort; the single ``aggregate`` fold
    references the shingle expression once, so the tokenizer is not
    re-inlined per metric (the CollapseProject trap documented on
    :func:`shingles_from_tokens`).
    """
    sh = F.sort_array(word_shingles(F.col(text_col), 2))
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("tc"),
        F.lit(0).cast("long").alias("n2"),
        F.lit(0).cast("long").alias("nd"),
    )

    def _merge(acc, g):
        same = acc["prev"].isNotNull() & (g == acc["prev"])
        new_run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            g.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["tc"], new_run).alias("tc"),
            (acc["n2"] + 1).alias("n2"),
            (acc["nd"] + F.when(same, 0).otherwise(1)).alias("nd"),
        )

    m = F.aggregate(sh, acc0, _merge)
    n2, nd, tc = m["n2"], m["nd"], m["tc"]
    dup = F.when(n2 > 0, F.round((n2 - nd) / n2, 4))
    top = F.when(n2 > 0, F.round(tc / n2, 4))
    return docs.select(
        F.col(id_col),
        n2.alias("n_2grams"),
        dup.alias("dup_2gram_frac"),
        top.alias("top_2gram_frac"),
        F.coalesce(
            (dup <= max_dup_frac) & (top <= max_top_frac), F.lit(False)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Deterministic document fingerprint (portable: md5 exists in every
    engine, so the oracle can reproduce it bit-for-bit)."""
    return F.md5(normalized_text(text))


def fingerprint_xx64(text: Column) -> Column:
    """Fast engine-side fingerprint (xxhash64; Spark-specific)."""
    return F.xxhash64(normalized_text(text))


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-token chunks — the
    long-context preprocessing step between cleaning and tokenization
    (chunk i covers tokens [i·stride, i·stride + chunk_size)).

    Pure declarative array expressions — sequence of starts → filter →
    posexplode → slice — no UDF, fully whole-stage-codegen, trivially
    scale-safe (each row's work is local and bounded by its own token
    count). A trailing start whose chunk would add no tokens beyond the
    previous chunk (start + chunk_size − stride ≥ n) is dropped, so
    chunks never duplicate a suffix already fully covered. Zero-token
    docs produce no chunks. Returns (id, chunk_idx, n_chunk_tokens,
    chunk_text).
    """
    if not 0 < stride <= chunk_size:
        raise ValueError("stride must be in (0, chunk_size]")
    tk = tokens(F.col(text_col))
    n = F.size(tk)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (n > 0)
        & ((s == 0) | (s + F.lit(chunk_size - stride) < n)),
    )
    chunked = docs.select(
        F.col(id_col),
        tk.alias("_tk"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    piece = F.slice(F.col("_tk"), F.col("_start") + 1, chunk_size)
    return chunked.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------
# Patterns restricted to the Java-regex / RE2 common subset (no
# lookaround, no backreferences) so the DuckDB oracle can mirror them
# verbatim. Conservative by design: high-precision shapes (full emails,
# dotted-quad IPs, dashed phone numbers), not a recall-maximal PII
# suite — at corpus scale a false positive silently mutates clean
# training text, so precision is the binding constraint.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # category -> (regex, replacement token); applied in this order.
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"(\+\d{1,3}-)?\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its category token. Email runs
    first (its local part may contain digits a later pattern could
    shred), then phone, then IPv4 — replacement tokens contain no
    digits, so later passes never match inside earlier redactions.
    Pure ``regexp_replace`` chain: whole-stage codegen, no UDF."""
    out = text
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts on the *original* text (audit metric —
    how much PII a source emits drives source-level policy)."""
    return {
        cat: F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")
        for cat, (pattern, _) in PII_PATTERNS.items()
    }


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained bigram language-model scoring (CCNet-style
    perplexity filtering, SURVEY §2.10 north star): train MLE bigram
    conditionals P(w2|w1) = count(w1 w2) / count(w1-as-first) on the
    corpus itself, then score each document by its mean bigram
    log-probability.  Low (very negative) scores mark documents whose
    word transitions are rare in the corpus — the standard "train a
    small LM on trusted text, drop high-perplexity docs" filter.

    Scale shape: tokens explode linearly; the two count tables are
    plain hash aggregates; scoring is two distributed equi-joins on
    (bigram, first-word) keys — no broadcast needed because the count
    tables grow with vocabulary, and no driver action anywhere.  Docs
    with <2 tokens have no bigrams and drop out (callers can
    left-join back if they want them flagged).
    """
    t = tokens(F.col(text_col))
    d2 = (
        docs.select(F.col(id_col).alias("doc_id"), t.alias("ts"))
        .filter(F.size("ts") >= 2)
    )
    n1 = F.size(F.col("ts")) - 1
    pairs = F.zip_with(
        F.slice(F.col("ts"), F.lit(1), n1),
        F.slice(F.col("ts"), F.lit(2), n1),
        lambda a, b: F.struct(
            a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")
        ),
    )
    db = d2.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.bg"
    )
    uni = db.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    big = db.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    return (
        db.join(big, "bg")
        .join(uni, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(F.log(F.col("cb") / F.col("c1"))).alias("avg_logp"),
        )
    )


def source_kl_divergence(
    docs: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Domain-shift audit: KL(source ‖ corpus) between each source's
    unigram distribution and the whole-corpus distribution.  A source
    whose KL spikes is drifting away from the mix the model was tuned
    on — the per-domain counterpart of q110's corpus-level Zipf fit.

    Scale shape: one explode + one (group, word) hash agg, from which
    the three marginals (per-source totals, per-word corpus counts,
    grand total) all derive without rescanning the corpus; the only
    join back is on the word key.  Everything is map-side combinable.
    """
    tok = docs.select(
        F.col(group_col).alias("g"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    )
    sw = tok.groupBy("g", "w").agg(F.count(F.lit(1)).alias("c"))
    s = sw.groupBy("g").agg(F.sum("c").alias("sc"))
    wtab = sw.groupBy("w").agg(F.sum("c").alias("wc"))
    tot = sw.agg(F.sum("c").alias("tc"))
    ps = F.col("c") / F.col("sc")
    pw = F.col("wc") / F.col("tc")
    return (
        sw.join(s, "g")
        .join(wtab, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("g", "sc")
        .agg(F.sum(ps * F.log(ps / pw)).alias("kl"))
        .select(
            F.col("g").alias(group_col),
            F.col("sc").cast("long").alias("n_tokens"),
            F.col("kl"),
        )
    )
