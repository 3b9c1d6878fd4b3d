"""Deterministic sampling / corpus-mixing operators for training-data
pipelines (reference: SURVEY §2.10 extension surface — the "data mixing"
step between dedup/quality filtering and tokenization).

Everything is built on a *portable* uniform: the first 8 hex digits of
``md5(salt || id)`` read as an unsigned 32-bit integer, divided by 2^32.
That makes every sample reproducible bit-for-bit across engines (the
DuckDB oracle computes the identical value via ``('0x'||substr(md5(..),
1,8))::BIGINT``), across runs, and across cluster sizes — no RNG state,
no ``rand()`` nondeterminism, no dependence on partitioning. At 100 TB
this is the only sane shape: each row decides membership from its own
key, so sampling is a stateless map with full predicate pushdown and no
shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def u01(key: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) from a key column: first 8 hex
    digits of md5(salt:key) as u32 / 2^32. Engine-portable."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_U32))


def weighted_mix(
    df: DataFrame,
    rates: Mapping[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixing: keep each row of group ``g`` with
    probability ``rates[g]`` (``default_rate`` for unlisted groups),
    decided by the row's own deterministic ``u01``. The standard way a
    training mix re-weights sources (upweight curated, downsample crawl)
    while staying reproducible.

    Scale shape: one ``CASE`` on the group column against a literal map
    plus a filter — pure row-local column expressions, no shuffle, no
    UDF; Catalyst pushes the filter into the scan where possible.
    Adds column ``u`` (the draw) so audits can recheck membership.
    """
    rate = F.lit(float(default_rate))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return (
        df.withColumn("u", u01(F.col(id_col), salt))
        .filter(F.col("u") < rate)
    )


def train_heldout_split(
    df: DataFrame,
    heldout_frac: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/heldout assignment: rows whose draw falls
    below ``heldout_frac`` are tagged ``heldout``, the rest ``train``.
    Independent of :func:`weighted_mix` draws via a different salt, so
    mixing then splitting doesn't correlate. Stateless per-row map."""
    return df.withColumn(
        "split",
        F.when(
            u01(F.col(id_col), salt) < F.lit(float(heldout_frac)),
            F.lit("heldout"),
        ).otherwise(F.lit("train")),
    )


def pack_greedy(
    docs: DataFrame,
    max_tokens: int = 512,
    by: tuple[str, ...] = ("source",),
    order_col: str = "doc_id",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-capacity
    training sequences ("packs") — the step between tokenization and
    batch assembly in an LLM data pipeline. Within each ``by`` group,
    documents are taken in ``order_col`` order and appended to the
    current pack while they fit; a doc that would overflow starts the
    next pack (a doc longer than ``max_tokens`` gets a pack of its own).
    Returns (id, *by, n_tokens, pack_idx) with ``pack_idx`` 0-based per
    group.

    Greedy fill is inherently sequential *within a group*, so the
    group is the parallelism unit: applyInPandas runs one Arrow batch
    per group, and everything before/after is declarative. At 100 TB
    you don't pack a whole source in one sequence-dependent pass —
    pass ``by=("source", "shard")`` with ``shard = pmod(xxhash64(id),
    k)`` sized so a group fits one task comfortably (packing quality is
    unaffected: packs never span shards by design, the same trade every
    distributed packer makes). Determinism: output depends only on
    (group, order_col) — never on partitioning or task order.
    """
    import pandas as pd

    from ..functions.text import token_count

    cols = [F.col(id_col), *[F.col(c) for c in by],
            token_count(F.col(text_col)).alias("n_tokens")]
    if order_col != id_col:
        cols.append(F.col(order_col))
    base = docs.select(*cols)
    by_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in base.schema if f.name in by
    )
    out_schema = f"{id_col} long, {by_fields}, n_tokens long, pack_idx long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        packs = []
        fill, pack = 0, -1
        first = True
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if first or fill + nt > max_tokens:
                pack += 1
                fill = nt
                first = False
            else:
                fill += nt
            packs.append(pack)
        pdf["pack_idx"] = packs
        return pdf[[id_col, *by, "n_tokens", "pack_idx"]]

    return base.groupBy(*[F.col(c) for c in by]).applyInPandas(_pack, out_schema)


def stratified_sample(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, deterministically:
    rank rows inside each group by their :func:`u01` draw (id tiebreak)
    and keep the first ``k`` — a reproducible "reservoir" that depends
    only on row keys, never on partitioning, task order, or RNG state.
    One window per group (hash shuffle on the group key); the draw is
    engine-portable, so an external oracle ranks identically. Adds
    ``u`` (the draw) for audits."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col("u"), F.col(id_col))
    return (
        df.withColumn("u", u01(F.col(id_col), salt))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def quality_weighted_sample(
    df: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    salt: str = "qw",
) -> DataFrame:
    """Importance sampling by a per-row quality weight in [0, 1]: keep
    the row iff its deterministic ``u01`` draw falls below ``weight``
    — so a 0.9-quality document survives 9× as often as a 0.1 one,
    reproducibly. The curation step between scoring and mixing in a
    training pipeline. Same scale shape as :func:`weighted_mix`:
    stateless row-local expressions, no shuffle; adds ``w`` and ``u``
    for audits."""
    return (
        df.withColumn("w", weight)
        .withColumn("u", u01(F.col(id_col), salt))
        .filter(F.col("u") < F.col("w"))
    )


def epoch_shuffle(
    docs: DataFrame,
    epoch: int,
    num_batches: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training shuffle: assign every document
    a (batch, pos) for this epoch, reproducible across runs, cluster
    sizes, and input partitionings — the data-loader contract a
    training job needs to resume mid-epoch or re-derive exactly which
    examples step K saw.

    Scale shape: batch = md5(epoch, id) mod num_batches is a pure
    column expression (one hash shuffle for the window, nothing
    global); pos ranks within a batch by the same hash, so the only
    window is PARTITIONED by batch and bounded by batch size — never
    the single-reducer global ROW_NUMBER a naive "ORDER BY random()"
    shuffle plan degenerates to.  Different epochs permute
    independently because the epoch salts the hash."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws("\x1f", F.lit(str(epoch)), F.col(id_col)))
    w = Window.partitionBy("batch").orderBy("h", id_col)
    return (
        docs.select(F.col(id_col), h.alias("h"))
        .withColumn(
            "batch",
            F.pmod(
                F.conv(F.substring("h", 1, 15), 16, 10).cast("long"),
                F.lit(num_batches),
            ),
        )
        .withColumn("pos", F.row_number().over(w))
        .select(
            F.lit(epoch).alias("epoch"), F.col(id_col), "batch", "pos"
        )
    )
