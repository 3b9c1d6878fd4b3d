"""Skew-mitigation joins — manual salting for hot-key equi-joins.

AQE's skew-join split (``spark.sql.adaptive.skewJoin``) rebalances
sort-merge partitions at runtime, but it only fires on SMJ and only
when post-shuffle statistics reveal the skew. Salting is the explicit,
planner-independent tool: replicate the dim side ``n_salts`` times and
spread each hot fact key over ``n_salts`` shuffle partitions, so the
hottest key's work fans out across tasks instead of serializing on
one. The result set is provably identical to the unsalted join — the
salt only refines the partitioning, never the match condition.

Cost model (100 TB): the dim side pays a ×``n_salts`` replication
through its (already small relative to the fact) shuffle, the fact
side pays nothing extra; pick ``n_salts`` ≈ hottest-key share ×
cluster cores. Salting a uniform join wastes dim bandwidth — use it
when key frequency is materially skewed (here: ~150 users over
millions of events).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_ddsp_salt"


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: Column,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` (skew-keyed fact) with ``dim``, salted.

    ``on``: the join condition Column (e.g. ``big.k == dim.k``) — the
    salt equality is conjoined onto it. ``salt_cols``: columns of
    ``big`` to derive a deterministic per-row salt from (e.g. a row
    id); defaults to a uniform pseudo-random salt, which is equally
    correct (any salt assignment yields the same rows) but not
    bit-stable across retried tasks — prefer ``salt_cols`` in
    pipelines that checkpoint mid-join.

    Supports ``inner`` and ``left`` (fact-preserving) joins: the salt
    lives on the fact side, every dim row exists for every salt value,
    so match/no-match per fact row is unchanged.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_cols:
        salt = F.pmod(F.xxhash64(*[big[c] for c in salt_cols]), F.lit(n_salts))
    else:
        salt = F.floor(F.rand(seed=0x5A17) * n_salts)
    big_s = big.withColumn(_SALT, salt.cast("int"))
    dim_s = dim.withColumn(
        f"{_SALT}_d",
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)])),
    )
    cond = on & (big_s[_SALT] == dim_s[f"{_SALT}_d"])
    return big_s.join(dim_s, cond, how).drop(_SALT, f"{_SALT}_d")
