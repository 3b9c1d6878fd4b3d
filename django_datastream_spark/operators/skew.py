"""Skew-resistant aggregation (SURVEY §7 risk register: hot streams).

A single stream (key) carrying a disproportionate share of datapoints
turns a groupBy into one straggler task. The standard remedies, in order:

1. AQE skew handling (`spark.sql.adaptive.skewJoin.enabled`, on by
   default in session.py) — fixes skewed JOINS at runtime.
2. Two-phase salted aggregation (this module) — for skewed GROUP BYs of
   algebraic aggregates: add a salt to the key, partially aggregate
   (`#keys × #salts` groups, spread across the cluster), then merge the
   partials. Works because the downsampler aggregates are all algebraic
   (the same property the downsample cascade exploits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: merge function per algebraic aggregate kind
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` is [(col, kind, alias)] with kind in
    {sum, count, min, max}. Equivalent to
    ``df.groupBy(keys).agg(...)`` but immune to per-key skew.
    """
    for _, kind, _ in aggs:
        if kind not in _MERGES:
            raise ValueError(f"non-algebraic aggregate kind: {kind}")
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial_exprs = []
    for col, kind, alias in aggs:
        fn = F.count if kind == "count" else getattr(F, kind)
        partial_exprs.append(fn(col).alias(f"_p_{alias}"))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    merge_exprs = [
        _MERGES[kind](f"_p_{alias}").alias(alias) for _, kind, alias in aggs
    ]
    return partial.groupBy(*keys).agg(*merge_exprs)
