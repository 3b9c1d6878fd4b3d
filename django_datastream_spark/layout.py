"""Multi-dimensional data layout: Z-order (Morton) clustering for
parquet file pruning.

Why: partitioning + min/max row-group stats prune scans only along the
sort order. A time-sorted `points_raw` answers time-range queries with
near-perfect file pruning but reads EVERY file for a single-stream query
(each file spans all streams). Z-ordering interleaves the bits of
several normalized sort keys so each output file covers a small
hyper-rectangle of the key space — a filter on ANY of the z-columns
prunes most files by footer stats alone. This is the same trick Delta's
OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite apply; here it is a
plain column expression + repartitionByRange, so it works on vanilla
parquet at any scale:

- the min/max normalization bounds come from a 1-row broadcast agg
  computed IN-PLAN (no driver action);
- ``repartitionByRange(z)`` range-partitions on the z-value (Spark
  samples bounds — one extra pass over the sort key only);
- within each task, rows sort by z so row-group stats are tight too.

At 100 TB this is the layout job you run once per ingest window (or as
the compaction pass), not per query."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


def _as_numeric(df: DataFrame, col: str) -> Column:
    if isinstance(df.schema[col].dataType, TimestampType):
        return F.unix_timestamp(F.col(col)).cast("double")
    return F.col(col).cast("double")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """Morton code of ``cols``: each column min-max-normalized to a
    ``bits``-bit integer (bounds via a broadcast 1-row agg), then bit-
    interleaved. Constant columns map to 0. 2 cols × 16 bits = a
    32-bit key in a LongType. Returns ``(df ⨯ bounds, z)`` — the
    caller selects its own columns plus ``z``."""
    nums = {c: _as_numeric(df, c) for c in cols}
    bounds = df.agg(
        *[F.min(e).alias(f"_mn_{c}") for c, e in nums.items()],
        *[F.max(e).alias(f"_mx_{c}") for c, e in nums.items()],
    )
    scale = (1 << bits) - 1
    joined = df.crossJoin(F.broadcast(bounds))
    ints = []
    for c, e in nums.items():
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        scaled = F.when(
            mx > mn,
            F.floor((e - mn) * scale / (mx - mn)),
        ).otherwise(F.lit(0))
        ints.append(F.least(scaled, F.lit(scale)).cast("long"))
    n = len(ints)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(ints):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + j))
    return joined, z


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partitioned into ``n_files`` z-ranges, z-sorted within each —
    so both file-level and row-group-level min/max stats are tight on
    every z-column."""
    joined, z = zorder_key(df, cols, bits)
    out = joined.withColumn("_z", z).select(*df.columns, "_z")
    (
        out.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
