"""Bucketed (pre-shuffled) tables — the co-located join story.

A join between two large fact tables shuffles both sides every query.
Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key, so
every subsequent join (and aggregation on the key) plans as a
sort-merge join with NO Exchange on either side. At 100 TB this is the
difference between re-shuffling petabyte inputs per query and a
scan-side merge.

Spark's native bucketing (``bucketBy`` + ``saveAsTable``) works with
the built-in catalog and parquet tables — no Hive required. Bucket
pruning additionally skips buckets when the key is equality-filtered.

The shuffle-free property is pinned by
tests/test_plans.py::test_bucketed_join_avoids_shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed catalog table. ``sort_cols``
    (default: the bucket cols) pre-sorts within buckets so the merge
    join needs no sort either. Choose ``n_buckets`` ≈ cluster cores ×
    small integer at deploy scale; both join sides MUST use the same
    count for the co-located plan."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark, table: str) -> DataFrame:
    return spark.table(table)
