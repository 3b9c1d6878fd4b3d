"""Generic partition-scoped MERGE INTO for vanilla-parquet tables.

``storage.Backend.upsert_points_agg`` solves merge for the points_agg
table specifically; this module is the table-agnostic form — the
engine-level ``MERGE INTO target USING source ON keys`` a CDC apply or
backfill job needs (the reference's closest surface is its
append/overwrite pair; MERGE is a beyond-reference completion).

Semantics (the Delta/Iceberg MERGE subset that vanilla parquet can
honor atomically-enough via dynamic partition overwrite):

- WHEN MATCHED THEN UPDATE  — target row replaced by the source row
- WHEN MATCHED THEN DELETE  — target row dropped
- WHEN NOT MATCHED THEN INSERT — source row appended

Scale shape: the source is pinned once (localCheckpoint, bounded by the
batch); matched keys are detected with one partition-pruned semi-join;
ONLY partitions that contain a matched key are read-modify-overwritten
(dynamic partition overwrite); all untouched-partition inserts are a
plain append that never reads the table.  The only driver-side
materialization is the conflicted PARTITION LIST (metadata, bounded by
touched-partition count — never row data).  In production with a table
format, the same statement is one ``MERGE INTO``; this operator keeps
the identical touched-volume so the migration is a connector swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
) -> dict:
    """Merge ``source`` into the parquet table at ``target_path``.

    ``partition_cols`` must be columns of ``source`` (the layout of the
    target table).  Keys must be PARTITION-STABLE: a key's partition
    column values never change between versions (true for any layout
    where the partition derives from the key, e.g. p_date from
    bucket_ts).  That invariant is what lets conflict detection prune
    to source-touched partitions instead of scanning the table; a
    partition-hopping key would leave its stale copy behind, exactly
    as in Hive-style dynamic-partition upserts.  Returns
    {"conflicted_partitions": int, "appended": bool} — intentionally
    metadata-only so the merge never counts row data on the driver.
    """
    assert when_matched in ("update", "delete")
    assert when_not_matched in ("insert", "ignore")
    src = source.localCheckpoint(eager=True)

    try:
        existing = spark.read.parquet(target_path)
        target_exists = True
    except Exception:  # fresh table — everything is an insert
        target_exists = False

    if not target_exists:
        if when_not_matched == "insert":
            src.write.mode("append").partitionBy(*partition_cols).parquet(
                target_path
            )
            return {"conflicted_partitions": 0, "appended": True}
        return {"conflicted_partitions": 0, "appended": False}

    existing = existing.select(src.columns)
    # pin matched keys BEFORE any write: the insert step below must not
    # re-read the target after the overwrite (in delete mode the
    # matched rows would be gone and re-insert themselves)
    matched_keys = (
        src.select(*key_cols)
        .join(existing.select(*key_cols), key_cols, "left_semi")
        .localCheckpoint(eager=True)
    )
    touched = src.select(*partition_cols).distinct()
    conflicts = (
        existing.join(F.broadcast(touched), partition_cols, "left_semi")
        .join(F.broadcast(src.select(*key_cols)), key_cols, "left_semi")
        .select(*partition_cols)
        .distinct()
        .collect()  # metadata: bounded by touched-partition count
    )

    if conflicts:
        cdf = spark.createDataFrame(
            [tuple(r[c] for c in partition_cols) for r in conflicts],
            existing.select(*partition_cols).schema,
        )
        keep = existing.join(
            F.broadcast(cdf), partition_cols, "left_semi"
        ).join(src.select(*key_cols), key_cols, "left_anti")
        if when_matched == "update":
            replaced = (
                src.join(F.broadcast(cdf), partition_cols, "left_semi")
                .join(existing.select(*key_cols), key_cols, "left_semi")
            )
            out = keep.unionByName(replaced)
        else:  # delete: survivors only
            out = keep
        out = out.localCheckpoint(eager=True)  # pin BEFORE deleting files
        # clear-then-append rather than dynamic partition overwrite:
        # overwrite only replaces partitions PRESENT in the written
        # data, so a partition whose rows all vanish (delete-only
        # merge) would silently keep its old files. Deleting the
        # conflicted dirs explicitly honors full-partition deletes too.
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for r in conflicts:
            sub = "/".join(f"{c}={r[c]}" for c in partition_cols)
            p = jvm.org.apache.hadoop.fs.Path(f"{target_path}/{sub}")
            p.getFileSystem(hconf).delete(p, True)
        out.write.mode("append").partitionBy(*partition_cols).parquet(
            target_path
        )

    appended = False
    if when_not_matched == "insert":
        # inserts whose keys matched nothing — includes rows landing in
        # conflicted partitions (their partition was rewritten WITHOUT
        # them iff they matched; unmatched rows append cleanly) and
        # rows opening brand-new partitions
        fresh = src.join(matched_keys, key_cols, "left_anti")
        fresh.write.mode("append").partitionBy(*partition_cols).parquet(
            target_path
        )
        appended = True
    return {"conflicted_partitions": len(conflicts), "appended": appended}
