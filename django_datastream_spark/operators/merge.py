"""Generic file-scoped MERGE INTO for vanilla-parquet tables.

``storage.Backend.upsert_points_agg`` solves merge for the points_agg
table specifically; this module is the table-agnostic form — the
engine-level ``MERGE INTO target USING source ON keys`` a CDC apply or
backfill job needs (the reference's closest surface is its
append/overwrite pair; MERGE is a beyond-reference completion).

Semantics (the Delta/Iceberg MERGE subset vanilla parquet can honor):

- WHEN MATCHED THEN UPDATE  — target row replaced by the source row
- WHEN MATCHED THEN DELETE  — target row dropped
- WHEN NOT MATCHED THEN INSERT — source row appended

Execution shape (Delta-style file-level pruning, no path arithmetic):

1. the source batch is pinned once (localCheckpoint, bounded by the
   batch) and validated: unique keys (a CDC batch with two versions of
   one key must be pre-collapsed — Delta raises here too) and a schema
   covering the target's columns (target schema is authoritative, so
   kept rows never lose target-only columns);
2. conflict scope is the set of FILES that contain a matched key,
   found with one partition-pruned semi-join and reported by
   ``input_file_name()`` — Spark tells us the real URIs, so Hive
   partition-value escaping and partition type inference can never
   mis-target a delete;
3. the rebuilt rows (kept + replaced [+ fresh inserts]) are APPENDED
   FIRST, and only then are the old conflict files deleted.  A crash
   in between leaves duplicates (at-least-once), never data loss —
   the strictly safer failure mode for a non-transactional store; a
   table format (Delta/Iceberg) makes the same statement atomic, and
   the touched volume here is identical, so migration is a connector
   swap.

Keys must be PARTITION-STABLE (a key's partition columns never change
between versions — true for any layout where the partition derives
from the key, e.g. p_date from bucket_ts).  A partition-hopping key
degrades to Hive-upsert behavior: the new version is appended as an
insert and the stale copy lingers in the old partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


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

    Returns ``{"rewritten_files": int, "inserted": bool}`` — metadata
    only; the merge never counts row data on the driver.  Raises
    ``ValueError`` on an unknown clause, a source batch with duplicate
    keys, or a source missing target columns.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched={when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(f"when_not_matched={when_not_matched!r}")
    src = source.localCheckpoint(eager=True)
    # a CDC batch with two versions of one key has no deterministic
    # outcome under replace-by-key — same contract as Delta's
    # "multiple source rows matched" error; collapse upstream first
    if (
        src.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .take(1)
    ):
        raise ValueError("source has multiple rows for the same key")

    fs, troot = _fs_and_path(spark, target_path)
    if not fs.exists(troot):
        if when_not_matched == "insert":
            src.write.mode("append").partitionBy(*partition_cols).parquet(
                target_path
            )
            return {"rewritten_files": 0, "inserted": True}
        return {"rewritten_files": 0, "inserted": False}

    existing = spark.read.parquet(target_path)
    missing = set(existing.columns) - set(src.columns)
    if missing:
        raise ValueError(f"source missing target columns: {sorted(missing)}")
    src = src.select(*existing.columns)  # target schema is authoritative

    # partition-pruned scope: only partitions the source touches can
    # hold matched rows (the partition-stable invariant)
    touched = src.select(*partition_cols).distinct()
    part_scope = existing.join(
        F.broadcast(touched), partition_cols, "left_semi"
    )
    conflict_files = [
        r["f"]
        for r in part_scope.join(
            F.broadcast(src.select(*key_cols)), key_cols, "left_semi"
        )
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()  # metadata: file URIs, bounded by touched partitions
    ]

    pieces: list[DataFrame] = []
    if conflict_files:
        conflicted = (
            spark.read.option("basePath", target_path)
            .schema(existing.schema)
            .parquet(*conflict_files)
            .select(*existing.columns)
        )
        # kept: conflict-file rows whose key the source does NOT carry
        pieces.append(
            conflicted.join(src.select(*key_cols), key_cols, "left_anti")
        )
        if when_matched == "update":
            # every matched source row's target lives in a conflict
            # file (its file contains that key), so semi against the
            # bounded conflicted frame — never the whole table
            pieces.append(
                src.join(
                    conflicted.select(*key_cols), key_cols, "left_semi"
                )
            )
    inserted = False
    if when_not_matched == "insert":
        fresh = src.join(
            part_scope.select(*key_cols), key_cols, "left_anti"
        )
        if fresh.take(1):
            pieces.append(fresh)
            inserted = True

    if pieces:
        out = pieces[0]
        for p_ in pieces[1:]:
            out = out.unionByName(p_)
        # WRITE FIRST (old files still readable during the job), delete
        # after — a crash in between duplicates, never loses
        out.write.mode("append").partitionBy(*partition_cols).parquet(
            target_path
        )
    for f in conflict_files:
        ffs, fp = _fs_and_path(spark, f)
        ffs.delete(fp, False)
        parent = fp.getParent()
        # opportunistically drop a now-empty partition dir so a
        # vacated partition disappears from listings
        try:
            if not ffs.listStatus(parent):
                ffs.delete(parent, False)
        except Exception:  # noqa: BLE001 — cleanup only, never fatal
            pass
    return {"rewritten_files": len(conflict_files), "inserted": inserted}
