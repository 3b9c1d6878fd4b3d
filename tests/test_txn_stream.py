"""Streaming source over the txn log (sources/txn_stream.py):
commit-version offsets, exactly-once incremental consumption across
restarts, and dataChange=false (optimize) invisibility."""

from __future__ import annotations

import pytest

from django_datastream_spark import txnlog as TL
from django_datastream_spark.sources import txn_stream


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, p string, v double")


def _drain(spark, table, cp, out, starting=None):
    """One availableNow pass of the txn_table stream into a memory-less
    parquet sink dir; returns the rows landed THIS pass."""
    txn_stream.register(spark)
    r = spark.readStream.format("txn_table").option("path", table)
    if starting is not None:
        r = r.option("startingVersion", str(starting))
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return spark.read.parquet(out)


def test_stream_reads_commits_then_only_new_ones(spark, tmp_path):
    table = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    TL.txn_append(spark, _df(spark, [(1, "a", 1.0), (2, "a", 2.0)]), table, [])
    TL.txn_append(spark, _df(spark, [(3, "b", 3.0)]), table, [])

    got = _drain(spark, table, cp, out)
    rows = {r["k"]: r["_commit_version"] for r in got.collect()}
    assert rows == {1: 1, 2: 1, 3: 2}

    # second pass with the SAME checkpoint: only the new commit streams
    TL.txn_append(spark, _df(spark, [(4, "a", 4.0)]), table, [])
    got2 = _drain(spark, table, cp, out)
    rows2 = {r["k"]: r["_commit_version"] for r in got2.collect()}
    assert rows2 == {1: 1, 2: 1, 3: 2, 4: 3}  # sink is cumulative
    # exactly-once: no key appears twice in the sink
    assert got2.count() == 4


def test_optimize_commit_is_invisible_to_stream_and_cdf(spark, tmp_path):
    """Compaction re-adds every row in new files; dataChange=false must
    keep both the stream and txn_changes from double-emitting them."""
    table = str(tmp_path / "t")
    for i in range(3):
        TL.txn_append(spark, _df(spark, [(i, "a", float(i))]), table, [])
    res = TL.txn_optimize(spark, table)
    assert res["skipped"] is False and res["version"] == 4

    got = _drain(
        spark, table, str(tmp_path / "cp"), str(tmp_path / "out")
    )
    assert got.count() == 3  # not 6
    assert {r["_commit_version"] for r in got.collect()} == {1, 2, 3}

    cdf = TL.txn_changes(spark, table, from_version=0)
    assert cdf.count() == 3
    assert {r["_commit_version"] for r in cdf.collect()} == {1, 2, 3}

    # appends after the optimize still stream
    TL.txn_append(spark, _df(spark, [(9, "a", 9.0)]), table, [])
    got2 = _drain(
        spark, table, str(tmp_path / "cp"), str(tmp_path / "out")
    )
    assert got2.count() == 4


def test_starting_version_skips_history(spark, tmp_path):
    table = str(tmp_path / "t")
    TL.txn_append(spark, _df(spark, [(1, "a", 1.0)]), table, [])
    TL.txn_append(spark, _df(spark, [(2, "a", 2.0)]), table, [])
    got = _drain(
        spark, table, str(tmp_path / "cp"), str(tmp_path / "out"),
        starting=1,
    )
    assert {r["k"] for r in got.collect()} == {2}


def test_partitioned_table_streams_partition_values(spark, tmp_path):
    table = str(tmp_path / "t")
    TL.txn_append(
        spark, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), table, ["p"]
    )
    got = _drain(
        spark, table, str(tmp_path / "cp"), str(tmp_path / "out")
    )
    assert {(r["k"], r["p"]) for r in got.collect()} == {(1, "a"), (2, "b")}


def test_batch_read_points_to_txn_read(spark, tmp_path):
    table = str(tmp_path / "t")
    TL.txn_append(spark, _df(spark, [(1, "a", 1.0)]), table, [])
    txn_stream.register(spark)
    with pytest.raises(Exception, match="txn_read"):
        spark.read.format("txn_table").option("path", table).load().collect()


def test_starting_version_latest_tails_only_new_commits(spark, tmp_path):
    """'latest' starts at the head — the entry point for a table whose
    early history was compacted and vacuumed (a from-0 replay would
    hit removed files)."""
    table = str(tmp_path / "t")
    TL.txn_append(spark, _df(spark, [(1, "a", 1.0)]), table, [])
    TL.txn_optimize(spark, table)  # layout-only, but advances head
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    got = _drain(spark, table, cp, out, starting="latest")
    assert got.count() == 0  # nothing after stream start yet
    TL.txn_append(spark, _df(spark, [(2, "a", 2.0)]), table, [])
    got2 = _drain(spark, table, cp, out, starting="latest")
    assert {r["k"] for r in got2.collect()} == {2}


def test_max_files_per_batch_paces_a_mid_run_burst(spark, tmp_path):
    """A burst of commits landing mid-run drains as bounded micro-
    batches (admission control), not one giant batch; every row still
    arrives exactly once. The first trigger of a (re)started reader is
    deliberately unpaced — the python stream API gives latestOffset no
    view of the checkpointed offset, and a paced first call would
    strand availableNow restarts below the committed offset."""
    import time

    table = str(tmp_path / "t")
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    TL.txn_append(spark, _df(spark, [(0, "a", 0.0)]).coalesce(1), table, [])
    txn_stream.register(spark)
    q = (
        spark.readStream.format("txn_table")
        .option("path", table)
        .option("maxFilesPerBatch", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        # burst: 6 single-file commits land while the stream runs
        for i in range(1, 7):
            TL.txn_append(
                spark, _df(spark, [(i, "a", float(i))]).coalesce(1),
                table, [],
            )
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() == 7:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert spark.read.parquet(out).count() == 7
        # the burst was split: >= 3 post-burst batches carried data
        # (6 files at <=2 per batch), visible in progress history
        data_batches = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(data_batches) >= 4  # initial + >=3 burst batches
        assert max(
            p["numInputRows"] for p in data_batches[1:]
        ) <= 2, [p["numInputRows"] for p in data_batches]
    finally:
        q.stop()
    got = {r["k"] for r in spark.read.parquet(out).collect()}
    assert got == set(range(7))


def test_read_change_feed_streams_full_cdf(spark, tmp_path):
    """readChangeFeed=true: the stream emits the SAME change rows as
    batch txn_changes(change_types=True) — inserts, delete rows, and
    update pre/post image pairs, each tagged (_change_type,
    _commit_version)."""
    table = str(tmp_path / "t")
    TL.txn_append(
        spark, _df(spark, [(k, "a", float(k)) for k in (1, 2, 3)]).coalesce(1),
        table, [],
    )                                                    # v1: inserts
    from pyspark.sql import functions as F

    TL.txn_delete(spark, table, F.col("k") == 2)         # v2: delete
    TL.txn_update(spark, table, "k = 3", {"v": "30.0"})  # v3: update
    TL.txn_optimize(spark, table, target_file_bytes=1 << 30)  # v4: invisible

    txn_stream.register(spark)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        spark.readStream.format("txn_table")
        .option("path", table)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r["k"], r["_change_type"], r["_commit_version"], r["v"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["k"], r["_change_type"], r["_commit_version"], r["v"])
        for r in TL.txn_changes(
            spark, table, 0, change_types=True
        ).collect()
    }
    assert got == want
    assert (1, "insert", 1, 1.0) in got
    assert (2, "delete", 2, 2.0) in got
    assert (3, "update_preimage", 3, 3.0) in got
    assert (3, "update_postimage", 3, 30.0) in got
    assert not any(cv == 4 for _, _, cv, _ in got)  # optimize invisible


def test_overwrite_retracts_through_cdf_batch_and_stream(spark, tmp_path):
    """replaceWhere through the change feed: the removed partition's
    live rows emit as ``delete`` (pre-existing vectored rows do NOT
    re-delete), the replacement emits as ``insert`` — identically in
    batch txn_changes and the readChangeFeed stream."""
    from pyspark.sql import functions as F

    table = str(tmp_path / "t")
    TL.txn_append(
        spark,
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)])
        .repartition(2, "p"),
        table,
        ["p"],
    )                                                  # v1: inserts
    TL.txn_delete(spark, table, F.col("k") == 2)       # v2: delete (a)
    TL.txn_overwrite_where(
        spark, table, _df(spark, [(9, "a", 9.0)]), {"p": "a"}
    )                                                  # v3: replace a
    ch = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in TL.txn_changes(
            spark, table, 0, change_types=True
        ).collect()
    }
    assert (1, "delete", 3) in ch       # live row of replaced files
    assert (2, "delete", 2) in ch       # the vectored delete, at v2
    assert (2, "delete", 3) not in ch   # dead row never re-deletes
    assert (9, "insert", 3) in ch
    assert (3, "delete", 3) not in ch   # other partition untouched
    txn_stream.register(spark)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        spark.readStream.format("txn_table")
        .option("path", table)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r["k"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == ch
