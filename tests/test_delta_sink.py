"""Idempotent STREAMING writer for external Delta tables
(delta_streaming_sink): SetTransaction-ledger exactly-once under
batch replay and worst-case checkpoint rebuild, hive-partitioned
layout + add.stats on the written files, ledger survival across
checkpoint + log cleanup (the spec's txn column), and schema /
partitioning guards."""

import glob
import json
import os

import pytest

from django_datastream_spark.sources import delta as DL


def _batch(spark, ids):
    rows = [(int(i), float(i) * 0.5, int(i) % 2) for i in ids]
    return spark.createDataFrame(
        rows, "doc_id long, val double, part int"
    )


def _read_ids(spark, root):
    return sorted(
        r["doc_id"] for r in DL.read_delta(spark, root).collect()
    )


def test_sink_creates_appends_and_refuses_replay(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = DL.delta_streaming_sink(root, "app-1", partition_by=["part"])
    sink(_batch(spark, range(10)), 0)
    sink(_batch(spark, range(10, 16)), 1)
    assert _read_ids(spark, root) == list(range(16))
    # hive layout: data files under part=N dirs, partition col NOT in
    # the files themselves
    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(root, "part=*", "*.parquet"))
    assert files
    assert "part" not in pq.ParquetFile(files[0]).schema_arrow.names
    # every add carries stats (numRecords + min/max for doc_id)
    _v, _md, adds = DL.delta_snapshot(root)
    for a in adds:
        st = json.loads(a["stats"])
        assert st["numRecords"] > 0
        assert "doc_id" in st["minValues"]
    # REPLAY of both batches (stream checkpoint rebuilt): ledger
    # refuses them, table unchanged, no orphan files appear
    before = sorted(glob.glob(os.path.join(root, "part=*", "*")))
    sink(_batch(spark, range(10)), 0)
    sink(_batch(spark, range(10, 16)), 1)
    assert _read_ids(spark, root) == list(range(16))
    assert sorted(glob.glob(os.path.join(root, "part=*", "*"))) == before
    assert DL.last_txn_versions(root) == {"app-1": 1}
    # a NEW batch still lands
    sink(_batch(spark, [100, 101]), 2)
    assert _read_ids(spark, root) == list(range(16)) + [100, 101]


def test_sink_ledger_survives_checkpoint_and_cleanup(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = DL.delta_streaming_sink(root, "app-cp")
    sink(_batch(spark, range(5)), 0)
    sink(_batch(spark, range(5, 8)), 1)
    head = max(DL.delta_versions(root))
    DL.write_delta_checkpoint(root, head)
    # simulate log cleanup: drop every JSON commit <= the checkpoint
    for v in range(head + 1):
        os.remove(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    # the ledger folds from the checkpoint's txn column
    assert DL.last_txn_versions(root) == {"app-cp": 1}
    sink(_batch(spark, range(5)), 0)  # replay: still refused
    sink(_batch(spark, range(5, 8)), 1)
    assert _read_ids(spark, root) == list(range(8))
    # new batches append at versions ABOVE the checkpoint
    sink(_batch(spark, [50]), 2)
    assert _read_ids(spark, root) == list(range(8)) + [50]
    assert max(DL.delta_versions(root)) == head + 1


def test_checkpoint_carries_folded_protocol(spark, tmp_path):
    """A DV-bearing published table must checkpoint its REAL protocol
    (reader 3 / writer 7 + features), not a hardcoded 1/2."""
    import pyarrow.parquet as pq

    from tests.test_delta import _PROTO, _add, _meta, _write_data

    root = str(tmp_path / "t")
    _write_data(root, "a.parquet", range(4))
    DL.write_delta_commit(
        root, 0,
        [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                       "readerFeatures": ["deletionVectors"],
                       "writerFeatures": ["deletionVectors"]}},
         _meta(partitioned=False), _add("a.parquet")],
    )
    DL.write_delta_checkpoint(root, 0)
    cp = os.path.join(root, "_delta_log", f"{0:020d}.checkpoint.parquet")
    col = pq.read_table(cp, columns=["protocol"]).column("protocol")
    protos = [p for p in col.to_pylist() if p]
    assert protos == [{
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }]
    # and the folded snapshot still reads (protocol check passes)
    assert sorted(
        r["doc_id"] for r in DL.read_delta(spark, root).collect()
    ) == [0, 1, 2, 3]


def test_sink_guards_schema_and_partitioning(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = DL.delta_streaming_sink(root, "app-g", partition_by=["part"])
    sink(_batch(spark, range(4)), 0)
    bad = spark.createDataFrame(
        [(1, "x")], "doc_id long, other string"
    )
    with pytest.raises(ValueError, match="does not match the"):
        DL.delta_streaming_sink(root, "app-g")(bad, 1)
    with pytest.raises(ValueError, match="partitionColumns"):
        DL.delta_streaming_sink(root, "app-g", partition_by=["doc_id"])(
            _batch(spark, range(4)), 1
        )
    # same-schema sink without explicit partition_by adopts the
    # table's partitioning
    DL.delta_streaming_sink(root, "app-g")(_batch(spark, [9]), 1)
    assert _read_ids(spark, root) == [0, 1, 2, 3, 9]


def test_sink_through_real_stream_exactly_once(spark, tmp_path):
    """delta_table source → delta_streaming_sink: the full external
    round-trip as ONE stream, then the whole availableNow run repeats
    with a FRESH stream checkpoint — worst-case redelivery; the
    SetTransaction ledger must refuse every replayed batch."""
    from django_datastream_spark.sources import external_stream as XS
    from tests.test_delta import _PROTO, _add, _meta, _write_data

    src = str(tmp_path / "src")
    _write_data(src, "f0.parquet", range(8))
    DL.write_delta_commit(
        src, 0, [_PROTO, _meta(partitioned=False), _add("f0.parquet")]
    )
    _write_data(src, "f1.parquet", range(8, 12))
    DL.write_delta_commit(src, 1, [_add("f1.parquet")])
    XS.register(spark)
    dest = str(tmp_path / "dest")

    def _run(cp):
        q = (
            spark.readStream.format("delta_table")
            .option("path", src)
            .option("maxFilesPerTrigger", "1")
            .load()
            .writeStream.foreachBatch(
                DL.delta_streaming_sink(dest, "rt-app")
            )
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    # paced source: one slice per availableNow run — drain fully
    for i in range(4):
        _run(str(tmp_path / "cp1"))
        got = DL.read_delta(spark, dest)
        if got.count() == 12:
            break
    assert _read_ids(spark, dest) == list(range(12))
    # rebuild the stream checkpoint: every batch re-offered
    _run(str(tmp_path / "cp2"))
    _run(str(tmp_path / "cp2"))
    assert _read_ids(spark, dest) == list(range(12))


def test_optimize_compacts_and_streams_skip_it(spark, tmp_path):
    """OPTIMIZE rewrites many small sink files into few, dataChange=
    false: reads are unchanged (including per-partition), streaming
    consumers skip the compaction commit entirely, and a fresh
    full replay still serves every original commit's rows."""
    from django_datastream_spark.sources import external_stream as XS

    root = str(tmp_path / "t")
    sink = DL.delta_streaming_sink(root, "opt-app", partition_by=["part"])
    for b in range(4):
        sink(_batch(spark, range(b * 4, b * 4 + 4)), b)
    _v, _md, adds0 = DL.delta_snapshot(root)
    res = DL.optimize_delta(spark, root, target_file_bytes=1 << 20)
    assert not res["skipped"]
    assert res["rewritten_files"] == len(adds0)
    _v, _md, adds1 = DL.delta_snapshot(root)
    assert len(adds1) < len(adds0)
    assert all(json.loads(a["stats"])["numRecords"] > 0 for a in adds1)
    assert _read_ids(spark, root) == list(range(16))
    # time travel to the pre-OPTIMIZE version still reads (originals
    # stay on disk until vacuum)
    pre = res["version"] - 1
    assert sorted(
        r["doc_id"]
        for r in DL.read_delta(spark, root, version=pre).collect()
    ) == list(range(16))
    # streaming: the compaction commit contributes NOTHING (its adds
    # are dataChange=false), so a fresh replay emits exactly the
    # original 4 commits' rows
    XS.register(spark)
    q = (
        spark.readStream.format("delta_table")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == 16
    assert got.agg({"_commit_version": "max"}).first()[0] == 3


def test_optimize_materializes_deletion_vectors(spark, tmp_path):
    from tests.test_delta import _PROTO, _add, _meta, _write_data
    from tests.test_delta_dv import _dv_commit_actions

    root = str(tmp_path / "t")
    _write_data(root, "a.parquet", range(10))
    DL.write_delta_commit(
        root, 0, [_PROTO, _meta(partitioned=False), _add("a.parquet")]
    )
    DL.write_delta_commit(
        root, 1, _dv_commit_actions(root, "a.parquet", [2, 5], "u")
    )
    res = DL.optimize_delta(spark, root, target_file_bytes=1)
    assert not res["skipped"]  # DV'd file rewrites even when "big"
    _v, _md, adds = DL.delta_snapshot(root)
    assert all(not a.get("deletionVector") for a in adds)
    assert _read_ids(spark, root) == [0, 1, 3, 4, 6, 7, 8, 9]


def test_vacuum_and_log_cleanup(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = DL.delta_streaming_sink(
        root, "vac-app", partition_by=["part"], checkpoint_every=None
    )
    for b in range(3):
        sink(_batch(spark, range(b * 3, b * 3 + 3)), b)
    DL.optimize_delta(spark, root, target_file_bytes=1 << 20)
    n_files = len(glob.glob(os.path.join(root, "part=*", "*.parquet")))
    res = DL.vacuum_delta(root, keep_versions=1)
    assert res["removed_files"] > 0
    left = glob.glob(os.path.join(root, "part=*", "*.parquet"))
    assert len(left) < n_files
    assert _read_ids(spark, root) == list(range(9))
    # time travel below the kept window now fails on missing files
    import pytest as _pt

    with _pt.raises(Exception):
        DL.read_delta(spark, root, version=0).collect()
    # checkpoint + log cleanup: snapshot and LEDGER survive
    head = max(DL.delta_versions(root))
    DL.write_delta_checkpoint(root, head)
    res2 = DL.cleanup_delta_log(root)
    assert res2["removed_commits"] == head + 1
    assert _read_ids(spark, root) == list(range(9))
    assert DL.last_txn_versions(root) == {"vac-app": 2}
    sink(_batch(spark, [99]), 2)  # replay: refused post-cleanup
    assert _read_ids(spark, root) == list(range(9))
    sink(_batch(spark, [99]), 3)
    assert _read_ids(spark, root) == list(range(9)) + [99]


def test_sink_auto_checkpoints(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = DL.delta_streaming_sink(root, "ck-app", checkpoint_every=2)
    for b in range(4):
        sink(_batch(spark, [b]), b)
    cps = glob.glob(
        os.path.join(root, "_delta_log", "*.checkpoint.parquet")
    )
    assert sorted(os.path.basename(p) for p in cps) == [
        f"{1:020d}.checkpoint.parquet",
        f"{3:020d}.checkpoint.parquet",
    ]
    assert _read_ids(spark, root) == [0, 1, 2, 3]


def test_vacuum_after_log_cleanup(spark, tmp_path):
    """vacuum on a CLEANED log must fold the live set from the
    checkpoint (a json-only version listing is empty there) — the r9
    bug class where vacuum deleted every live file."""
    root = str(tmp_path / "t")
    sink = DL.delta_streaming_sink(root, "vc-app", checkpoint_every=None)
    for b in range(3):
        sink(_batch(spark, range(b * 2, b * 2 + 2)), b)
    DL.write_delta_checkpoint(root, max(DL.delta_versions(root)))
    DL.cleanup_delta_log(root)
    res = DL.vacuum_delta(root, keep_versions=1)
    assert res["kept_versions"] == [2]
    assert _read_ids(spark, root) == list(range(6))


def test_engine_txn_to_delta_sink_continuous_export(spark, tmp_path):
    """The engine→lakehouse EXPORT loop: an engine txn table streams
    through the txn_table source into delta_streaming_sink — new
    engine commits tail incrementally into the external Delta table
    through one checkpoint, exactly once."""
    from django_datastream_spark import txnlog as TL
    from django_datastream_spark.sources import txn_stream

    src = str(tmp_path / "engine")
    TL.txn_append(spark, _batch(spark, range(6)), src, [])
    txn_stream.register(spark)
    dest = str(tmp_path / "delta")

    def _run(cp):
        q = (
            spark.readStream.format("txn_table")
            .option("path", src)
            .load()
            .writeStream.foreachBatch(
                DL.delta_streaming_sink(dest, "export-app")
            )
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    cp = str(tmp_path / "cp")
    _run(cp)
    assert _read_ids(spark, dest) == list(range(6))
    # a NEW engine commit tails through the same checkpoint
    TL.txn_append(spark, _batch(spark, [50, 51]), src, [])
    _run(cp)
    assert _read_ids(spark, dest) == list(range(6)) + [50, 51]
    # worst-case redelivery: fresh stream checkpoint, ledger refuses
    _run(str(tmp_path / "cp2"))
    assert _read_ids(spark, dest) == list(range(6)) + [50, 51]


def test_sink_merge_schema_evolution(spark, tmp_path):
    """merge_schema=True: a new batch column APPENDS to the table
    schema (old rows null-fill), a batch missing existing columns
    still writes, and type conflicts always raise."""
    root = str(tmp_path / "t")
    DL.delta_streaming_sink(root, "ev-app")(_batch(spark, range(4)), 0)
    plus = spark.createDataFrame(
        [(10, 5.0, 0, "x"), (11, 5.5, 1, "y")],
        "doc_id long, val double, part int, tag string",
    )
    with pytest.raises(ValueError, match="merge_schema"):
        DL.delta_streaming_sink(root, "ev-app")(plus, 1)
    DL.delta_streaming_sink(root, "ev-app", merge_schema=True)(plus, 1)
    got = DL.read_delta(spark, root)
    assert [f.name for f in got.schema.fields] == [
        "doc_id", "val", "part", "tag"
    ]
    rows = {r["doc_id"]: r["tag"] for r in got.collect()}
    assert rows[10] == "x" and rows[0] is None
    # a batch missing 'val' writes; reads null-fill it
    sub = spark.createDataFrame(
        [(20, 0, "z")], "doc_id long, part int, tag string"
    )
    DL.delta_streaming_sink(root, "ev-app", merge_schema=True)(sub, 2)
    r20 = DL.read_delta(spark, root).filter("doc_id = 20").first()
    assert r20["val"] is None and r20["tag"] == "z"
    # type conflict refuses even under merge_schema
    bad = spark.createDataFrame([(1, "s", 0)], "doc_id long, val string, part int")
    with pytest.raises(ValueError, match="type conflicts"):
        DL.delta_streaming_sink(root, "ev-app", merge_schema=True)(bad, 3)


def test_sink_exactly_once_under_adversarial_replay_schedule(spark, tmp_path):
    """Property (md5-deterministic schedule): any interleaving of
    fresh batches and replays — including repeated and stale ones —
    lands EXACTLY one copy of each batch, in both sinks."""
    import hashlib

    from django_datastream_spark.sources import iceberg as IB

    droot = str(tmp_path / "d")
    iroot = str(tmp_path / "i")
    batches = {b: list(range(b * 10, b * 10 + 3)) for b in range(5)}
    # schedule: after each fresh batch, replay a md5-chosen prefix
    schedule = []
    for b in range(5):
        schedule.append(b)
        h = hashlib.md5(f"replay:{b}".encode()).digest()
        for k in range(h[0] % 3):
            schedule.append(h[k + 1] % (b + 1))  # any already-sent id
    for b in schedule:
        df = _batch(spark, batches[b])
        DL.delta_streaming_sink(droot, "adv")(df, b)
        IB.iceberg_streaming_sink(iroot, "adv")(
            df.drop("part"), b
        )
    want = sorted(i for ids in batches.values() for i in ids)
    assert _read_ids(spark, droot) == want
    assert sorted(
        r["doc_id"] for r in IB.read_iceberg(spark, iroot).collect()
    ) == want
    assert DL.last_txn_versions(droot) == {"adv": 4}
    assert IB.last_sink_batch(iroot, "adv") == 4


def test_sink_null_partition_values(spark, tmp_path):
    """A null in a partition column lands as the hive sentinel dir
    but its add records a NULL partitionValue (the spec's rule), and
    the read restores the null — through the sink AND a later
    OPTIMIZE rewrite."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(0, 0.0, 0), (1, 0.5, None), (2, 1.0, 1)],
        "doc_id long, val double, part int",
    )
    DL.delta_streaming_sink(root, "np-app", partition_by=["part"])(df, 0)
    _v, _md, adds = DL.delta_snapshot(root)
    assert any(a["partitionValues"]["part"] is None for a in adds)
    got = {
        r["doc_id"]: r["part"]
        for r in DL.read_delta(spark, root).collect()
    }
    assert got == {0: 0, 1: None, 2: 1}
    DL.optimize_delta(spark, root, target_file_bytes=1 << 20)
    got2 = {
        r["doc_id"]: r["part"]
        for r in DL.read_delta(spark, root).collect()
    }
    assert got2 == got


def test_optimize_after_log_cleanup_and_vacuum_spares_staging(spark, tmp_path):
    """optimize_delta on a CLEANED log commits at the checkpoint-aware
    folded version + 1 (a json-only head listing crashed here), the
    rewritten checkpoint still carries the folded protocol, and
    vacuum never descends into a live writer's _staging_ subtree."""
    root = str(tmp_path / "t")
    sink = DL.delta_streaming_sink(root, "oc-app", checkpoint_every=None)
    for b in range(3):
        sink(_batch(spark, range(b * 2, b * 2 + 2)), b)
    DL.write_delta_checkpoint(root, max(DL.delta_versions(root)))
    DL.cleanup_delta_log(root)
    res = DL.optimize_delta(spark, root, target_file_bytes=1 << 20)
    assert not res["skipped"] and res["version"] == 3
    assert _read_ids(spark, root) == list(range(6))
    # a live writer's staged (unreferenced) file survives vacuum
    staged = os.path.join(root, "_staging_live", "part=0")
    os.makedirs(staged, exist_ok=True)
    with open(os.path.join(staged, "f.parquet"), "wb") as f:
        f.write(b"mid-write")
    DL.vacuum_delta(root, keep_versions=1)
    assert os.path.exists(os.path.join(staged, "f.parquet"))
    assert _read_ids(spark, root) == list(range(6))


def test_checkpoint_protocol_survives_log_cleanup(spark, tmp_path):
    """_fold_protocol starts from the checkpoint's protocol row: after
    cleanup deletes the commit that carried the feature upgrade, a
    LATER checkpoint must not downgrade a DV table to reader 1/2."""
    import pyarrow.parquet as pq

    from tests.test_delta import _add, _meta, _write_data

    root = str(tmp_path / "t")
    _write_data(root, "a.parquet", range(4))
    DL.write_delta_commit(
        root, 0,
        [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                       "readerFeatures": ["deletionVectors"],
                       "writerFeatures": ["deletionVectors"]}},
         _meta(partitioned=False), _add("a.parquet")],
    )
    DL.write_delta_checkpoint(root, 0)
    DL.cleanup_delta_log(root)  # the protocol commit is GONE
    _write_data(root, "b.parquet", [9])
    DL.write_delta_commit(root, 1, [_add("b.parquet")])
    DL.write_delta_checkpoint(root, 1)
    cp = os.path.join(root, "_delta_log", f"{1:020d}.checkpoint.parquet")
    protos = [
        p for p in pq.read_table(cp, columns=["protocol"])
        .column("protocol").to_pylist() if p
    ]
    assert protos[0]["minReaderVersion"] == 3
    assert protos[0]["readerFeatures"] == ["deletionVectors"]


def test_cleanup_retention_keeps_newest_commits(spark, tmp_path):
    """keep_commits: the log-retention knob the external churn soak
    motivated — live streaming consumers lagging up to N commits (and
    stream restarts re-planning their last batch) keep replaying."""
    root = str(tmp_path / "t")
    sink = DL.delta_streaming_sink(root, "app", checkpoint_every=None)
    for b in range(6):
        sink(
            spark.createDataFrame([(b, float(b))], "k long, v double"),
            b,
        )
    DL.write_delta_checkpoint(root, 5)
    res = DL.cleanup_delta_log(root, keep_commits=3)
    assert res["removed_commits"] == 3  # 0,1,2 gone; 3,4,5 retained
    assert DL.delta_versions(root) == [3, 4, 5]
    # retained tail still serves incremental replay
    ch = DL.delta_changes(spark, root, 2, on_remove="ignore")
    assert sorted(r["k"] for r in ch.collect()) == [3, 4, 5]
    # no retention: everything at/below the checkpoint goes
    res2 = DL.cleanup_delta_log(root)
    assert DL.delta_versions(root) == []
    assert res2["removed_commits"] == 3
