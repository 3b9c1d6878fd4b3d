"""Idempotent STREAMING writer for external Iceberg tables
(iceberg_streaming_sink): snapshot-summary ledger exactly-once under
replay, lineage-ordered snapshot chain with non-monotonic ids,
manifest carry-forward (fast-append), footer bounds on new
manifests, and the full source→sink round trip."""

import os

import pytest

from django_datastream_spark.sources import avro_lite as AV
from django_datastream_spark.sources import iceberg as IB


def _batch(spark, ids):
    rows = [(int(i), float(i) * 0.5) for i in ids]
    return spark.createDataFrame(rows, "doc_id long, val double")


def _read_ids(spark, root, snapshot_id=None):
    df = IB.read_iceberg(spark, root, snapshot_id=snapshot_id)
    return sorted(r["doc_id"] for r in df.collect())


def test_iceberg_sink_creates_appends_refuses_replay(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = IB.iceberg_streaming_sink(root, "app-1")
    sink(_batch(spark, range(6)), 0)
    sink(_batch(spark, range(6, 10)), 1)
    assert _read_ids(spark, root) == list(range(10))
    md = IB.iceberg_metadata(root)
    chain = IB._lineage_chain(md, md["current-snapshot-id"])
    assert len(chain) == 2
    assert chain[0].get("parent-snapshot-id") is None
    assert chain[1]["parent-snapshot-id"] == chain[0]["snapshot-id"]
    # time travel to the first snapshot
    assert _read_ids(
        spark, root, snapshot_id=chain[0]["snapshot-id"]
    ) == list(range(6))
    # REPLAY both batches: the summary ledger refuses them
    sink(_batch(spark, range(6)), 0)
    sink(_batch(spark, range(6, 10)), 1)
    md2 = IB.iceberg_metadata(root)
    assert len(md2["snapshots"]) == 2
    assert _read_ids(spark, root) == list(range(10))
    assert IB.last_sink_batch(root, "app-1") == 1
    # new batch appends; snapshot 2's manifest list CARRIES the old
    # manifests unchanged (fast-append) + one new ADDED manifest
    sink(_batch(spark, [50]), 2)
    md3 = IB.iceberg_metadata(root)
    chain3 = IB._lineage_chain(md3, md3["current-snapshot-id"])
    mlist = IB._resolve(root, md3, chain3[-1]["manifest-list"])
    _s, recs = AV.read_container_file(mlist)
    assert len(recs) == 3
    sids = {r["added_snapshot_id"] for r in recs}
    assert sids == {c["snapshot-id"] for c in chain3}
    assert _read_ids(spark, root) == list(range(10)) + [50]


def test_iceberg_sink_changes_attribution_and_bounds(spark, tmp_path):
    """iceberg_changes over a sink-written table attributes each row
    to exactly the snapshot that appended it, and new manifests carry
    footer bounds (manifest-level data skipping works)."""
    root = str(tmp_path / "t")
    sink = IB.iceberg_streaming_sink(root, "app-c")
    sink(_batch(spark, range(5)), 0)
    sink(_batch(spark, range(100, 103)), 1)
    md = IB.iceberg_metadata(root)
    chain = IB._lineage_chain(md, md["current-snapshot-id"])
    ch = IB.iceberg_changes(spark, root, None)
    got = sorted(
        (r["doc_id"], r["_snapshot_id"]) for r in ch.collect()
    )
    assert got == sorted(
        [(i, chain[0]["snapshot-id"]) for i in range(5)]
        + [(i, chain[1]["snapshot-id"]) for i in range(100, 103)]
    )
    # bounds: a doc_id filter prunes the first snapshot's files
    mlist = IB._resolve(root, md, chain[-1]["manifest-list"])
    _s, recs = AV.read_container_file(mlist)
    man = IB._resolve(root, md, recs[0]["manifest_path"])
    _s2, entries = AV.read_container_file(man)
    assert entries[0]["data_file"]["lower_bounds"] is not None


def test_iceberg_sink_schema_guard(spark, tmp_path):
    root = str(tmp_path / "t")
    sink = IB.iceberg_streaming_sink(root, "app-g")
    sink(_batch(spark, range(3)), 0)
    bad = spark.createDataFrame([(1, "x")], "doc_id long, tag string")
    with pytest.raises(ValueError, match="does not match the"):
        IB.iceberg_streaming_sink(root, "app-g")(bad, 1)


def test_iceberg_sink_streams_back(spark, tmp_path):
    """Sink-written snapshots replay through the iceberg_table
    streaming source in lineage order, exactly once per snapshot."""
    from django_datastream_spark.sources import external_stream as XS

    root = str(tmp_path / "t")
    sink = IB.iceberg_streaming_sink(root, "app-s")
    sink(_batch(spark, range(4)), 0)
    sink(_batch(spark, range(4, 7)), 1)
    XS.register(spark)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        spark.readStream.format("iceberg_table")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    md = IB.iceberg_metadata(root)
    chain = IB._lineage_chain(md, md["current-snapshot-id"])
    rows = sorted(
        (r["doc_id"], r["_snapshot_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert rows == sorted(
        [(i, chain[0]["snapshot-id"]) for i in range(4)]
        + [(i, chain[1]["snapshot-id"]) for i in range(4, 7)]
    )


def test_delta_source_to_iceberg_sink_exactly_once(spark, tmp_path):
    """Cross-format round trip: Delta source → Iceberg sink, then the
    whole availableNow run repeats with a fresh stream checkpoint —
    the snapshot-summary ledger must refuse every replayed batch."""
    from django_datastream_spark.sources import delta as DL
    from django_datastream_spark.sources import external_stream as XS
    from tests.test_delta import _PROTO, _add, _meta, _write_data

    src = str(tmp_path / "src")
    _write_data(src, "f0.parquet", range(6))
    DL.write_delta_commit(
        src, 0, [_PROTO, _meta(partitioned=False), _add("f0.parquet")]
    )
    _write_data(src, "f1.parquet", range(6, 9))
    DL.write_delta_commit(src, 1, [_add("f1.parquet")])
    XS.register(spark)
    dest = str(tmp_path / "dest")

    def _run(cp):
        q = (
            spark.readStream.format("delta_table")
            .option("path", src)
            .load()
            .writeStream.foreachBatch(
                IB.iceberg_streaming_sink(dest, "xfmt-app")
            )
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    _run(str(tmp_path / "cp1"))
    assert _read_ids(spark, dest) == list(range(9))
    _run(str(tmp_path / "cp2"))  # fresh checkpoint: full redelivery
    assert _read_ids(spark, dest) == list(range(9))
    md = IB.iceberg_metadata(dest)
    assert len(md["snapshots"]) == 1  # one batch landed once


def test_optimize_iceberg_compacts_and_incrementals_skip(spark, tmp_path):
    """Compaction = one REPLACE snapshot: reads unchanged, time
    travel intact, iceberg_changes and the streaming source skip it
    (same rows, new layout), attribution on full replay exact."""
    from django_datastream_spark.sources import external_stream as XS

    root = str(tmp_path / "t")
    sink = IB.iceberg_streaming_sink(root, "app-o")
    for b in range(3):
        sink(_batch(spark, range(b * 4, b * 4 + 4)), b)
    md0 = IB.iceberg_metadata(root)
    chain0 = IB._lineage_chain(md0, md0["current-snapshot-id"])
    res = IB.optimize_iceberg(spark, root, target_file_bytes=1 << 20)
    assert not res["skipped"]
    assert _read_ids(spark, root) == list(range(12))
    # fewer live files now
    _md, data, _d = IB._snapshot_files(root)
    assert len(data) == res["new_files"] < res["rewritten_files"]
    # time travel to pre-compaction snapshots
    assert _read_ids(
        spark, root, snapshot_id=chain0[-1]["snapshot-id"]
    ) == list(range(12))
    assert _read_ids(
        spark, root, snapshot_id=chain0[0]["snapshot-id"]
    ) == list(range(4))
    # incremental consumption SKIPS the replace snapshot but keeps
    # exact attribution for the original appends
    ch = IB.iceberg_changes(spark, root, None)
    got = sorted((r["doc_id"], r["_snapshot_id"]) for r in ch.collect())
    want = sorted(
        (i, chain0[b]["snapshot-id"])
        for b in range(3)
        for i in range(b * 4, b * 4 + 4)
    )
    assert got == want
    # streaming full replay: 12 rows, none from the replace snapshot
    XS.register(spark)
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        spark.readStream.format("iceberg_table")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    landed = spark.read.parquet(out)
    assert landed.count() == 12
    sids = {r["_snapshot_id"] for r in landed.collect()}
    assert sids == {c["snapshot-id"] for c in chain0}
    # the sink's ledger survived the metadata rewrite
    assert IB.last_sink_batch(root, "app-o") == 2


@pytest.mark.slow
def test_expire_snapshots_and_absolute_stream_offsets(spark, tmp_path):
    """OPTIMIZE then EXPIRE: the superseded originals (referenced only
    by expired snapshots) are reclaimed; a CAUGHT-UP stream resumes
    across expiry (positions are absolute via the
    engine.expired-positions property) while a checkpoint below the
    horizon raises; the sink keeps appending after expiry."""
    import glob

    from django_datastream_spark.sources import external_stream as XS

    root = str(tmp_path / "t")
    sink = IB.iceberg_streaming_sink(root, "app-e")
    for b in range(3):
        sink(_batch(spark, range(b * 3, b * 3 + 3)), b)
    XS.register(spark)

    def _drain(cp, out, **opts):
        r = spark.readStream.format("iceberg_table").option("path", root)
        for k, v in opts.items():
            r = r.option(k, v)
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

    # consumer A catches up fully; consumer B consumes only snap 1
    a_cp, a_out = str(tmp_path / "acp"), str(tmp_path / "aout")
    assert _drain(a_cp, a_out).count() == 9
    b_cp, b_out = str(tmp_path / "bcp"), str(tmp_path / "bout")
    assert _drain(
        b_cp, b_out, maxSnapshotsPerTrigger="1"
    ).count() == 3

    # compact, then expire everything but the replace snapshot: the
    # superseded originals lose their last reference and are removed
    IB.optimize_iceberg(spark, root, target_file_bytes=1 << 20)
    n_before = len(glob.glob(os.path.join(root, "data", "*.parquet")))
    res = IB.expire_snapshots(root, keep_snapshots=1)
    assert res["expired"] == 3 and res["removed_files"] > 0
    md = IB.iceberg_metadata(root)
    assert len(md["snapshots"]) == 1
    assert md["properties"]["engine.expired-positions"] == "3"
    # the sink's idempotence ledger survives expiring its snapshots
    # (folded into the sink-ledger table property)
    assert IB.last_sink_batch(root, "app-e") == 2
    sink(_batch(spark, range(9)), 2)  # replay of batch 2: refused
    assert _read_ids(spark, root) == list(range(9))
    assert _read_ids(spark, root) == list(range(9))
    assert len(
        glob.glob(os.path.join(root, "data", "*.parquet"))
    ) < n_before
    # time travel to an expired snapshot raises
    with pytest.raises(Exception):
        IB.read_iceberg(spark, root, snapshot_id=12345).collect()
    # sink appends post-expiry; consumer A resumes EXACTLY (skipping
    # the replace snapshot, landing only the new rows), positions
    # unshifted across the horizon
    sink(_batch(spark, [100, 101]), 3)
    got = _drain(a_cp, a_out)
    assert got.count() == 11
    md2 = IB.iceberg_metadata(root)
    chain2 = IB._lineage_chain(md2, md2["current-snapshot-id"])
    new_sid = chain2[-1]["snapshot-id"]
    assert sorted(
        r["doc_id"]
        for r in got.filter(f"_snapshot_id = {new_sid}").collect()
    ) == [100, 101]
    # consumer B (below the horizon) fails loudly, never silently
    with pytest.raises(Exception, match="expiry horizon|expired"):
        q = (
            spark.readStream.format("iceberg_table")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", b_out)
            .option("checkpointLocation", b_cp)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            raise AssertionError("stream hung")


def test_iceberg_sink_retries_lost_metadata_cas(spark, tmp_path, monkeypatch):
    """The metadata version file is the commit point (Iceberg's
    rename-without-overwrite): a rival landing BETWEEN our metadata
    read and our CAS makes the CAS fail — the sink re-folds on the
    winner's metadata (keeping the winner's snapshot!) and retries at
    the next version; the batch lands once, on top of the winner's
    history."""
    import shutil

    root = str(tmp_path / "t")
    sink = IB.iceberg_streaming_sink(root, "app-cas")
    sink(_batch(spark, range(4)), 0)
    # the rival publishes v2 (a valid no-op commit: same content as
    # v1); our sink's INITIAL listing raced ahead of it — simulate by
    # hiding v2 from the first listing only
    meta = os.path.join(root, "metadata")
    shutil.copyfile(
        os.path.join(meta, "v1.metadata.json"),
        os.path.join(meta, "v2.metadata.json"),
    )
    real = IB._metadata_versions
    calls = {"n": 0}

    def flaky(r):
        out = real(r)
        calls["n"] += 1
        return [v for v in out if v <= 1] if calls["n"] == 1 else out

    monkeypatch.setattr(IB, "_metadata_versions", flaky)
    sink(_batch(spark, range(4, 6)), 1)  # CAS at v2 fails -> retry v3
    assert _read_ids(spark, root) == list(range(6))
    assert sorted(real(root)) == [1, 2, 3]
    assert IB.last_sink_batch(root, "app-cas") == 1


def test_sinks_through_coordinated_logstore(spark, tmp_path):
    """Both external sinks route their commit points through the
    installed LogStore: under the coordinator-backed store (the S3
    recipe), a Delta commit and an Iceberg metadata CAS both publish
    and read back exactly."""
    from django_datastream_spark import txnlog as TL
    from django_datastream_spark.logstores import (
        SqliteCoordinatedLogStore,
    )
    from django_datastream_spark.sources import delta as DL

    prev = TL.set_log_store(
        SqliteCoordinatedLogStore(str(tmp_path / "coord.db"))
    )
    try:
        droot = str(tmp_path / "d")
        DL.delta_streaming_sink(droot, "co-app")(_batch(spark, range(3)), 0)
        assert sorted(
            r["doc_id"] for r in DL.read_delta(spark, droot).collect()
        ) == [0, 1, 2]
        iroot = str(tmp_path / "i")
        IB.iceberg_streaming_sink(iroot, "co-app")(
            _batch(spark, range(3)), 0
        )
        assert _read_ids(spark, iroot) == [0, 1, 2]
    finally:
        TL.set_log_store(prev)


def test_remove_orphan_files(spark, tmp_path):
    """Crashed-writer debris (unreferenced data files, staging dirs)
    is reclaimed; every referenced file — current AND historical —
    survives, so time travel still reads."""
    import glob

    root = str(tmp_path / "t")
    sink = IB.iceberg_streaming_sink(root, "app-or")
    sink(_batch(spark, range(4)), 0)
    sink(_batch(spark, range(4, 6)), 1)
    # debris: an orphan data file, an OLD staging dir (crashed
    # writer) and a FRESH staging dir (live writer mid-batch)
    with open(os.path.join(root, "data", "orphan.parquet"), "wb") as f:
        f.write(b"not really parquet")
    dead = os.path.join(root, "_staging_dead")
    os.makedirs(dead, exist_ok=True)
    os.utime(dead, (0, 0))  # crashed long ago
    live = os.path.join(root, "_staging_live")
    os.makedirs(live, exist_ok=True)
    res = IB.remove_orphan_files(root)
    # "removed" counts DATA files; swept staging debris separately
    assert res["removed"] == 1
    assert res["staging_dirs"] == 1
    assert not os.path.exists(os.path.join(root, "data", "orphan.parquet"))
    assert not os.path.exists(dead)
    assert os.path.exists(live)  # grace window protects live writers
    md = IB.iceberg_metadata(root)
    chain = IB._lineage_chain(md, md["current-snapshot-id"])
    assert _read_ids(spark, root) == list(range(6))
    assert _read_ids(
        spark, root, snapshot_id=chain[0]["snapshot-id"]
    ) == list(range(4))


def test_iceberg_sink_merge_schema_evolution(spark, tmp_path):
    """merge_schema=True appends a NEW schema entry whose added
    columns carry FRESH field ids (columns keep ids forever); old
    files null-fill, time travel reads each era under the current
    schema, and type conflicts always raise."""
    root = str(tmp_path / "t")
    IB.iceberg_streaming_sink(root, "ev-app")(_batch(spark, range(3)), 0)
    plus = spark.createDataFrame(
        [(10, 5.0, "x")], "doc_id long, val double, tag string"
    )
    with pytest.raises(ValueError, match="merge_schema"):
        IB.iceberg_streaming_sink(root, "ev-app")(plus, 1)
    IB.iceberg_streaming_sink(root, "ev-app", merge_schema=True)(plus, 1)
    md = IB.iceberg_metadata(root)
    assert len(md["schemas"]) == 2
    cur = IB._current_schema(md)["fields"]
    assert [f["name"] for f in cur] == ["doc_id", "val", "tag"]
    ids = {f["name"]: f["id"] for f in cur}
    assert ids["tag"] == max(ids.values())  # fresh id, never reused
    got = IB.read_iceberg(spark, root)
    rows = {r["doc_id"]: r["tag"] for r in got.collect()}
    assert rows[10] == "x" and rows[0] is None
    bad = spark.createDataFrame([(1, "s")], "doc_id long, val string")
    with pytest.raises(ValueError, match="type conflicts"):
        IB.iceberg_streaming_sink(root, "ev-app", merge_schema=True)(bad, 2)
