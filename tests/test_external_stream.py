"""External lakehouse tables as streaming sources (delta_table /
iceberg_table): offset replay, lineage-ordered Iceberg batches over
non-monotonic snapshot ids, rollback detection, DV/rewrite
fail-closed, and the exactly-once landing into an engine txn table
under doubled replay (q174's worst-case redelivery shape)."""

import json
import os
import shutil

import pytest

from django_datastream_spark import txnlog as TL
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import external_stream as XS
from django_datastream_spark.sources import iceberg as IB
from tests.test_delta import _build_hive_table
from tests.test_delta_dv import _dv_commit_actions
from tests.test_iceberg import FIELDS, _build_nonmonotonic_table, _data


def _drain(spark, fmt, table, cp, out, **opts):
    XS.register(spark)
    r = spark.readStream.format(fmt).option("path", table)
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


def test_delta_stream_replays_then_tails(spark, tmp_path):
    table = str(tmp_path / "t")
    _build_hive_table(table)  # v0,v1 adds; v2 rewrite
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    # rewrite commit fails closed mid-stream by default
    with pytest.raises(Exception, match="cannot stream as appends"):
        _drain(spark, "delta_table", table, cp, out)
    shutil.rmtree(cp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    got = _drain(
        spark, "delta_table", table, cp, out, ignoreChanges="true"
    )
    rows = sorted(
        (r["doc_id"], r["part"], r["_commit_version"])
        for r in got.collect()
    )
    want = sorted(
        [(i, i % 2, 0) for i in range(10)]
        + [(10, 0, 1), (12, 0, 1)]
        + [(i, 1, 2) for i in [1, 3, 5, 7, 9]]  # rewrite re-emission
    )
    assert rows == want
    # a NEW commit tails incrementally through the same checkpoint
    from tests.test_delta import _add, _write_data

    _write_data(table, "part=0/f9.parquet", [20, 22])
    DL.write_delta_commit(
        table, 3, [_add("part=0/f9.parquet", {"part": "0"})]
    )
    got2 = _drain(
        spark, "delta_table", table, cp, out, ignoreChanges="true"
    )
    new = [
        (r["doc_id"], r["_commit_version"])
        for r in got2.filter("_commit_version = 3").collect()
    ]
    assert sorted(new) == [(20, 3), (22, 3)]
    assert got2.count() == len(want) + 2


def test_delta_stream_applies_deletion_vectors(spark, tmp_path):
    from tests.test_delta import _PROTO, _add, _meta, _write_data

    table = str(tmp_path / "t")
    _write_data(table, "a.parquet", range(10))
    DL.write_delta_commit(
        table, 0, [_PROTO, _meta(partitioned=False), _add("a.parquet")]
    )
    DL.write_delta_commit(
        table, 1, _dv_commit_actions(table, "a.parquet", [1, 3], "u")
    )
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    got = _drain(
        spark, "delta_table", table, cp, out, ignoreChanges="true"
    )
    v1 = sorted(
        r["doc_id"]
        for r in got.filter("_commit_version = 1").collect()
    )
    assert v1 == [0, 2, 4, 5, 6, 7, 8, 9]  # live rows only


def test_iceberg_stream_orders_by_lineage(spark, tmp_path):
    table = str(tmp_path / "t")
    s1, s2 = _build_nonmonotonic_table(table)  # older id LARGER
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    got = _drain(spark, "iceberg_table", table, cp, out)
    rows = sorted(
        (r["doc_id"], r["_snapshot_id"]) for r in got.collect()
    )
    assert rows == sorted(
        [(i, s1) for i in range(10)] + [(i, s2) for i in range(10, 15)]
    )
    # grow the table by a third snapshot; only it streams next
    s3 = 7
    _data(table, "data/D.parquet", range(15, 18))
    IB.write_manifest(table, "m4.avro", [(1, "data/D.parquet")], s3)
    IB.write_manifest_list(
        table, "snap-3.avro",
        [("m1.avro", s1), ("m3.avro", s2), ("m4.avro", s3)], s3,
    )
    snaps = [
        {"snapshot-id": s1, "manifest-list": "metadata/snap-1.avro"},
        {"snapshot-id": s2, "manifest-list": "metadata/snap-2.avro"},
        {"snapshot-id": s3, "manifest-list": "metadata/snap-3.avro"},
    ]
    IB.write_metadata(table, 3, FIELDS, snaps, current_snapshot_id=s3)
    got2 = _drain(spark, "iceberg_table", table, cp, out)
    assert got2.count() == 18
    assert sorted(
        r["doc_id"] for r in got2.filter(f"_snapshot_id = {s3}").collect()
    ) == [15, 16, 17]


def test_iceberg_stream_detects_history_rewrite(spark, tmp_path):
    table = str(tmp_path / "t")
    s1, s2 = _build_nonmonotonic_table(table)
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    _drain(spark, "iceberg_table", table, cp, out)
    # rewrite history: drop s2, replace by a different lineage
    mpath = os.path.join(table, "metadata", "v2.metadata.json")
    with open(mpath) as f:
        md = json.load(f)
    md["snapshots"] = [
        s for s in md["snapshots"] if s["snapshot-id"] == s1
    ]
    md["current-snapshot-id"] = s1
    md["snapshot-log"] = md["snapshot-log"][:1]
    with open(mpath, "w") as f:
        json.dump(md, f)
    _data(table, "data/E.parquet", range(100, 103))
    IB.write_manifest(table, "m9.avro", [(1, "data/E.parquet")], 99)
    IB.write_manifest_list(
        table, "snap-9.avro", [("m1.avro", s1), ("m9.avro", 99)], 99
    )
    snaps = [
        {"snapshot-id": s1, "manifest-list": "metadata/snap-1.avro"},
        {"snapshot-id": 99, "manifest-list": "metadata/snap-9.avro"},
    ]
    IB.write_metadata(table, 3, FIELDS, snaps, current_snapshot_id=99)
    with pytest.raises(Exception, match="history rewritten|replay unsafe"):
        _drain(spark, "iceberg_table", table, cp, out)


def test_external_stream_lands_exactly_once(spark, tmp_path):
    """delta_table → engine txn sink under the WORST-CASE redelivery:
    the whole availableNow run repeats with a fresh stream checkpoint
    (every batch re-offered); the app-txn ledger must refuse the
    duplicates and the landed table equal ONE copy of the source."""
    table = str(tmp_path / "src")
    _build_hive_table(table)
    XS.register(spark)
    dest = str(tmp_path / "dest")

    def _run(cp_dir):
        q = (
            spark.readStream.format("delta_table")
            .option("path", table)
            .option("ignoreChanges", "true")
            .load()
            .writeStream.foreachBatch(
                TL.streaming_sink(dest, [], app_id="xs-test")
            )
            .option("checkpointLocation", cp_dir)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    _run(str(tmp_path / "cp1"))
    once = sorted(
        (r["doc_id"], r["_commit_version"])
        for r in TL.txn_read(spark, dest).collect()
    )
    _run(str(tmp_path / "cp2"))  # fresh checkpoint: full re-delivery
    twice = sorted(
        (r["doc_id"], r["_commit_version"])
        for r in TL.txn_read(spark, dest).collect()
    )
    assert twice == once
    assert len(once) == 17  # 10 + 2 + 5 (rewrite re-emission)


def _offset_versions(cp, key):
    """The per-batch source offsets recorded in a stream checkpoint:
    [(batch_id, offset[key])...] in batch order."""
    import glob

    out = []
    for p in sorted(
        glob.glob(os.path.join(cp, "offsets", "*")),
        key=lambda p: int(os.path.basename(p)),
    ):
        if not os.path.basename(p).isdigit():
            continue
        with open(p) as f:
            last = [ln for ln in f.read().splitlines() if ln.strip()][-1]
        off = json.loads(last)
        if isinstance(off, str):
            off = json.loads(off)
        out.append((int(os.path.basename(p)), off[key]))
    return out


def test_delta_stream_change_feed(spark, tmp_path):
    """readChangeFeed=true streams the CDF: the cdc commit serves its
    _change_data file's exact pre/post images (the same commit's
    add/remove rewrite ignored for CDC), the CDF-less append commit
    emits inserts — and a CDF-less delete commit fails closed even
    under ignoreChanges (the change feed is exact or an error)."""
    from tests.test_delta import _PROTO, _add, _meta, _write_data
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = str(tmp_path / "t")
    _write_data(table, "f0.parquet", range(6))
    DL.write_delta_commit(
        table, 0, [_PROTO, _meta(partitioned=False), _add("f0.parquet")]
    )
    # v1: UPDATE ids 1,3 (val + 100) — rewrite + cdc pre/post images
    _write_data(table, "f1.parquet", range(6))
    tbl = pq.read_table(os.path.join(table, "f1.parquet"))
    vals = [
        v + (100.0 if i in (1, 3) else 0.0)
        for i, v in zip(tbl.column("doc_id").to_pylist(),
                        tbl.column("val").to_pylist())
    ]
    pq.write_table(
        pa.table({"doc_id": tbl.column("doc_id"),
                  "val": pa.array(vals, pa.float64())}),
        os.path.join(table, "f1.parquet"),
    )
    os.makedirs(os.path.join(table, "_change_data"), exist_ok=True)
    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 3, 1, 3], pa.int64()),
            "val": pa.array([0.5, 1.5, 100.5, 101.5], pa.float64()),
            "_change_type": pa.array(
                ["update_preimage"] * 2 + ["update_postimage"] * 2
            ),
        }),
        os.path.join(table, "_change_data", "cdc-0.parquet"),
    )
    DL.write_delta_commit(
        table, 1,
        [{"remove": {"path": "f0.parquet", "dataChange": True}},
         _add("f1.parquet"),
         {"cdc": {"path": "_change_data/cdc-0.parquet",
                  "partitionValues": {}, "size": 1,
                  "dataChange": False}}],
    )
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    got = _drain(
        spark, "delta_table", table, cp, out, readChangeFeed="true"
    )
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["doc_id"], r["val"])
        for r in got.collect()
    )
    assert rows == sorted(
        [(0, "insert", i, i * 0.5) for i in range(6)]
        + [(1, "update_preimage", 1, 0.5),
           (1, "update_preimage", 3, 1.5),
           (1, "update_postimage", 1, 100.5),
           (1, "update_postimage", 3, 101.5)]
    )
    # v2: a DELETE without cdc actions — CDF cannot reconstruct it,
    # and ignoreChanges does NOT soften the change feed
    DL.write_delta_commit(
        table, 2, [{"remove": {"path": "f1.parquet", "dataChange": True}}]
    )
    with pytest.raises(Exception, match="wrote no cdc actions"):
        _drain(
            spark, "delta_table", table, cp, out,
            readChangeFeed="true", ignoreChanges="true",
        )


@pytest.mark.slow
def test_delta_stream_paced(spark, tmp_path):
    """maxFilesPerTrigger bounds each micro-batch: a fresh continuous
    stream advances the offset by at most the file budget per batch
    (always admitting >= 1 commit), and under availableNow a paced
    run drains one slice, the next run resuming from the checkpoint
    without loss or duplication."""
    from tests.test_delta import _PROTO, _add, _meta, _write_data

    table = str(tmp_path / "t")
    _write_data(table, "f0.parquet", [0])
    DL.write_delta_commit(
        table, 0, [_PROTO, _meta(partitioned=False), _add("f0.parquet")]
    )
    for v, ids in ((1, [1, 2]), (2, [3, 4]), (3, [5, 6])):
        rels = []
        for i in ids:
            rel = f"f{v}_{i}.parquet"
            _write_data(table, rel, [i])
            rels.append(rel)
        DL.write_delta_commit(table, v, [_add(r) for r in rels])
    XS.register(spark)

    # continuous (processingTime) pacing: drain with budget 2 —
    # commit 0 (1 file) + commit 1 (2 files) exceed it, so batch 0
    # ends at v0; each later commit is exactly the budget
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    q = (
        spark.readStream.format("delta_table")
        .option("path", table)
        .option("maxFilesPerTrigger", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == list(range(7))
    assert _offset_versions(cp, "v") == [(0, 0), (1, 1), (2, 2), (3, 3)]

    # availableNow with pacing: one paced slice per run; repeated
    # runs drain everything exactly once through one checkpoint
    cp2, out2 = str(tmp_path / "cp2"), str(tmp_path / "out2")
    seen = -1
    for _ in range(10):
        got = _drain(
            spark, "delta_table", table, cp2, out2,
            maxFilesPerTrigger="2",
        )
        offs = _offset_versions(cp2, "v")
        if offs[-1][1] == 3:
            break
        assert offs[-1][1] > seen
        seen = offs[-1][1]
    rows = sorted(
        (r["doc_id"], r["_commit_version"]) for r in got.collect()
    )
    assert rows == [(0, 0), (1, 1), (2, 1), (3, 2), (4, 2), (5, 3), (6, 3)]
    # first paced run stopped at v0 (budget 2 can't admit v1's 2
    # files on top of v0's 1): slice-per-run, no dupes, no loss
    assert _offset_versions(cp2, "v")[0] == (0, 0)


def test_iceberg_stream_paced(spark, tmp_path):
    """maxSnapshotsPerTrigger=1: one snapshot per micro-batch (the
    lineage position is the finest admissible unit), lineage order
    preserved under pacing."""
    table = str(tmp_path / "t")
    s1, s2 = _build_nonmonotonic_table(table)
    XS.register(spark)
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    q = (
        spark.readStream.format("iceberg_table")
        .option("path", table)
        .option("maxSnapshotsPerTrigger", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        (r["doc_id"], r["_snapshot_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert rows == sorted(
        [(i, s1) for i in range(10)] + [(i, s2) for i in range(10, 15)]
    )
    assert _offset_versions(cp, "n") == [(0, 1), (1, 2)]


def test_delta_stream_starting_timestamp_and_byte_pacing(spark, tmp_path):
    """startingTimestamp begins at the first commit AT/after the pin
    (a future pin = only commits that arrive later), and
    maxBytesPerTrigger paces on the adds' logged sizes."""
    import pyarrow.parquet as pq

    from tests.test_delta import _PROTO, _meta, _write_data

    table = str(tmp_path / "t")

    def _sized_add(rel, ts):
        return {"add": {"path": rel, "partitionValues": {},
                        "size": os.path.getsize(os.path.join(table, rel)),
                        "modificationTime": ts, "dataChange": True}}

    _write_data(table, "f0.parquet", [0, 1])
    DL.write_delta_commit(
        table, 0, [_PROTO, _meta(partitioned=False),
                   {"commitInfo": {"timestamp": 1000}},
                   _sized_add("f0.parquet", 1000)],
    )
    for v, ids, ts in ((1, [2, 3], 2000), (2, [4, 5], 3000)):
        rel = f"f{v}.parquet"
        _write_data(table, rel, ids)
        DL.write_delta_commit(
            table, v,
            [{"commitInfo": {"timestamp": ts}}, _sized_add(rel, ts)],
        )
    XS.register(spark)
    # starting at ts=2000: commits 1 and 2 only
    cp, out = str(tmp_path / "cp"), str(tmp_path / "out")
    got = _drain(
        spark, "delta_table", table, cp, out, startingTimestamp="2000"
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [2, 3, 4, 5]
    # byte pacing: budget of one file's size → one commit per batch
    one = os.path.getsize(os.path.join(table, "f0.parquet"))
    cp2, out2 = str(tmp_path / "cp2"), str(tmp_path / "out2")
    q = (
        spark.readStream.format("delta_table")
        .option("path", table)
        .option("maxBytesPerTrigger", str(one))
        .load()
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", cp2)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out2).count() == 6
    assert _offset_versions(cp2, "v") == [(0, 0), (1, 1), (2, 2)]
