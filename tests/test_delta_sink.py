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
