"""Zero-copy Delta <-> Iceberg conversion (sources/convert.py).

Both directions compose adopt/refresh (foreign log -> txn mirror) with
the opposite publish — so the pins here are END-TO-END: build a real
source tree with the spec writers, convert, read back through the
OTHER format's reader, and require row-identical results — including
deletion vectors / position deletes crossing formats, incremental
re-conversion after new source commits, era-correct time travel on
the converted side, and every fail-closed boundary.
"""

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from django_datastream_spark import txnlog as TL
from django_datastream_spark.sources import convert as CV
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import fileio as FIO
from django_datastream_spark.sources import iceberg as IB
from django_datastream_spark.sources import roaring as RB
from tests.test_delta import _PROTO, _add, _meta, _write_data
from tests.test_delta_dv import _build_dv_table, _dv_commit_actions
from tests.test_iceberg import FIELDS, _data


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def _build_plain_delta(root):
    """v0: a.parquet ids 0..9; v1: b.parquet ids 10..14."""
    _write_data(root, "a.parquet", range(10))
    DL.write_delta_commit(
        root, 0, [_PROTO, _meta(partitioned=False), _add("a.parquet")]
    )
    _write_data(root, "b.parquet", range(10, 15))
    DL.write_delta_commit(root, 1, [_add("b.parquet")])


# ---------------------------------------------------------------------------
# Delta -> Iceberg
# ---------------------------------------------------------------------------
def test_delta_to_iceberg_basic_and_incremental(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    r1 = CV.convert_delta_to_iceberg(spark, root)
    assert r1["txn_version"] == 1 and r1["metadata_version"] == 1
    want = list(range(15))
    assert _ids(IB.read_iceberg(spark, root)) == want
    assert _ids(DL.read_delta(spark, root)) == want
    md = IB.iceberg_metadata(root)
    assert md["properties"]["engine.converted-from"] == "delta"
    # idempotent: nothing new -> no new txn version
    r_again = CV.convert_delta_to_iceberg(spark, root)
    assert r_again["txn_version"] == 1

    # new delta commits: an add and a rewrite
    _write_data(root, "c.parquet", range(15, 18))
    DL.write_delta_commit(root, 2, [_add("c.parquet")])
    _write_data(root, "a2.parquet", range(0, 10))
    DL.write_delta_commit(
        root, 3,
        [{"remove": {"path": "a.parquet", "dataChange": True}},
         _add("a2.parquet")],
    )
    r2 = CV.convert_delta_to_iceberg(spark, root)
    assert r2["txn_version"] == 2  # ONE refresh commit for both
    assert _ids(IB.read_iceberg(spark, root)) == list(range(18))
    # era-correct time travel: the first conversion's snapshot still
    # serves the pre-refresh live set
    sid1 = r1["snapshots"][1]
    assert _ids(
        IB.read_iceberg(spark, root, snapshot_id=sid1)
    ) == want


def test_delta_dvs_cross_as_position_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_dv_table(root)  # v2 head: DV deletes positions {1,3,5}
    CV.convert_delta_to_iceberg(spark, root, version=1)
    assert _ids(IB.read_iceberg(spark, root)) == [
        0, 2, 4, 5, 6, 7, 8, 9,
    ]
    # refresh to v2: the vector GREW -> one refresh commit
    r2 = CV.convert_delta_to_iceberg(spark, root)
    assert r2["txn_version"] == 2
    assert _ids(IB.read_iceberg(spark, root)) == [
        0, 2, 4, 6, 7, 8, 9,
    ]
    assert _ids(DL.read_delta(spark, root)) == [0, 2, 4, 6, 7, 8, 9]
    # era-correct: snapshot 1 still shows the smaller vector's view
    sid1 = r2["snapshots"][1]
    assert _ids(
        IB.read_iceberg(spark, root, snapshot_id=sid1)
    ) == [0, 2, 4, 5, 6, 7, 8, 9]


def test_dv_shrink_fails_closed(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_dv_table(root)
    CV.convert_delta_to_iceberg(spark, root)  # mirror at DV {1,3,5}
    # a RESTORE-shaped commit: the vector shrinks back to {1}
    DL.write_delta_commit(
        root, 3, _dv_commit_actions(root, "a.parquet", [1])
    )
    with pytest.raises(DL.DeltaUnsupportedError, match="SHRANK"):
        CV.convert_delta_to_iceberg(spark, root)


def test_hive_delta_fails_closed_at_publish(spark, tmp_path):
    from tests.test_delta import _build_hive_table

    root = str(tmp_path / "t")
    _build_hive_table(root)
    with pytest.raises(IB.IcebergUnsupportedError, match="hive"):
        CV.convert_delta_to_iceberg(spark, root)


def test_foreign_iceberg_tree_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    # a REAL (non-mirror) iceberg tree at the same root
    _data(root, "data/Z.parquet", range(100, 103))
    IB.write_manifest(root, "mZ.avro", [(1, "data/Z.parquet")], 1)
    IB.write_manifest_list(root, "sZ.avro", ["mZ.avro"], 1)
    IB.write_metadata(
        root, 1, FIELDS,
        [{"snapshot-id": 1, "manifest-list": "metadata/sZ.avro"}],
        current_snapshot_id=1,
    )
    with pytest.raises(ValueError, match="foreign"):
        CV.convert_delta_to_iceberg(spark, root)


def test_diverged_mirror_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    CV.convert_delta_to_iceberg(spark, root)
    # an engine write lands on the mirror -> it is no longer a mirror
    df = spark.range(3).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 0.5).alias("val"),
    )
    TL.txn_append(spark, df, root, [])
    _write_data(root, "d.parquet", range(20, 22))
    DL.write_delta_commit(root, 2, [_add("d.parquet")])
    with pytest.raises(ValueError, match="diverged|not a pure"):
        CV.convert_delta_to_iceberg(spark, root)


# ---------------------------------------------------------------------------
# Iceberg -> Delta
# ---------------------------------------------------------------------------
def _build_plain_iceberg(root):
    """s1: A (0..4); s2: +B (5..9)."""
    _data(root, "data/A.parquet", range(0, 5))
    _data(root, "data/B.parquet", range(5, 10))
    IB.write_manifest(root, "m1.avro", [(1, "data/A.parquet")], 1)
    IB.write_manifest_list(root, "s1.avro", ["m1.avro"], 1)
    IB.write_manifest(root, "m2.avro", [(1, "data/B.parquet")], 2)
    IB.write_manifest_list(
        root, "s2.avro", [("m1.avro", 1), ("m2.avro", 2)], 2
    )
    IB.write_metadata(
        root, 2, FIELDS,
        [
            {"snapshot-id": 1, "manifest-list": "metadata/s1.avro"},
            {"snapshot-id": 2, "manifest-list": "metadata/s2.avro"},
        ],
        current_snapshot_id=2,
    )


def test_iceberg_to_delta_basic_and_incremental(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_plain_iceberg(root)
    r1 = CV.convert_iceberg_to_delta(spark, root)
    assert r1["txn_version"] == 1 and r1["published"] == [0]
    assert _ids(DL.read_delta(spark, root)) == list(range(10))
    assert _ids(IB.read_iceberg(spark, root)) == list(range(10))
    # idempotent
    assert CV.convert_iceberg_to_delta(spark, root)["txn_version"] == 1

    # s3 lands on the iceberg side: +C, A removed
    _data(root, "data/C.parquet", range(10, 15))
    IB.write_manifest(
        root, "m3.avro",
        [(0, "data/B.parquet", 2), (2, "data/A.parquet")], 3,
    )
    IB.write_manifest(root, "m4.avro", [(1, "data/C.parquet")], 3)
    IB.write_manifest_list(
        root, "s3.avro", [("m3.avro", 3), ("m4.avro", 3)], 3
    )
    IB.write_metadata(
        root, 3, FIELDS,
        [
            {"snapshot-id": 1, "manifest-list": "metadata/s1.avro"},
            {"snapshot-id": 2, "manifest-list": "metadata/s2.avro"},
            {"snapshot-id": 3, "manifest-list": "metadata/s3.avro"},
        ],
        current_snapshot_id=3,
    )
    r2 = CV.convert_iceberg_to_delta(spark, root)
    assert r2["txn_version"] == 2 and r2["published"] == [1]
    assert _ids(DL.read_delta(spark, root)) == list(range(5, 15))
    # delta time travel to the first converted commit: pre-refresh set
    assert _ids(
        DL.read_delta(spark, root, version=0)
    ) == list(range(10))


def test_iceberg_position_deletes_cross_as_delta_dvs(spark, tmp_path):
    root = str(tmp_path / "t")
    _data(root, "data/A.parquet", range(0, 5))
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array(
                    ["data/A.parquet", "data/A.parquet"], pa.string()
                ),
                "pos": pa.array([0, 2], pa.int64()),
            }
        ),
        os.path.join(root, "data", "del.parquet"),
    )
    IB.write_manifest(root, "mA.avro", [(1, "data/A.parquet")], 1)
    IB.write_manifest(
        root, "mD.avro", [(1, "data/del.parquet")], 1, entry_content=1
    )
    IB.write_manifest_list(
        root, "s1.avro",
        [("mA.avro", 1, 0, 1), ("mD.avro", 1, 1, 2)], 1,
    )
    IB.write_metadata(
        root, 1, FIELDS,
        [{"snapshot-id": 1, "manifest-list": "metadata/s1.avro"}],
        current_snapshot_id=1,
    )
    CV.convert_iceberg_to_delta(spark, root)
    # ids 0 and 2 deleted by position -> the delta read agrees
    assert _ids(DL.read_delta(spark, root)) == [1, 3, 4]
    # and the published log really carries the DV protocol
    proto = DL._fold_protocol(root, max(DL.delta_versions(root)))
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in (proto.get("readerFeatures") or [])


def test_foreign_delta_log_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_plain_iceberg(root)
    _write_data(root, "x.parquet", range(3))
    DL.write_delta_commit(
        root, 0, [_PROTO, _meta(partitioned=False), _add("x.parquet")]
    )
    with pytest.raises(ValueError, match="foreign"):
        CV.convert_iceberg_to_delta(spark, root)


# ---------------------------------------------------------------------------
# conversion x maintenance: the refsets contract on converted roots
# ---------------------------------------------------------------------------
def test_vacuum_spares_converted_tree(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    r1 = CV.convert_delta_to_iceberg(spark, root)
    # delta rewrites a.parquet away
    _write_data(root, "a2.parquet", range(0, 10))
    DL.write_delta_commit(
        root, 2,
        [{"remove": {"path": "a.parquet", "dataChange": True}},
         _add("a2.parquet")],
    )
    CV.convert_delta_to_iceberg(spark, root)
    # delta-side vacuum with keep_versions=1 would drop a.parquet —
    # but iceberg snapshot 1 (and the mirror's history) still serve it
    DL.vacuum_delta(root, keep_versions=1)
    assert os.path.exists(os.path.join(root, "a.parquet"))
    sid1 = r1["snapshots"][1]
    assert _ids(
        IB.read_iceberg(spark, root, snapshot_id=sid1)
    ) == list(range(15))


# ---------------------------------------------------------------------------
# object-store root: the whole conversion through object verbs only
# ---------------------------------------------------------------------------
def test_convert_on_fake_object_store(spark, tmp_path):
    scheme = f"fakecv{os.getpid()}"
    backing = str(tmp_path / "bucket")
    os.makedirs(backing, exist_ok=True)
    store = FIO.FakeObjectStore(scheme, backing)
    FIO.register_fileio(scheme, store)
    try:
        root = f"{scheme}://t"
        io = FIO.io_for(root)
        # build the delta fixture through object verbs
        buf_ids = list(range(10))
        import io as _bio

        buf = _bio.BytesIO()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(buf_ids, pa.int64()),
                    "val": pa.array(
                        [i * 0.5 for i in buf_ids], pa.float64()
                    ),
                }
            ),
            buf,
        )
        io.put_bytes(os.path.join(root, "a.parquet"), buf.getvalue())
        DL.write_delta_commit(
            root, 0,
            [_PROTO, _meta(partitioned=False), _add("a.parquet")],
        )
        r = CV.convert_delta_to_iceberg(spark, root)
        assert r["metadata_version"] == 1
        assert _ids(IB.read_iceberg(spark, root)) == buf_ids
        assert not os.path.exists(root)  # truly no POSIX path
    finally:
        FIO.unregister_fileio(scheme)


# ---------------------------------------------------------------------------
# facade: conversion served BY NAME through the engine catalog
# ---------------------------------------------------------------------------
def test_convert_external_table_by_name(spark, tmp_path):
    from django_datastream_spark import exceptions as exc
    from django_datastream_spark.api import Datastream

    ds = Datastream(spark, str(tmp_path / "store"))
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    ds.register_external_table("src", root)
    rec = ds.convert_external_table(
        "src", "iceberg", register_as="src_ice"
    )
    assert rec["source_format"] == "delta"
    # both names serve the same rows: source pin via delta, converted
    # pin via iceberg, on one dual-log root
    a = _ids(ds.external_table("src"))
    b = _ids(ds.external_table("src_ice"))
    assert a == b == list(range(15))
    # converted-name registration is pinned to the target format
    entries = {e["name"]: e for e in ds.external_tables()}
    assert entries["src"]["format"] == "delta"
    assert entries["src_ice"]["format"] == "iceberg"
    # incremental: a new delta commit, convert again by name
    _write_data(root, "d.parquet", range(20, 25))
    DL.write_delta_commit(root, 2, [_add("d.parquet")])
    ds.convert_external_table("src", "iceberg")
    assert _ids(ds.external_table("src_ice")) == sorted(
        list(range(15)) + list(range(20, 25))
    )
    # same-format and txn-format conversions fail with remediation
    with pytest.raises(exc.DatastreamError, match="already"):
        ds.convert_external_table("src", "delta")


def test_optimize_refused_on_derived_trees(spark, tmp_path):
    """Layout maintenance belongs to whichever log OWNS the data:
    on a Delta-sourced conversion mirror the derived Iceberg view
    refuses optimize (republish re-derives it), and on an
    engine-owned publish root BOTH foreign views refuse (txn_optimize
    is the verb there). Source-side optimize on a mirror is allowed —
    pinned in test_review_r11b."""
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    CV.convert_delta_to_iceberg(spark, root)
    with pytest.raises(IB.IcebergUnsupportedError, match="DERIVED"):
        IB.optimize_iceberg(spark, root, target_file_bytes=1 << 20)
    # engine-owned txn root, published both ways: both views refuse
    eroot = str(tmp_path / "e")
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), (F.col("id") * 0.5).alias("val")
    )
    TL.txn_append(spark, df, eroot, [])
    DL.publish_delta(spark, eroot)
    IB.publish_iceberg(spark, eroot)
    with pytest.raises(DL.DeltaUnsupportedError, match="DERIVED"):
        DL.optimize_delta(spark, eroot, target_file_bytes=1 << 20)
    with pytest.raises(IB.IcebergUnsupportedError, match="DERIVED"):
        IB.optimize_iceberg(spark, eroot, target_file_bytes=1 << 20)
