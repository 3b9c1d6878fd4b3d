"""Round-10 ADVICE regressions — each test pins one reviewed bug:

1. (high) publish_delta re-publish after the table's FIRST deletion
   vectors must upgrade the committed Delta protocol in that commit,
   else spec-conformant readers honoring protocol 1/2 ignore the
   deletionVector field and resurrect deleted rows.
2. (medium) vacuum_delta on a dual-log root (the NORMAL product of
   adopt/publish, which require txn_root == delta_root) must never
   delete the engine's _dv sidecars, the txn log, or a coexisting
   Iceberg view's files.
3. (low) the streaming Delta reader fails closed on a DV whose
   decoded cardinality mismatches the descriptor or whose positions
   exceed the file's row count — matching the batch read's contract.
4. (low) publish_delta maps __HIVE_DEFAULT_PARTITION__ back to a
   null partitionValue (the spec stores null as null, not the dir
   sentinel).
5. (low) the DV anti-join joins on DECODED paths: a space (URI
   %20-encoded in _metadata.file_path) in a partition value must not
   silently disable deletes — covered at the txn layer, the published
   Delta log, and the Iceberg position-delete path.
"""

import os

import pytest
from pyspark.sql import functions as F

from django_datastream_spark import txnlog as TL
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import iceberg as IB
from tests.test_delta import _PROTO, _add, _meta, _write_data
from tests.test_delta_dv import _dv_commit_actions
from tests.test_iceberg import FIELDS, _data


def _mkdf(spark, ids):
    return spark.createDataFrame(
        [(int(i), float(i) * 0.5) for i in ids], "doc_id long, val double"
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


# 1 ── protocol upgrade on DV-after-first-publish ──────────────────────
@pytest.mark.slow
def test_republish_after_first_dv_upgrades_protocol(spark, tmp_path):
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(12)).repartition(2), root, [])
    r1 = DL.publish_delta(spark, root)
    assert r1["published"] == [0]
    p0 = DL._fold_protocol(root, 0)
    assert p0["minReaderVersion"] == 1  # no DVs yet
    # the documented incremental flow: publish -> txn_delete -> publish
    TL.txn_delete(spark, root, F.col("doc_id") % 4 == 0)
    r2 = DL.publish_delta(spark, root)
    assert r2["published"] == [1]
    # the protocol IN FORCE at the DV-bearing commit must declare the
    # feature — a reader folding the log sees reader 3 + deletionVectors
    p1 = DL._fold_protocol(root, 1)
    assert p1["minReaderVersion"] == 3
    assert "deletionVectors" in (p1.get("readerFeatures") or [])
    want = [i for i in range(12) if i % 4 != 0]
    assert _ids(DL.read_delta(spark, root)) == want
    # idempotent: a third publish with no new txn commits is a no-op
    r3 = DL.publish_delta(spark, root)
    assert r3["published"] == []
    # and a DV-free re-publish chain never emits a spurious upgrade
    root2 = str(tmp_path / "t2")
    TL.txn_append(spark, _mkdf(spark, range(4)), root2, [])
    DL.publish_delta(spark, root2)
    TL.txn_append(spark, _mkdf(spark, range(4, 8)), root2, [])
    DL.publish_delta(spark, root2)
    assert DL._fold_protocol(root2, 1)["minReaderVersion"] == 1


# 2 ── vacuum spares coexisting engine / Iceberg trees ─────────────────
def test_vacuum_delta_spares_engine_and_iceberg_dirs(spark, tmp_path):
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(20)).repartition(2), root, [])
    TL.txn_delete(spark, root, F.col("doc_id") % 5 == 0)
    DL.publish_delta(spark, root)
    want = [i for i in range(20) if i % 5 != 0]
    assert _ids(TL.txn_read(spark, root)) == want

    def _rels(sub):
        base = os.path.join(root, sub)
        return sorted(
            os.path.join(d, f)
            for d, _dd, fs in os.walk(base)
            for f in fs
        ) if os.path.isdir(base) else []

    dv_before = _rels("_dv")
    assert dv_before, "fixture must have engine DV sidecars"
    # a coexisting Iceberg view's trees (publish_iceberg layout)
    os.makedirs(os.path.join(root, "pub-deletes"), exist_ok=True)
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(
        os.path.join(root, "pub-deletes", "del-1.parquet"), "wb"
    ) as f:
        f.write(b"not-really-parquet")
    res = DL.vacuum_delta(root, keep_versions=1)
    assert res["removed_files"] >= 0
    assert _rels("_dv") == dv_before, "vacuum deleted engine DV sidecars"
    assert os.path.exists(
        os.path.join(root, "pub-deletes", "del-1.parquet")
    ), "vacuum deleted a coexisting Iceberg view's delete file"
    assert os.path.isdir(os.path.join(root, TL.TXN_DIR))
    # both views still serve the table
    assert _ids(TL.txn_read(spark, root)) == want
    assert _ids(DL.read_delta(spark, root)) == want


# 3 ── streaming DV fail-closed ────────────────────────────────────────
def _stream_once(spark, table, cp, out):
    from django_datastream_spark.sources import external_stream as XS

    XS.register(spark)
    q = (
        spark.readStream.format("delta_table")
        .option("path", table)
        .option("ignoreChanges", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return spark.read.parquet(out)


def test_stream_dv_fails_closed_on_cardinality_mismatch(spark, tmp_path):
    root = str(tmp_path / "t")
    _write_data(root, "a.parquet", range(10))
    DL.write_delta_commit(
        root, 0, [_PROTO, _meta(partitioned=False), _add("a.parquet")]
    )
    acts = _dv_commit_actions(root, "a.parquet", [1, 3])
    acts[1]["add"]["deletionVector"]["cardinality"] = 5  # lies
    DL.write_delta_commit(root, 1, acts)
    with pytest.raises(Exception, match="descriptor says 5"):
        _stream_once(
            spark, root, str(tmp_path / "cp"), str(tmp_path / "out")
        )


def test_stream_dv_fails_closed_on_out_of_range_positions(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _write_data(root, "a.parquet", range(10))
    DL.write_delta_commit(
        root, 0, [_PROTO, _meta(partitioned=False), _add("a.parquet")]
    )
    DL.write_delta_commit(
        root, 1, _dv_commit_actions(root, "a.parquet", [2, 100])
    )
    with pytest.raises(Exception, match="file row count"):
        _stream_once(
            spark, root, str(tmp_path / "cp"), str(tmp_path / "out")
        )


# 4 ── null partition values publish as null ───────────────────────────
def test_publish_null_partition_value_maps_to_null(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, None), (3, None)],
        "doc_id long, p string",
    )
    TL.txn_append(spark, df, root, ["p"])
    DL.publish_delta(spark, root)
    _v, _md, adds = DL.delta_snapshot_arrow(root)
    pvs = [dict(x or []) for x in adds.column("partitionValues").to_pylist()]
    assert any(pv.get("p") == "x" for pv in pvs)
    # the null-partition file carries null, never the hive sentinel
    assert any("p" in pv and pv["p"] is None for pv in pvs)
    assert not any(
        pv.get("p") == "__HIVE_DEFAULT_PARTITION__" for pv in pvs
    )
    got = sorted(
        (r["doc_id"], r["p"]) for r in DL.read_delta(spark, root).collect()
    )
    assert got == [(0, "x"), (1, "x"), (2, None), (3, None)]


# 5 ── DECODED-path joins: spaces in partition values ──────────────────
def test_txn_delete_applies_with_space_in_partition_value(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "a b" if i % 2 else "c%d") for i in range(10)],
        "doc_id long, p string",
    )
    TL.txn_append(spark, df, root, ["p"])
    res = TL.txn_delete(spark, root, F.col("doc_id") < 4)
    assert res["deleted_rows"] == 4
    assert _ids(TL.txn_read(spark, root)) == list(range(4, 10))
    # published view applies the exported vectors too
    DL.publish_delta(spark, root)
    assert _ids(DL.read_delta(spark, root)) == list(range(4, 10))
    # era-exact under time travel
    assert _ids(DL.read_delta(spark, root, version=0)) == list(range(10))


def test_iceberg_position_deletes_with_space_in_path(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    _data(root, "data/A file.parquet", range(0, 5))
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array(
                    ["data/A file.parquet"] * 2, pa.string()
                ),
                "pos": pa.array([0, 2], pa.int64()),
            }
        ),
        os.path.join(root, "data", "del.parquet"),
    )
    IB.write_manifest(root, "mA.avro", [(1, "data/A file.parquet")], 1)
    IB.write_manifest(
        root, "mD.avro", [(1, "data/del.parquet")], 1, entry_content=1
    )
    IB.write_manifest_list(
        root, "snap-1.avro", [("mA.avro", 1, 0, 1), ("mD.avro", 1, 1, 2)], 1
    )
    IB.write_metadata(
        root, 1, FIELDS,
        [{"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"}],
        current_snapshot_id=1,
    )
    got = IB.read_iceberg(spark, root)
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 3, 4]
