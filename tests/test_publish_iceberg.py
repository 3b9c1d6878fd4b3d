"""publish_iceberg — write-side lakehouse interop: an engine txn
table published AS a real Iceberg metadata tree over the same data
files, round-tripped through this repo's own from-spec reader.
Covers: per-version snapshots (time travel == txn time travel),
manifest reuse vs pruned EXISTING/DELETED manifests on removal,
schema evolution with stable field ids, the incremental changes feed
over intentionally NON-monotonic snapshot ids, and the fail-closed
boundaries (live deletion vectors, hive layouts)."""

import os
import pytest
from pyspark.sql import functions as F

from django_datastream_spark import txnlog as TL
from django_datastream_spark.sources import iceberg as IB


def _mkdf(spark, ids, extra=False):
    df = spark.range(0, 0).select()  # placeholder, replaced below
    rows = [(int(i), float(i) * 0.5) for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, val double")
    if extra:
        df = df.withColumn("tag", F.concat(F.lit("t"), F.col("doc_id")))
    return df


def _rows(df, cols=("doc_id", "val")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_publish_roundtrip_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = TL.txn_append(spark, _mkdf(spark, range(10)), root, [])
    v2 = TL.txn_append(spark, _mkdf(spark, range(10, 20)), root, [])
    res = IB.publish_iceberg(spark, root)
    assert set(res["snapshots"]) == {v1, v2}
    # current snapshot == txn head, byte-for-byte rows
    got = IB.read_iceberg(spark, root)
    assert _rows(got) == _rows(TL.txn_read(spark, root))
    # snapshot time travel == txn time travel
    for v, sid in res["snapshots"].items():
        a = IB.read_iceberg(spark, root, snapshot_id=sid)
        b = TL.txn_read(spark, root, version=v)
        assert _rows(a) == _rows(b), v
    # snapshot ids are non-monotonic by design — the lineage chain,
    # not numeric order, must carry history (regression guard)
    sids = [res["snapshots"][v] for v in sorted(res["snapshots"])]
    chain = IB._lineage_chain(IB.iceberg_metadata(root), sids[-1])
    assert [s["snapshot-id"] for s in chain] == sids


def test_publish_changes_feed_matches_txn_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(10)), root, [])
    TL.txn_append(spark, _mkdf(spark, range(10, 25)), root, [])
    res = IB.publish_iceberg(spark, root)
    sid1, sid2 = res["snapshots"][1], res["snapshots"][2]
    ch = IB.iceberg_changes(spark, root, None)
    got = sorted(
        (r["doc_id"], r["_snapshot_id"]) for r in ch.collect()
    )
    assert got == sorted(
        [(i, sid1) for i in range(10)] + [(i, sid2) for i in range(10, 25)]
    )
    inc = IB.iceberg_changes(spark, root, sid1)
    assert sorted(r["doc_id"] for r in inc.collect()) == list(range(10, 25))


def test_publish_optimize_version_prunes_manifests(spark, tmp_path):
    """txn OPTIMIZE rewrites files (removes + adds, dataChange=false);
    the published snapshot must carry DELETED tombstones + the new
    file, and every era must still read exactly its rows."""
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(10)).repartition(4), root, [])
    TL.txn_append(spark, _mkdf(spark, range(10, 20)), root, [])
    TL.txn_optimize(spark, root)
    head = TL.latest_version(root)
    res = IB.publish_iceberg(spark, root)
    for v, sid in res["snapshots"].items():
        assert _rows(IB.read_iceberg(spark, root, snapshot_id=sid)) == (
            _rows(TL.txn_read(spark, root, version=v))
        ), v
    # the optimize snapshot is a rewrite: the changes feed fails
    # closed crossing it, exactly like a Delta rewrite
    with pytest.raises(ValueError, match="deletes|rewrites"):
        IB.iceberg_changes(
            spark, root, res["snapshots"][1], res["snapshots"][head]
        ).collect()


def test_publish_schema_evolution_stable_ids(spark, tmp_path):
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(5)), root, [])
    TL.txn_append(
        spark, _mkdf(spark, range(5, 10), extra=True), root, [],
        merge_schema=True,
    )
    res = IB.publish_iceberg(spark, root)
    md = IB.iceberg_metadata(root)
    assert len(md["schemas"]) == 2
    # stable ids: doc_id/val keep ids 1/2 in BOTH schemas; tag gets 3
    for s in md["schemas"]:
        by_name = {f["name"]: f["id"] for f in s["fields"]}
        assert by_name["doc_id"] == 1 and by_name["val"] == 2
    assert {f["name"]: f["id"] for f in md["schemas"][1]["fields"]}[
        "tag"
    ] == 3
    assert md["current-schema-id"] == 1
    # current read: evolved schema, pre-evolution rows null-fill tag
    got = IB.read_iceberg(spark, root)
    assert [f.name for f in got.schema.fields] == ["doc_id", "val", "tag"]
    rows = sorted((r["doc_id"], r["tag"]) for r in got.collect())
    assert rows == sorted(
        [(i, None) for i in range(5)] + [(i, f"t{i}") for i in range(5, 10)]
    )
    # time travel to the pre-evolution snapshot under current schema
    old = IB.read_iceberg(
        spark, root, snapshot_id=res["snapshots"][1]
    )
    assert sorted(r["doc_id"] for r in old.collect()) == list(range(5))


def test_publish_bounds_enable_skipping(spark, tmp_path):
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(100)).repartition(1), root, [])
    TL.txn_append(
        spark, _mkdf(spark, range(100, 200)).repartition(1), root, []
    )
    IB.publish_iceberg(spark, root)
    md, all_files = IB.iceberg_live_files(root)
    md, pruned = IB.iceberg_live_files(root, where={"doc_id": (120, 150)})
    assert len(pruned) < len(all_files)
    got = IB.read_iceberg(spark, root, where={"doc_id": (120, 150)})
    assert sorted(r["doc_id"] for r in got.collect()) == list(
        range(120, 151)
    )


def test_publish_fails_closed(spark, tmp_path):
    # hive partitioned layout
    root2 = str(tmp_path / "hive")
    df = _mkdf(spark, range(10)).withColumn(
        "p", (F.col("doc_id") % 2).cast("int")
    )
    TL.txn_append(spark, df, root2, ["p"])
    with pytest.raises(IB.IcebergUnsupportedError, match="hive"):
        IB.publish_iceberg(spark, root2)
    # not a txn table
    with pytest.raises(ValueError, match="not a txn table"):
        IB.publish_iceberg(spark, str(tmp_path / "nope"))


def test_republish_after_new_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(5)), root, [])
    r1 = IB.publish_iceberg(spark, root)
    assert r1["metadata_version"] == 1
    TL.txn_append(spark, _mkdf(spark, range(5, 12)), root, [])
    r2 = IB.publish_iceberg(spark, root)
    assert r2["metadata_version"] == 2
    got = IB.read_iceberg(spark, root)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(12))


def test_publish_exports_dvs_as_position_deletes(spark, tmp_path):
    """txn deletion vectors publish as v2 POSITION DELETES: the
    published tree is a merge-on-read table, read_iceberg applies the
    deletes era-correctly, and the flat-list API refuses (it would
    resurrect rows)."""
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(20)).repartition(2), root, [])
    TL.txn_delete(spark, root, F.col("doc_id") % 3 == 0)
    res = IB.publish_iceberg(spark, root)
    want = [i for i in range(20) if i % 3 != 0]
    # era-exact vs txn time travel
    s1, s2 = res["snapshots"][1], res["snapshots"][2]
    assert sorted(
        r["doc_id"]
        for r in IB.read_iceberg(spark, root, snapshot_id=s1).collect()
    ) == list(range(20))
    assert sorted(
        r["doc_id"]
        for r in IB.read_iceberg(spark, root, snapshot_id=s2).collect()
    ) == want
    # flat file list refuses on the delete-carrying snapshot
    with pytest.raises(IB.IcebergUnsupportedError, match="position deletes"):
        IB.iceberg_live_files(root, snapshot_id=s2)
    # a LATER append must not be touched by the older delete file
    # (sequence-number rule): republish after new rows land
    TL.txn_append(spark, _mkdf(spark, [0, 3, 21]), root, [])
    res2 = IB.publish_iceberg(spark, root)
    got = sorted(
        r["doc_id"]
        for r in IB.read_iceberg(
            spark, root, snapshot_id=res2["snapshots"][3]
        ).collect()
    )
    # new 0 and 3 survive even though positions 0/1 of older files
    # are deleted — their file's sequence number is newer
    assert got == sorted(want + [0, 3, 21])
    # second delete grows the state; all three eras stay exact
    TL.txn_delete(spark, root, F.col("doc_id") == 21)
    res3 = IB.publish_iceberg(spark, root)
    assert sorted(
        r["doc_id"]
        for r in IB.read_iceberg(
            spark, root, snapshot_id=res3["snapshots"][4]
        ).collect()
    ) == sorted(want + [0, 3])
    assert sorted(
        r["doc_id"]
        for r in IB.read_iceberg(
            spark, root, snapshot_id=res2["snapshots"][3]
        ).collect()
    ) == sorted(want + [0, 3, 21])


def test_position_deletes_distributed_decode(spark, tmp_path, monkeypatch):
    """The distributed manifest-decode path carries delete manifests
    too (kind-tagged rows)."""
    from django_datastream_spark.sources import iceberg as IBm

    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(12)).repartition(3), root, [])
    TL.txn_delete(spark, root, F.col("doc_id") < 4)
    IB.publish_iceberg(spark, root)
    monkeypatch.setattr(IBm, "DISTRIBUTED_MANIFESTS_AT", 1)
    got = IB.read_iceberg(spark, root)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(4, 12))


def test_adopt_iceberg_converts_position_deletes(spark, tmp_path):
    """Adopting a merge-on-read snapshot converts its position
    deletes into engine _dv sidecars — round trip: txn table → publish
    (DVs → position deletes) → wipe the txn log → adopt back → same
    rows."""
    import shutil

    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(20)).repartition(2), root, [])
    TL.txn_delete(spark, root, F.col("doc_id") % 4 == 0)
    want = sorted(r["doc_id"] for r in TL.txn_read(spark, root).collect())
    IB.publish_iceberg(spark, root)
    shutil.rmtree(os.path.join(root, TL.TXN_DIR))
    IB.adopt_iceberg(spark, root, root)
    got = sorted(r["doc_id"] for r in TL.txn_read(spark, root).collect())
    assert got == want
    _v, dv = TL.snapshot_dv(root)
    assert dv and sum(e[0]["n"] for e in dv.values()) == 5


# ── partition TRANSFORMS on publish (VERDICT r9 item 7) ───────────────
def _spec_of(root):
    md = IB.iceberg_metadata(root)
    specs = md["partition-specs"]
    assert md["default-spec-id"] == 0
    return specs[0]["fields"], md


def test_publish_identity_and_truncate_spec(spark, tmp_path):
    from django_datastream_spark.sources import avro_lite as AV

    root = str(tmp_path / "t")
    # two files, each single-valued under truncate[100] (0-99, 100-199)
    TL.txn_append(spark, _mkdf(spark, range(0, 100)).coalesce(1), root, [])
    TL.txn_append(
        spark, _mkdf(spark, range(100, 200)).coalesce(1), root, []
    )
    res = IB.publish_iceberg(
        spark, root,
        partition_spec=[
            {"source": "doc_id", "transform": "truncate[100]"}
        ],
    )
    fields, md = _spec_of(root)
    assert fields == [
        {"name": "doc_id_truncate", "transform": "truncate[100]",
         "source-id": 1, "field-id": 1000}
    ]
    assert md["last-partition-id"] == 1000
    # manifests carry the VERIFIED tuples
    tuples = {}
    for mf in os.listdir(os.path.join(root, "metadata")):
        if not mf.startswith("pub-added"):
            continue
        _s, recs = AV.read_container_file(
            os.path.join(root, "metadata", mf)
        )
        for r in recs:
            tuples[r["data_file"]["file_path"]] = r["data_file"][
                "partition"
            ]["doc_id_truncate"]
    assert sorted(tuples.values()) == [0, 100]
    # the published tree reads identically
    assert _rows(IB.read_iceberg(spark, root)) == _rows(
        TL.txn_read(spark, root)
    )
    assert res["metadata_version"] == 1


def test_publish_day_transform_over_timestamp(spark, tmp_path):
    import datetime as dt

    from django_datastream_spark.sources import avro_lite as AV

    root = str(tmp_path / "t")
    d0 = dt.datetime(2024, 3, 1, 5, tzinfo=dt.timezone.utc)
    d1 = dt.datetime(2024, 3, 2, 7, tzinfo=dt.timezone.utc)
    df0 = spark.createDataFrame(
        [(i, d0) for i in range(5)], "doc_id long, ts timestamp"
    ).coalesce(1)
    df1 = spark.createDataFrame(
        [(i, d1) for i in range(5, 9)], "doc_id long, ts timestamp"
    ).coalesce(1)
    TL.txn_append(spark, df0, root, [])
    TL.txn_append(spark, df1, root, [])
    IB.publish_iceberg(
        spark, root,
        partition_spec=[{"source": "ts", "transform": "day"}],
    )
    fields, _md = _spec_of(root)
    assert fields[0]["transform"] == "day"
    want_days = {
        (d0.date() - dt.date(1970, 1, 1)).days,
        (d1.date() - dt.date(1970, 1, 1)).days,
    }
    got_days = set()
    for mf in os.listdir(os.path.join(root, "metadata")):
        if mf.startswith("pub-added"):
            _s, recs = AV.read_container_file(
                os.path.join(root, "metadata", mf)
            )
            got_days.update(
                r["data_file"]["partition"]["ts_day"] for r in recs
            )
    assert got_days == want_days
    got = IB.read_iceberg(spark, root)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(9))


def test_publish_bucket_transform_raises_with_remediation(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(10)), root, [])
    with pytest.raises(
        IB.IcebergUnsupportedError, match="Remediation"
    ):
        IB.publish_iceberg(
            spark, root,
            partition_spec=[
                {"source": "doc_id", "transform": "bucket[8]"}
            ],
        )


def test_publish_partition_spanning_file_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    # one file spanning two truncate[5] partitions
    TL.txn_append(spark, _mkdf(spark, range(0, 10)).coalesce(1), root, [])
    with pytest.raises(
        IB.IcebergUnsupportedError, match="spans partition values"
    ):
        IB.publish_iceberg(
            spark, root,
            partition_spec=[
                {"source": "doc_id", "transform": "truncate[5]"}
            ],
        )


def test_publish_spec_with_dvs_fails_closed(spark, tmp_path):
    root = str(tmp_path / "t")
    TL.txn_append(spark, _mkdf(spark, range(0, 100)).coalesce(1), root, [])
    TL.txn_delete(spark, root, F.col("doc_id") == 3)
    with pytest.raises(
        IB.IcebergUnsupportedError, match="position-delete"
    ):
        IB.publish_iceberg(
            spark, root,
            partition_spec=[
                {"source": "doc_id", "transform": "truncate[100]"}
            ],
        )
    # without the spec the same table publishes fine (existing path)
    res = IB.publish_iceberg(spark, root)
    assert res["snapshots"]
