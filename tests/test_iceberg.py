"""Iceberg reader + avro_lite codec: container round trips, snapshot
fold over manifest lists, time travel, fail-closed boundaries, and
the schema mapping."""

import io
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as hst

from django_datastream_spark.sources import avro_lite as AV
from django_datastream_spark.sources import iceberg as IB


# ---------------------------------------------------------------------------
# avro_lite
# ---------------------------------------------------------------------------
AVRO_SCHEMA = {
    "type": "record",
    "name": "e",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "u", "type": ["null", "string"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "bytes"}},
        {
            "name": "sub",
            "type": {
                "type": "record",
                "name": "sub",
                "fields": [{"name": "x", "type": "double"}],
            },
        },
    ],
}
AVRO_RECS = [
    {"s": "héllo", "n": -12345678901, "u": None, "arr": [1, -2, 3],
     "m": {"k": b"\x00\xff"}, "sub": {"x": 1.5}},
    {"s": "", "n": 0, "u": "set", "arr": [], "m": {},
     "sub": {"x": -0.25}},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_container_roundtrip(codec):
    recs = AVRO_RECS * 700  # multiple blocks
    data = AV.write_container(AVRO_SCHEMA, recs, codec=codec)
    schema, got = AV.read_container(data)
    assert schema == AVRO_SCHEMA and got == recs
    assert AV.read_container(AV.write_container(AVRO_SCHEMA, []))[1] == []


def test_avro_negative_block_count_read():
    """Spec: a negative item count in array/map blocks is followed by
    the block's byte size — accepted on read."""
    body = io.BytesIO()
    AV._write_long(body, -2)  # two items, negative form
    inner = io.BytesIO()
    AV.write_value(inner, "long", 7)
    AV.write_value(inner, "long", 8)
    AV._write_long(body, len(inner.getvalue()))
    body.write(inner.getvalue())
    AV._write_long(body, 0)
    got = AV.read_value(
        io.BytesIO(body.getvalue()), {"type": "array", "items": "long"}
    )
    assert got == [7, 8]


def test_avro_rejections():
    with pytest.raises(AV.AvroError, match="magic"):
        AV.read_container(b"nope")
    with pytest.raises(AV.AvroError, match="codec"):
        AV.write_container(AVRO_SCHEMA, [], codec="snappy")
    data = bytearray(AV.write_container(AVRO_SCHEMA, AVRO_RECS))
    data[-1] ^= 0xFF  # corrupt the trailing sync marker
    with pytest.raises(AV.AvroError, match="sync"):
        AV.read_container(bytes(data))


# ---------------------------------------------------------------------------
# iceberg fixture
# ---------------------------------------------------------------------------
FIELDS = [
    {"id": 1, "name": "doc_id", "required": True, "type": "long"},
    {"id": 2, "name": "val", "required": False, "type": "double"},
]


def _data(root, rel, ids):
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "val": pa.array([i * 0.5 for i in ids], pa.float64()),
            }
        ),
        full,
    )


def _build_table(root):
    """s1: files A+B; s2: B deleted, C added (A existing)."""
    _data(root, "data/A.parquet", range(0, 5))
    _data(root, "data/B.parquet", range(5, 10))
    _data(root, "data/C.parquet", range(10, 15))
    IB.write_manifest(
        root, "m1.avro", [(1, "data/A.parquet"), (1, "data/B.parquet")], 1
    )
    IB.write_manifest_list(root, "snap-1.avro", ["m1.avro"], 1)
    IB.write_manifest(
        root, "m2.avro", [(0, "data/A.parquet"), (2, "data/B.parquet")], 2
    )
    IB.write_manifest(root, "m3.avro", [(1, "data/C.parquet")], 2)
    IB.write_manifest_list(root, "snap-2.avro", ["m2.avro", "m3.avro"], 2)
    snaps = [
        {"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"},
        {"snapshot-id": 2, "manifest-list": "metadata/snap-2.avro"},
    ]
    IB.write_metadata(root, 2, FIELDS, snaps, current_snapshot_id=2)


def test_read_current_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_table(root)
    got = IB.read_iceberg(spark, root)
    assert [f.name for f in got.schema.fields] == ["doc_id", "val"]
    assert sorted(r["doc_id"] for r in got.collect()) == (
        list(range(0, 5)) + list(range(10, 15))
    )
    old = IB.read_iceberg(spark, root, snapshot_id=1)
    assert sorted(r["doc_id"] for r in old.collect()) == list(range(10))
    snaps = IB.iceberg_snapshots(root)
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert [s["is_current"] for s in snaps] == [False, True]
    with pytest.raises(ValueError, match="no snapshot 99"):
        IB.read_iceberg(spark, root, snapshot_id=99)


def test_version_hint_fallback(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_table(root)
    with open(
        os.path.join(root, "metadata", "version-hint.text"), "w"
    ) as f:
        f.write("42")  # stale hint: v42 doesn't exist
    assert IB.iceberg_metadata(root)["current-snapshot-id"] == 2


def test_fail_closed_boundaries(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_table(root)
    # delete manifest (content=1) in a new snapshot
    mp = os.path.join(root, "metadata", "m2.avro")
    recs = [
        {
            "manifest_path": "metadata/m2.avro",
            "manifest_length": os.path.getsize(mp),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": 3,
        }
    ]
    with open(os.path.join(root, "metadata", "snap-3.avro"), "wb") as f:
        f.write(AV.write_container(IB._MANIFEST_LIST_SCHEMA, recs))
    snaps = [
        {"snapshot-id": 3, "manifest-list": "metadata/snap-3.avro"},
    ]
    IB.write_metadata(root, 3, FIELDS, snaps, current_snapshot_id=3)
    # a DELETE manifest whose entries are plain data files is
    # malformed — fail closed (position deletes proper are SUPPORTED
    # now; equality deletes pinned below)
    with pytest.raises(
        IB.IcebergUnsupportedError, match="DELETE manifest"
    ):
        IB.read_iceberg(spark, root)
    # equality deletes (content=2 entries) stay fail-closed
    recs_eq = [
        {
            "status": 1,
            "snapshot_id": 4,
            "data_file": {
                "content": 2,
                "file_path": "data/eq.parquet",
                "file_format": "PARQUET",
                "record_count": 0,
                "file_size_in_bytes": 0,
            },
        }
    ]
    with open(os.path.join(root, "metadata", "meq.avro"), "wb") as f:
        f.write(AV.write_container(IB._MANIFEST_SCHEMA, recs_eq))
    recs4 = [
        {
            "manifest_path": "metadata/meq.avro",
            "manifest_length": os.path.getsize(
                os.path.join(root, "metadata", "meq.avro")
            ),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": 4,
        }
    ]
    with open(os.path.join(root, "metadata", "snap-4.avro"), "wb") as f:
        f.write(AV.write_container(IB._MANIFEST_LIST_SCHEMA, recs4))
    IB.write_metadata(
        root, 4, FIELDS,
        [{"snapshot-id": 4, "manifest-list": "metadata/snap-4.avro"}],
        current_snapshot_id=4,
    )
    with pytest.raises(IB.IcebergUnsupportedError, match="equality"):
        IB.read_iceberg(spark, root)

    # format-version 3
    root2 = str(tmp_path / "t2")
    os.makedirs(os.path.join(root2, "metadata"))
    with open(
        os.path.join(root2, "metadata", "v1.metadata.json"), "w"
    ) as f:
        json.dump({"format-version": 3}, f)
    with pytest.raises(IB.IcebergUnsupportedError, match="format-version"):
        IB.iceberg_metadata(root2)

    with pytest.raises(IB.IcebergUnsupportedError, match="no metadata"):
        IB.iceberg_metadata(str(tmp_path / "missing"))


def test_non_parquet_and_delete_file_fail_closed(spark, tmp_path):
    root = str(tmp_path / "t")
    _data(root, "data/A.parquet", range(3))
    # hand-write a manifest with an ORC file
    recs = [
        {
            "status": 1,
            "snapshot_id": 1,
            "data_file": {
                "content": 0,
                "file_path": "data/A.orc",
                "file_format": "ORC",
                "record_count": 0,
                "file_size_in_bytes": 0,
            },
        }
    ]
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(os.path.join(root, "metadata", "m1.avro"), "wb") as f:
        f.write(AV.write_container(IB._MANIFEST_SCHEMA, recs))
    IB.write_manifest_list(root, "snap-1.avro", ["m1.avro"], 1)
    IB.write_metadata(
        root, 1,
        FIELDS,
        [{"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"}],
        current_snapshot_id=1,
    )
    with pytest.raises(IB.IcebergUnsupportedError, match="ORC"):
        IB.read_iceberg(spark, root)


def test_schema_mapping():
    md = {
        "format-version": 2,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "a", "required": True,
                     "type": "long"},
                    {"id": 2, "name": "b", "required": False,
                     "type": "decimal(10, 2)"},
                    {"id": 3, "name": "c", "required": False,
                     "type": {"type": "list", "element": "string"}},
                    {"id": 4, "name": "d", "required": False,
                     "type": {"type": "map", "key": "string",
                              "value": "double"}},
                    {"id": 5, "name": "e", "required": False,
                     "type": {"type": "struct", "fields": [
                         {"id": 6, "name": "x", "required": True,
                          "type": "int"}]}},
                ],
            }
        ],
    }
    s = IB.iceberg_schema(md)
    assert s.simpleString() == (
        "struct<a:bigint,b:decimal(10,2),c:array<string>,"
        "d:map<string,double>,e:struct<x:int>>"
    )
    assert not s["a"].nullable and s["b"].nullable
    bad = {
        "format-version": 2,
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "z", "required": False, "type": "variant"}
        ]}],
    }
    with pytest.raises(IB.IcebergUnsupportedError, match="variant"):
        IB.iceberg_schema(bad)


def test_adopt_iceberg_zero_copy(spark, tmp_path):
    from django_datastream_spark import txnlog as TL

    root = str(tmp_path / "t")
    _build_table(root)
    want = sorted(
        r["doc_id"] for r in IB.read_iceberg(spark, root).collect()
    )
    v = IB.adopt_iceberg(spark, root, root)
    assert v == 1
    got = TL.txn_read(spark, root)
    assert sorted(r["doc_id"] for r in got.collect()) == want
    # deleted file not adopted; skipping live immediately
    _, files = TL.snapshot(root)
    assert "data/B.parquet" not in files
    pruned = TL.txn_read(spark, root, where={"doc_id": (11, 13)})
    assert sorted(r["doc_id"] for r in pruned.collect()) == [11, 12, 13]
    with pytest.raises(ValueError, match="already a txn table"):
        IB.adopt_iceberg(spark, root, root)
    root2 = str(tmp_path / "u")
    _build_table(root2)
    with pytest.raises(ValueError, match="txn_root == iceberg_root"):
        IB.adopt_iceberg(spark, root2, str(tmp_path / "x"))


def test_iceberg_changes_incremental(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_table(root)
    # from the beginning through s1: exactly A+B, tagged snapshot 1
    ch = IB.iceberg_changes(spark, root, None, 1)
    rows = sorted(
        (r["doc_id"], r["_snapshot_id"]) for r in ch.collect()
    )
    assert rows == [(i, 1) for i in range(10)]
    # s2 deletes B: fail closed by default...
    with pytest.raises(ValueError, match="rewrites"):
        IB.iceberg_changes(spark, root, 1)
    # ...and under ignore semantics stream its ADDED file only
    ch2 = IB.iceberg_changes(spark, root, 1, on_remove="ignore")
    got = sorted(
        (r["doc_id"], r["_snapshot_id"]) for r in ch2.collect()
    )
    assert got == [(i, 2) for i in range(10, 15)]
    # EXISTING entries (A carried into s2) are NOT re-emitted
    assert not any(d < 5 for d, _ in got)
    # empty range: typed empty frame
    empty = IB.iceberg_changes(spark, root, 2)
    assert empty.count() == 0 and "_snapshot_id" in empty.columns
    with pytest.raises(ValueError, match="no snapshot 9"):
        IB.iceberg_changes(spark, root, 9)


@settings(max_examples=150, deadline=None)
@given(data=hst.binary(max_size=300))
def test_avro_reader_total_on_garbage(data):
    """Totality: arbitrary bytes (raw, and wrapped in a valid magic)
    either parse or raise AvroError/ValueError — never hang, never
    leak a foreign exception type."""
    for payload in (data, b"Obj\x01" + data):
        try:
            AV.read_container(payload)
        except (AV.AvroError, ValueError):
            pass


@settings(max_examples=60, deadline=None)
@given(data=hst.binary(max_size=200))
def test_iceberg_total_on_garbage_metadata(spark, tmp_path_factory, data):
    root = str(tmp_path_factory.mktemp("g"))
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    with open(
        os.path.join(root, "metadata", "v1.metadata.json"), "wb"
    ) as f:
        f.write(data)
    try:
        IB.iceberg_live_files(root)
    except (IB.IcebergUnsupportedError, ValueError, KeyError,
            TypeError, AttributeError, OSError):
        pass  # fail closed on any malformed metadata, never wrong rows


def test_iceberg_where_prunes_via_manifest_bounds(spark, tmp_path):
    root = str(tmp_path / "t")
    _data(root, "data/lo.parquet", range(0, 10))
    _data(root, "data/mid.parquet", range(10, 20))
    _data(root, "data/hi.parquet", range(20, 30))
    IB.write_manifest(
        root, "m1.avro",
        [(1, "data/lo.parquet"), (1, "data/mid.parquet"),
         (1, "data/hi.parquet")],
        1, schema_fields=FIELDS,
    )
    IB.write_manifest_list(root, "snap-1.avro", ["m1.avro"], 1)
    IB.write_metadata(
        root, 1, FIELDS,
        [{"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"}],
        current_snapshot_id=1,
    )
    # file-level pruning decision
    _md, files = IB.iceberg_live_files(root, where={"doc_id": (12, 22)})
    assert [os.path.basename(f) for f in files] == [
        "hi.parquet", "mid.parquet"
    ]
    # and the read equals filtering a full read
    got = IB.read_iceberg(spark, root, where={"doc_id": (12, 22)})
    assert sorted(r["doc_id"] for r in got.collect()) == list(
        range(12, 23)
    )
    # double bounds prune too (val = doc_id * 0.5)
    _md, files2 = IB.iceberg_live_files(root, where={"val": (None, 2.0)})
    assert [os.path.basename(f) for f in files2] == ["lo.parquet"]
    # manifests WITHOUT bounds stay conservative (everything kept)
    root2 = str(tmp_path / "u")
    _build_table(root2)
    _md2, all_files = IB.iceberg_live_files(
        root2, where={"doc_id": (100, 200)}
    )
    assert len(all_files) == 2  # nothing pruned, filter is residual
    assert IB.read_iceberg(
        spark, root2, where={"doc_id": (100, 200)}
    ).count() == 0


# recursive schema+value strategy: every avro_lite type constructor
_PRIM_STRATS = {
    "boolean": hst.booleans(),
    "int": hst.integers(-2**31, 2**31 - 1),
    "long": hst.integers(-2**63, 2**63 - 1),
    "double": hst.floats(allow_nan=False, allow_infinity=False),
    "string": hst.text(max_size=20),
    "bytes": hst.binary(max_size=20),
}


def _schema_and_value(depth=0):
    prims = hst.sampled_from(sorted(_PRIM_STRATS))
    if depth >= 2:
        return prims.map(lambda t: (t, _PRIM_STRATS[t]))
    sub = hst.deferred(lambda: _schema_and_value(depth + 1))

    def mk_record(subs):
        fields = [
            {"name": f"f{i}", "type": s} for i, (s, _) in enumerate(subs)
        ]
        vals = hst.tuples(*[v for _, v in subs]).map(
            lambda t: {f"f{i}": x for i, x in enumerate(t)}
        )
        return (
            {"type": "record",
             "name": f"r{depth}_{len(subs)}", "fields": fields},
            vals,
        )

    return hst.one_of(
        prims.map(lambda t: (t, _PRIM_STRATS[t])),
        sub.map(lambda sv: (
            {"type": "array", "items": sv[0]},
            hst.lists(sv[1], max_size=4),
        )),
        sub.map(lambda sv: (
            {"type": "map", "values": sv[0]},
            hst.dictionaries(hst.text(max_size=8), sv[1], max_size=4),
        )),
        sub.map(lambda sv: (
            ["null", sv[0]],
            hst.one_of(hst.none(), sv[1]),
        )),
        hst.lists(sub, min_size=1, max_size=3).map(mk_record),
    )


@settings(max_examples=120, deadline=None)
@given(data=hst.data())
def test_avro_roundtrip_generated_schemas(data):
    """Property: ANY schema avro_lite can express round-trips any
    value of that schema, through the full container layer, both
    codecs."""
    schema, val_strat = data.draw(_schema_and_value())
    recs = data.draw(hst.lists(val_strat, max_size=5))
    wrapper = {
        "type": "record",
        "name": "top",
        "fields": [{"name": "v", "type": schema}],
    }
    rows = [{"v": r} for r in recs]
    codec = data.draw(hst.sampled_from(["null", "deflate"]))
    out = AV.write_container(wrapper, rows, codec=codec)
    got_schema, got = AV.read_container(out)
    assert got_schema == wrapper
    assert got == rows


def _build_nonmonotonic_table(root):
    """Same shape as _build_table but with REALISTIC snapshot ids:
    random longs where the OLDER snapshot has the LARGER id, so any
    numeric-sort ordering reads history backwards."""
    s1, s2 = 9_000_000_000_000_000_002, 42
    _data(root, "data/A.parquet", range(0, 5))
    _data(root, "data/B.parquet", range(5, 10))
    _data(root, "data/C.parquet", range(10, 15))
    IB.write_manifest(
        root, "m1.avro",
        [(1, "data/A.parquet"), (1, "data/B.parquet")], s1,
    )
    IB.write_manifest_list(root, "snap-1.avro", ["m1.avro"], s1)
    IB.write_manifest(root, "m3.avro", [(1, "data/C.parquet")], s2)
    IB.write_manifest_list(
        root, "snap-2.avro", ["m1.avro", "m3.avro"], s2
    )
    snaps = [
        {"snapshot-id": s1, "manifest-list": "metadata/snap-1.avro"},
        {"snapshot-id": s2, "manifest-list": "metadata/snap-2.avro"},
    ]
    IB.write_metadata(root, 2, FIELDS, snaps, current_snapshot_id=s2)
    return s1, s2


def test_changes_nonmonotonic_snapshot_ids(spark, tmp_path):
    """Incremental consumption must order history by the LINEAGE
    (parent-snapshot-id chain / snapshot-log), never by numeric
    snapshot id — ids are random longs in real tables. Here the
    older snapshot's id is numerically LARGER."""
    root = str(tmp_path / "t")
    s1, s2 = _build_nonmonotonic_table(root)
    # from the beginning: both snapshots, in lineage order
    ch = IB.iceberg_changes(spark, root, None)
    got = sorted(
        (r["doc_id"], r["_snapshot_id"]) for r in ch.collect()
    )
    assert got == sorted(
        [(i, s1) for i in range(10)] + [(i, s2) for i in range(10, 15)]
    )
    # from s1 (the OLDER snapshot despite its larger id): only s2
    ch2 = IB.iceberg_changes(spark, root, s1)
    got2 = sorted(
        (r["doc_id"], r["_snapshot_id"]) for r in ch2.collect()
    )
    assert got2 == [(i, s2) for i in range(10, 15)]
    # s2 is NOT an ancestor of s1 — a reversed range must raise,
    # not silently return an empty/backwards feed
    with pytest.raises(ValueError, match="ancestor"):
        IB.iceberg_changes(spark, root, s2, s1)


def test_changes_requires_lineage_bookkeeping(spark, tmp_path):
    """Metadata exposing NEITHER parent-snapshot-id chains NOR a
    snapshot-log has no determinable history order — fail closed
    instead of guessing (numeric order would be wrong)."""
    root = str(tmp_path / "t")
    _build_nonmonotonic_table(root)
    mpath = os.path.join(root, "metadata", "v2.metadata.json")
    with open(mpath) as f:
        md = json.load(f)
    md.pop("snapshot-log", None)
    for s in md["snapshots"]:
        s.pop("parent-snapshot-id", None)
    with open(mpath, "w") as f:
        json.dump(md, f)
    with pytest.raises(IB.IcebergUnsupportedError, match="lineage|snapshot-log"):
        IB.iceberg_changes(spark, root, None).collect()
    # snapshot-log alone restores an order (v1-writer tables)
    md["snapshot-log"] = [
        {"timestamp-ms": 1, "snapshot-id": 9_000_000_000_000_000_002},
        {"timestamp-ms": 2, "snapshot-id": 42},
    ]
    with open(mpath, "w") as f:
        json.dump(md, f)
    ch = IB.iceberg_changes(spark, root, 9_000_000_000_000_000_002)
    assert sorted(r["doc_id"] for r in ch.collect()) == list(range(10, 15))


def test_position_deletes_external_shape_sequence_rule(spark, tmp_path):
    """Hand-built merge-on-read table in the shape an EXTERNAL v2
    writer produces: per-entry sequence numbers null (inherited from
    the manifest-list entry), delete file at sequence 2 — it must
    apply to the seq-1 data file and NOT to the seq-3 one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    _data(root, "data/A.parquet", range(0, 5))
    _data(root, "data/B.parquet", range(5, 10))
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array(
                    ["data/A.parquet", "data/A.parquet",
                     "data/B.parquet"],
                    pa.string(),
                ),
                "pos": pa.array([0, 2, 1], pa.int64()),
            }
        ),
        os.path.join(root, "data", "del.parquet"),
    )
    IB.write_manifest(root, "mA.avro", [(1, "data/A.parquet")], 1)
    IB.write_manifest(root, "mB.avro", [(1, "data/B.parquet")], 1)
    IB.write_manifest(
        root, "mD.avro", [(1, "data/del.parquet")], 1, entry_content=1
    )
    IB.write_manifest_list(
        root, "snap-1.avro",
        [("mA.avro", 1, 0, 1), ("mD.avro", 1, 1, 2),
         ("mB.avro", 1, 0, 3)],
        1,
    )
    IB.write_metadata(
        root, 1, FIELDS,
        [{"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"}],
        current_snapshot_id=1,
    )
    got = IB.read_iceberg(spark, root)
    # A loses pos 0 and 2 (ids 0, 2); B is NEWER than the delete —
    # its pos 1 (id 6) must survive
    assert sorted(r["doc_id"] for r in got.collect()) == [
        1, 3, 4, 5, 6, 7, 8, 9,
    ]
    # where= pruning composes with delete application
    got2 = IB.read_iceberg(spark, root, where={"doc_id": (0, 4)})
    assert sorted(r["doc_id"] for r in got2.collect()) == [1, 3, 4]


def test_iceberg_timestamp_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    _data(root, "data/A.parquet", range(0, 5))
    _data(root, "data/B.parquet", range(5, 10))
    IB.write_manifest(root, "m1.avro", [(1, "data/A.parquet")], 11)
    IB.write_manifest_list(root, "s1.avro", ["m1.avro"], 11)
    IB.write_manifest(root, "m2.avro", [(1, "data/B.parquet")], 7)
    IB.write_manifest_list(
        root, "s2.avro", [("m1.avro", 11), ("m2.avro", 7)], 7
    )
    IB.write_metadata(
        root, 2, FIELDS,
        [
            {"snapshot-id": 11, "manifest-list": "metadata/s1.avro",
             "timestamp-ms": 1000},
            {"snapshot-id": 7, "manifest-list": "metadata/s2.avro",
             "timestamp-ms": 3000},
        ],
        current_snapshot_id=7,
    )
    assert IB.iceberg_snapshot_at(root, 1500) == 11
    assert IB.iceberg_snapshot_at(root, 3000) == 7
    got = IB.read_iceberg(spark, root, as_of_timestamp_ms=2999)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(5))
    with pytest.raises(ValueError, match="predates"):
        IB.read_iceberg(spark, root, as_of_timestamp_ms=10)
    with pytest.raises(ValueError, match="not both"):
        IB.read_iceberg(
            spark, root, snapshot_id=7, as_of_timestamp_ms=3000
        )


def test_read_resolves_renamed_columns_by_field_id(spark, tmp_path):
    """Iceberg column identity is the FIELD ID: after a rename the
    current schema carries the new name while old data files keep the
    old parquet column name (with the same id). Name matching would
    silently return nulls; the reader must resolve by id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    # pre-rename file: column named "amount", field id 2
    sch = pa.schema(
        [
            pa.field("doc_id", pa.int64(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field("amount", pa.float64(),
                     metadata={b"PARQUET:field_id": b"2"}),
        ]
    )
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "amount": pa.array([0.5, 1.0], pa.float64())},
            schema=sch,
        ),
        os.path.join(root, "data", "old.parquet"),
    )
    # post-rename file: column named "val" (current), same id
    sch2 = pa.schema(
        [
            pa.field("doc_id", pa.int64(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field("val", pa.float64(),
                     metadata={b"PARQUET:field_id": b"2"}),
        ]
    )
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([3], pa.int64()),
             "val": pa.array([1.5], pa.float64())},
            schema=sch2,
        ),
        os.path.join(root, "data", "new.parquet"),
    )
    IB.write_manifest(
        root, "m1.avro",
        [(1, "data/old.parquet"), (1, "data/new.parquet")], 1,
    )
    IB.write_manifest_list(root, "s1.avro", ["m1.avro"], 1)
    # current schema: field 2 is NOW CALLED "val"
    IB.write_metadata(
        root, 1,
        [
            {"id": 1, "name": "doc_id", "required": False,
             "type": "long"},
            {"id": 2, "name": "val", "required": False,
             "type": "double"},
        ],
        [{"snapshot-id": 1, "manifest-list": "metadata/s1.avro"}],
        current_snapshot_id=1,
    )
    got = IB.read_iceberg(spark, root)
    rows = sorted((r["doc_id"], r["val"]) for r in got.collect())
    assert rows == [(1, 0.5), (2, 1.0), (3, 1.5)]


def test_equality_deletes_apply_with_sequence_rule(spark, tmp_path):
    """V2 EQUALITY deletes: rows matching the delete file's values in
    the equality columns (null equals null) disappear from data files
    whose sequence number is STRICTLY below the delete's; newer files
    keep matching rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    # data A (seq 1): ids 0..4 with one NULL doc_id row
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, None], pa.int64()),
                "val": pa.array(
                    [0.0, 0.5, 1.0, 1.5, 9.9], pa.float64()
                ),
            }
        ),
        os.path.join(root, "data", "A.parquet"),
    )
    # data B (seq 3): re-inserts id 1 AFTER the delete — must survive
    _data(root, "data/B.parquet", [1, 7])
    # equality delete (seq 2) on doc_id: deletes 1, 3 and NULL
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 3, None], pa.int64())}),
        os.path.join(root, "data", "eqdel.parquet"),
    )
    IB.write_manifest(root, "mA.avro", [(1, "data/A.parquet")], 1)
    IB.write_manifest(root, "mB.avro", [(1, "data/B.parquet")], 1)
    IB.write_manifest(
        root, "mE.avro", [(1, "data/eqdel.parquet")], 1,
        entry_content=2, equality_ids=[1],
    )
    IB.write_manifest_list(
        root, "s1.avro",
        [("mA.avro", 1, 0, 1), ("mE.avro", 1, 1, 2),
         ("mB.avro", 1, 0, 3)],
        1,
    )
    IB.write_metadata(
        root, 1, FIELDS,
        [{"snapshot-id": 1, "manifest-list": "metadata/s1.avro"}],
        current_snapshot_id=1,
    )
    got = IB.read_iceberg(spark, root)
    rows = sorted(
        (r["doc_id"], r["val"]) for r in got.collect()
        if r["doc_id"] is not None
    )
    nulls = [r for r in got.collect() if r["doc_id"] is None]
    # A loses 1, 3 and the NULL row; B's 1 and 7 survive (seq 3 > 2)
    assert rows == [(0, 0.0), (1, 0.5), (2, 1.0), (7, 3.5)]
    assert nulls == []
    # composes with a position delete in the same snapshot
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array(["data/B.parquet"], pa.string()),
                "pos": pa.array([1], pa.int64()),
            }
        ),
        os.path.join(root, "data", "posdel.parquet"),
    )
    IB.write_manifest(
        root, "mP.avro", [(1, "data/posdel.parquet")], 1,
        entry_content=1,
    )
    IB.write_manifest_list(
        root, "s2.avro",
        [("mA.avro", 1, 0, 1), ("mE.avro", 1, 1, 2),
         ("mB.avro", 1, 0, 3), ("mP.avro", 1, 1, 4)],
        1,
    )
    IB.write_metadata(
        root, 2, FIELDS,
        [{"snapshot-id": 1, "manifest-list": "metadata/s2.avro"}],
        current_snapshot_id=1,
    )
    got2 = IB.read_iceberg(spark, root)
    assert sorted(
        r["doc_id"] for r in got2.collect()
    ) == [0, 1, 2]  # B also loses pos 1 (id 7)
