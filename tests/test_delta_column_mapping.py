"""Delta ``columnMapping.mode=name`` reads: parquet files, hive dirs,
partitionValues and stats all live in PHYSICAL (col-<uuid>) space;
the reader scans there and renames to the logical schema. id mode
matches parquet columns by FIELD ID (files from before a rename keep
reading); adopt fails closed (the txn layer would expose physical
names)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import roaring as RB

P_DOC, P_PART, P_VAL = "col-d1f3", "col-p9a0", "col-v77c"

MAPPED = StructType(
    [
        StructField(
            "doc_id", LongType(), True,
            {"delta.columnMapping.id": 1,
             "delta.columnMapping.physicalName": P_DOC},
        ),
        StructField(
            "part", IntegerType(), True,
            {"delta.columnMapping.id": 2,
             "delta.columnMapping.physicalName": P_PART},
        ),
        StructField(
            "val", DoubleType(), True,
            {"delta.columnMapping.id": 3,
             "delta.columnMapping.physicalName": P_VAL},
        ),
    ]
)


def _write_phys(root, rel, ids):
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                P_DOC: pa.array([int(i) for i in ids], pa.int64()),
                P_VAL: pa.array([i * 0.5 for i in ids], pa.float64()),
            }
        ),
        full,
    )


def _meta(mode="name"):
    return {
        "metaData": {
            "id": "cm-table",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": MAPPED.json(),
            "partitionColumns": ["part"],
            "configuration": {"delta.columnMapping.mode": mode},
        }
    }


_PROTO = {
    "protocol": {
        "minReaderVersion": 2, "minWriterVersion": 5,
    }
}


def _add(rel, p, stats=None, dv=None):
    a = {
        "add": {
            "path": rel,
            "partitionValues": {P_PART: str(p)},  # PHYSICAL keys
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }
    if stats:
        a["add"]["stats"] = json.dumps(stats)
    if dv:
        a["add"]["deletionVector"] = dv
    return a


def _build(root):
    even = [0, 2, 4, 6, 8]
    odd = [1, 3, 5, 7, 9]
    # hive dirs in PHYSICAL partition-column name
    _write_phys(root, f"{P_PART}=0/f0.parquet", even)
    _write_phys(root, f"{P_PART}=1/f1.parquet", odd)
    DL.write_delta_commit(
        root, 0,
        [_PROTO, _meta(),
         _add(f"{P_PART}=0/f0.parquet", 0,
              {"minValues": {P_DOC: 0}, "maxValues": {P_DOC: 8}}),
         _add(f"{P_PART}=1/f1.parquet", 1,
              {"minValues": {P_DOC: 1}, "maxValues": {P_DOC: 9}})],
    )


def test_name_mapping_reads_logical(spark, tmp_path):
    root = str(tmp_path / "t")
    _build(root)
    got = DL.read_delta(spark, root)
    assert [f.name for f in got.schema.fields] == ["doc_id", "part", "val"]
    rows = sorted(
        (r["doc_id"], r["part"], r["val"]) for r in got.collect()
    )
    assert rows == sorted((i, i % 2, i * 0.5) for i in range(10))


def test_name_mapping_where_prunes_in_physical_space(spark, tmp_path):
    root = str(tmp_path / "t")
    _build(root)
    # logical predicate; stats/partitionValues live in physical keys
    got = DL.read_delta(spark, root, where={"part": (1, 1)})
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 3, 5, 7, 9]
    got2 = DL.read_delta(spark, root, where={"doc_id": (2, 6)})
    assert sorted(r["doc_id"] for r in got2.collect()) == [2, 3, 4, 5, 6]


def test_name_mapping_with_deletion_vector(spark, tmp_path):
    root = str(tmp_path / "t")
    _build(root)
    # delete positions 0 and 2 of the odd file (ids 1 and 5)
    data = RB.encode_dv_data([0, 2])
    DL.write_delta_commit(
        root, 1,
        [{"remove": {"path": f"{P_PART}=1/f1.parquet",
                     "dataChange": True}},
         _add(f"{P_PART}=1/f1.parquet", 1, dv={
             "storageType": "i",
             "pathOrInlineDv": RB.z85_encode(data),
             "sizeInBytes": len(data), "cardinality": 2,
         })],
    )
    got = DL.read_delta(spark, root)
    assert sorted(r["doc_id"] for r in got.collect()) == [
        0, 2, 3, 4, 6, 7, 8, 9,
    ]


def _write_with_ids(root, rel, ids, names):
    """Physical parquet carrying FIELD IDS — what id-mode writers
    emit. ``names``: (doc_col, val_col) physical names (they VARY
    per file after renames; ids are the stable identity)."""
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    dname, vname = names
    sch = pa.schema(
        [
            pa.field(dname, pa.int64(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field(vname, pa.float64(),
                     metadata={b"PARQUET:field_id": b"3"}),
        ]
    )
    pq.write_table(
        pa.table(
            {
                dname: pa.array([int(i) for i in ids], pa.int64()),
                vname: pa.array([i * 0.5 for i in ids], pa.float64()),
            },
            schema=sch,
        ),
        full,
    )


def test_id_mapping_reads_by_field_id(spark, tmp_path):
    """mode=id: parquet columns match by FIELD ID, so files written
    BEFORE a column rename (different physical names, same ids) read
    correctly — the case name-matching cannot handle."""
    root = str(tmp_path / "t")
    even = [0, 2, 4, 6, 8]
    odd = [1, 3, 5, 7, 9]
    # pre-rename file: physical names col-old-d/col-old-v
    _write_with_ids(
        root, f"{P_PART}=0/f0.parquet", even, ("col-old-d", "col-old-v")
    )
    # post-rename file: different physical names, same field ids
    _write_with_ids(
        root, f"{P_PART}=1/f1.parquet", odd, (P_DOC, P_VAL)
    )
    DL.write_delta_commit(
        root, 0,
        [_PROTO, _meta("id"),
         _add(f"{P_PART}=0/f0.parquet", 0,
              {"minValues": {P_DOC: 0}, "maxValues": {P_DOC: 8}}),
         _add(f"{P_PART}=1/f1.parquet", 1,
              {"minValues": {P_DOC: 1}, "maxValues": {P_DOC: 9}})],
    )
    got = DL.read_delta(spark, root)
    assert [f.name for f in got.schema.fields] == ["doc_id", "part", "val"]
    rows = sorted(
        (r["doc_id"], r["part"], r["val"]) for r in got.collect()
    )
    assert rows == sorted((i, i % 2, i * 0.5) for i in range(10))
    # logical where= still prunes through physical stats/partitions
    got2 = DL.read_delta(spark, root, where={"part": (0, 0)})
    assert sorted(r["doc_id"] for r in got2.collect()) == even


def test_id_mapping_without_ids_fails_closed(spark, tmp_path):
    root = str(tmp_path / "t")
    _write_phys(root, "a.parquet", [1])
    md = _meta("id")
    # strip the column-mapping ids from the schema metadata
    sch = json.loads(md["metaData"]["schemaString"])
    for f in sch["fields"]:
        f["metadata"].pop("delta.columnMapping.id", None)
    md["metaData"]["schemaString"] = json.dumps(sch)
    DL.write_delta_commit(root, 0, [_PROTO, md, _add("a.parquet", 0)])
    with pytest.raises(DL.DeltaUnsupportedError, match="columnMapping.id"):
        DL.read_delta(spark, root)


def test_adopt_fails_closed_under_mapping(spark, tmp_path):
    root = str(tmp_path / "t")
    _build(root)
    with pytest.raises(DL.DeltaUnsupportedError, match="physical"):
        DL.adopt_delta(spark, root, root)
