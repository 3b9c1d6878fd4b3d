"""External-lakehouse metadata plane AT SCALE (the round-8 verdict's
one weak spot): a snapshot with ≥100k add actions must resolve through
the COLUMNAR fold (checkpoint stays Arrow, stats never parse
driver-side) and prune through the DISTRIBUTED path — mirroring
tests/test_txnlog_scale.py for the engine's own log.

The proof is structural, not a timing assertion: every synthetic add
points at a file that DOES NOT EXIST, so any path that survives
pruning when it shouldn't (or any fold that lost the tail's
remove/add) makes the scan raise. Only the handful of REAL files'
rows can come back."""

import pytest
import json
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

from django_datastream_spark.sources import avro_lite as AV
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import iceberg as IB

N_SYNTH = 100_000


def _data(root, rel, lo, hi):
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full) or full, exist_ok=True)
    ids = list(range(lo, hi))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "val": pa.array([i * 0.5 for i in ids], pa.float64()),
            }
        ),
        full,
    )


def _stats(lo, hi):
    return json.dumps(
        {
            "numRecords": hi - lo,
            "minValues": {"doc_id": lo},
            "maxValues": {"doc_id": hi - 1},
        }
    )


def _build_big_delta(root):
    """Checkpoint at v0 with N_SYNTH+3 adds (3 real files in
    [0,30), synthetic files covering doc_id >= 1000), JSON tail v1
    removing one real file and adding a fresh real one."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    for k in range(3):
        _data(root, f"real{k}.parquet", k * 10, k * 10 + 10)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("val", DoubleType())]
    )
    paths = [f"real{k}.parquet" for k in range(3)] + [
        f"synth/f{i}.parquet" for i in range(N_SYNTH)
    ]
    stats = [_stats(k * 10, k * 10 + 10) for k in range(3)] + [
        _stats(1000 + i * 10, 1000 + i * 10 + 10) for i in range(N_SYNTH)
    ]
    n = len(paths) + 2
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ]
    )
    proto_col = pa.array(
        [{"minReaderVersion": 1, "minWriterVersion": 2}] + [None] * (n - 1),
        proto_t,
    )
    meta_col = pa.array(
        [None]
        + [
            {
                "id": "big",
                "format": {"provider": "parquet"},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": [],
            }
        ]
        + [None] * (n - 2),
        meta_t,
    )
    add_col = pa.array(
        [None, None]
        + [
            {
                "path": p,
                "partitionValues": [],
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "stats": s,
            }
            for p, s in zip(paths, stats)
        ],
        add_t,
    )
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    pq.write_table(
        pa.table(
            {"protocol": proto_col, "metaData": meta_col, "add": add_col}
        ),
        os.path.join(log, f"{0:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 0, "size": n}, f)
    # JSON tail: remove real0, add real3 (spec-legal: v0 json cleaned)
    _data(root, "real3.parquet", 30, 40)
    DL.write_delta_commit(
        root,
        1,
        [
            {"remove": {"path": "real0.parquet", "dataChange": True}},
            {
                "add": {
                    "path": "real3.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": _stats(30, 40),
                }
            },
        ],
    )


def test_delta_100k_adds_resolve_and_prune_distributed(spark, tmp_path):
    root = str(tmp_path / "big")
    _build_big_delta(root)
    v, md, adds = DL.delta_snapshot_arrow(root)
    assert v == 1
    assert adds.num_rows == N_SYNTH + 3  # -real0 +real3
    assert isinstance(adds, pa.Table)  # columnar end to end
    live = set(adds.column("path").to_pylist())
    assert "real0.parquet" not in live and "real3.parquet" in live
    # the distributed prune keeps exactly the real files' ranges;
    # every synthetic survivor would make the scan raise (no file)
    assert adds.num_rows >= DL.DISTRIBUTED_PRUNE_AT
    got = DL.read_delta(spark, root, where={"doc_id": (12, 35)})
    # bounds are INCLUSIVE, the txn_read(where=) contract
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(12, 36))


def test_delta_100k_snapshot_is_arrow_not_dicts(tmp_path):
    """The fold itself never materializes actions as Python dicts:
    delta_snapshot_arrow at 100k resolves in bounded time and the
    stats column is untouched Arrow (still a string array)."""
    root = str(tmp_path / "big")
    _build_big_delta(root)
    _v, _md, adds = DL.delta_snapshot_arrow(root)
    assert adds.column("stats").type == pa.string()
    # spot-check the tail override merged columnar-side
    tbl = adds.filter(
        pa.compute.equal(adds.column("path"), "real3.parquet")
    )
    assert tbl.num_rows == 1


def _build_big_iceberg(root, n_manifests=64, per_manifest=1600):
    """One REAL file ([0,10)) + n_manifests*per_manifest-1 synthetic
    entries with doc_id bounds >= 1000, spread over enough manifests
    to trip the distributed decode threshold."""
    _data(root, "data/real.parquet", 0, 10)
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "val", "required": False, "type": "double"},
    ]

    def bounds(lo, hi):
        return (
            [{"key": 1, "value": struct.pack("<q", lo)}],
            [{"key": 1, "value": struct.pack("<q", hi)}],
        )

    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    names = []
    k = 0
    for mi in range(n_manifests):
        recs = []
        for _ in range(per_manifest):
            if k == 0:
                rel, (lo, hi) = "data/real.parquet", (0, 9)
            else:
                rel, (lo, hi) = f"data/s{k}.parquet", (
                    1000 + k * 10, 1000 + k * 10 + 9,
                )
            blo, bhi = bounds(lo, hi)
            recs.append(
                {
                    "status": 1,
                    "snapshot_id": 1,
                    "data_file": {
                        "content": 0,
                        "file_path": rel,
                        "file_format": "PARQUET",
                        "record_count": 10,
                        "file_size_in_bytes": 1,
                        "lower_bounds": blo,
                        "upper_bounds": bhi,
                    },
                }
            )
            k += 1
        name = f"m{mi}.avro"
        with open(os.path.join(meta_dir, name), "wb") as f:
            f.write(
                AV.write_container(IB._MANIFEST_SCHEMA, recs, codec="null")
            )
        names.append(name)
    IB.write_manifest_list(root, "snap-1.avro", names, 1)
    IB.write_metadata(
        root, 1, fields,
        [{"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"}],
        current_snapshot_id=1,
    )


def test_iceberg_100k_entries_distributed_decode(spark, tmp_path):
    root = str(tmp_path / "big")
    _build_big_iceberg(root)
    assert 64 >= IB.DISTRIBUTED_MANIFESTS_AT
    # distributed decode + bounds prune: only the real file survives —
    # any synthetic survivor would make the parquet scan raise
    got = IB.read_iceberg(spark, root, where={"doc_id": (3, 7)})
    assert sorted(r["doc_id"] for r in got.collect()) == [3, 4, 5, 6, 7]
    # unpruned resolution still lists everything (driver fold below
    # threshold would too — here it's the job path)
    md, files = IB.iceberg_live_files(root, spark=spark)
    assert len(files) == 64 * 1600


@pytest.mark.slow
def test_refsets_at_100k_entries_stay_metadata_plane(tmp_path):
    """The cross-log retention guard (sources/refsets.py) folds each
    sibling's remaining history once per maintenance call — at 100k
    manifest/checkpoint entries that fold must stay columnar/bounded
    (seconds, not minutes; structural proof: exact counts come back,
    and single-log roots pay nothing)."""
    import time

    from django_datastream_spark.sources import refsets as RS

    droot = str(tmp_path / "d")
    _build_big_delta(droot)
    t0 = time.time()
    drefs = RS.delta_referenced(droot)
    dt = time.time() - t0
    # v0 checkpoint: 3 real + N_SYNTH adds; v1 tail: -1 real +1 real
    assert len(drefs) == N_SYNTH + 4
    assert dt < 30.0, f"delta_referenced took {dt:.1f}s at 100k"

    iroot = str(tmp_path / "i")
    _build_big_iceberg(iroot)
    t0 = time.time()
    irefs = RS.iceberg_referenced(iroot)
    dt = time.time() - t0
    assert len(irefs) > 100_000  # data files + manifests + list
    assert dt < 30.0, f"iceberg_referenced took {dt:.1f}s at 100k"

    # a SINGLE-log root pays ~nothing for the guard
    t0 = time.time()
    files, dirs = RS.sibling_referenced(droot, exclude="delta")
    assert files == set() and dirs == set()
    assert time.time() - t0 < 0.1
