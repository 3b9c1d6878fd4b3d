"""Conversion CHURN: the zero-copy converter tracked against a
source that keeps committing — the bounded in-suite cousin of
tools/soak_external.py for the conversion tier.

Delta -> Iceberg: every round lands 1-2 source commits (appends,
rewrites, deletion-vector GROWTH on changing files), every third
round compacts the source (optimize_delta — legal on the source log
of a mirror) and vacuums under the cross-log guard; conversion runs
every round and the invariant is total: the Iceberg view equals the
Delta view row-for-row after every single convert, era snapshots
keep serving their own live sets, and the guard never let vacuum
delete a file the converted history still references.

Iceberg -> Delta: snapshots append + position deletes grow across
rounds; same equality invariant through the Delta view.
"""

import pytest
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from django_datastream_spark.sources import convert as CV
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import iceberg as IB
from django_datastream_spark.sources import roaring as RB
from tests.test_delta import _add, _meta, _write_data


def _rows(df):
    return sorted(
        (r["doc_id"], round(r["val"], 4)) for r in df.collect()
    )


def _dv_actions(root, rel, positions):
    u = uuid.uuid4()
    off, size, card = RB.write_dv_file(
        os.path.join(root, f"deletion_vector_{u}.bin"),
        sorted(positions),
    )
    a = _add(rel)
    a["add"]["deletionVector"] = {
        "storageType": "u",
        "pathOrInlineDv": RB.make_uuid_descriptor_path(u),
        "offset": off,
        "sizeInBytes": size,
        "cardinality": card,
    }
    return [
        {"remove": {"path": rel, "dataChange": True}},
        a,
    ]


@pytest.mark.slow
def test_delta_to_iceberg_churn(spark, tmp_path):
    root = str(tmp_path / "t")
    _write_data(root, "f0.parquet", range(0, 20))
    DL.write_delta_commit(
        root, 0,
        [
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }},
            _meta(partitioned=False),
            _add("f0.parquet"),
        ],
    )
    v = 0
    dv_state: dict[str, set] = {}
    era_pins = []  # (snapshot_id, expected rows)
    next_id = 100
    for rnd in range(10):
        # 1) append a fresh file
        rel = f"f{rnd + 1}.parquet"
        _write_data(root, rel, range(next_id, next_id + 10))
        next_id += 10
        v += 1
        DL.write_delta_commit(root, v, [_add(rel)])
        # 2) every other round: grow a deletion vector on the oldest
        #    still-live file that has room
        if rnd % 2 == 1:
            target = f"f{rnd - 1}.parquet"
            cur = dv_state.get(target, set())
            cur = cur | {len(cur)}  # strictly growing positions
            dv_state[target] = cur
            v += 1
            DL.write_delta_commit(
                root, v, _dv_actions(root, target, cur)
            )
        # 3) every third round: source-side compaction + vacuum
        #    under the cross-log guard
        if rnd % 3 == 2:
            DL.optimize_delta(spark, root, target_file_bytes=1 << 10)
            v = max(DL.delta_versions(root))
            dv_state = {}  # rewrites materialize the vectors
            DL.vacuum_delta(root, keep_versions=1)
        r = CV.convert_delta_to_iceberg(spark, root)
        want = _rows(DL.read_delta(spark, root))
        got = _rows(IB.read_iceberg(spark, root))
        assert got == want, f"round {rnd}: views diverged"
        era_pins.append((r["snapshots"][r["txn_version"]], want))
    # era snapshots that still exist serve their own live sets
    md = IB.iceberg_metadata(root)
    alive = {s["snapshot-id"] for s in md.get("snapshots", [])}
    checked = 0
    for sid, want in era_pins:
        if sid in alive:
            got = _rows(IB.read_iceberg(spark, root, snapshot_id=sid))
            assert got == want
            checked += 1
    assert checked >= 3  # several eras remained time-travelable


def test_iceberg_to_delta_churn(spark, tmp_path):
    root = str(tmp_path / "t")
    fields = [
        {"id": 1, "name": "doc_id", "required": True, "type": "long"},
        {"id": 2, "name": "val", "required": False, "type": "double"},
    ]

    def _data(rel, lo, hi):
        full = os.path.join(root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(lo, hi), pa.int64()),
                    "val": pa.array(
                        [i * 0.5 for i in range(lo, hi)],
                        pa.float64(),
                    ),
                }
            ),
            full,
        )

    snaps = []
    mans_alive: list[tuple] = []  # (name, sid, content, seq)
    dead_per_file: dict[str, set] = {}
    seq = 0
    next_id = 0
    for rnd in range(8):
        seq += 1
        sid = rnd + 1
        new_mans = []
        # append one data file per round
        rel = f"data/d{rnd}.parquet"
        _data(rel, next_id, next_id + 10)
        next_id += 10
        mn = f"m-add-{rnd}.avro"
        IB.write_manifest(root, mn, [(1, rel)], sid)
        new_mans.append((mn, sid, 0, seq))
        # every other round: grow position deletes on round-0's file
        if rnd % 2 == 1:
            cur = dead_per_file.get("data/d0.parquet", set())
            cur = cur | {len(cur)}
            dead_per_file["data/d0.parquet"] = cur
            drel = f"data/del-{rnd}.parquet"
            pq.write_table(
                pa.table(
                    {
                        "file_path": pa.array(
                            ["data/d0.parquet"] * len(cur),
                            pa.string(),
                        ),
                        "pos": pa.array(sorted(cur), pa.int64()),
                    }
                ),
                os.path.join(root, drel),
            )
            dmn = f"m-del-{rnd}.avro"
            IB.write_manifest(
                root, dmn, [(1, drel)], sid, entry_content=1
            )
            new_mans.append((dmn, sid, 1, seq))
        mans_alive = mans_alive + new_mans
        ml = f"snap-{sid}.avro"
        IB.write_manifest_list(root, ml, mans_alive, sid)
        snaps.append(
            {"snapshot-id": sid, "manifest-list": f"metadata/{ml}"}
        )
        IB.write_metadata(
            root, sid, fields, list(snaps), current_snapshot_id=sid,
            last_sequence_number=seq,
        )
        CV.convert_iceberg_to_delta(spark, root)
        want = _rows(IB.read_iceberg(spark, root))
        got = _rows(DL.read_delta(spark, root))
        assert got == want, f"round {rnd}: views diverged"
    # the delta view accumulated one commit per refresh and its
    # deletes matched the growing position-delete sets throughout
    n = next_id - len(dead_per_file.get("data/d0.parquet", set()))
    assert len(got) == n
