"""LogStore seam tests (VERDICT r6 #2): the commit protocol runs
through a pluggable store whose ``put_if_absent`` is the CAS, and the
optimistic conflict rules hold when that CAS is lost — proven by a
fault-injecting store that lands a RIVAL commit at the contested
version an instant before ours, exactly the race an object-store
coordinator adjudicates."""

from __future__ import annotations

import collections
import json
import os

import pytest

from django_datastream_spark import txnlog as TL


@pytest.fixture
def restore_store():
    prev = TL.get_log_store()
    yield
    TL.set_log_store(prev)


class Recording(TL.LocalLogStore):
    def __init__(self):
        self.calls = collections.Counter()

    def list(self, dirpath):
        self.calls["list"] += 1
        return super().list(dirpath)

    def read(self, path):
        self.calls["read"] += 1
        return super().read(path)

    def put_if_absent(self, path, data):
        self.calls["put_if_absent"] += 1
        return super().put_if_absent(path, data)

    def put_atomic(self, path, data):
        self.calls["put_atomic"] += 1
        return super().put_atomic(path, data)


class InjectRival(TL.LocalLogStore):
    """Before OUR first put at a commit path, land ``rival`` there —
    our put then loses the CAS exactly as if another writer won."""

    def __init__(self, rival: dict):
        self.rival = rival

    def put_if_absent(self, path, data):
        name = os.path.basename(path)
        if self.rival is not None and name.startswith("v"):
            rival, self.rival = self.rival, None
            rival = dict(rival, version=int(name[1:-5]))
            super().put_if_absent(path, json.dumps(rival).encode())
        super().put_if_absent(path, data)


def _rival(op, partitions, removes=(), deletes=None):
    return {
        "op": op,
        "adds": [],
        "removes": list(removes),
        "partitions": list(partitions),
        "writer": "rival",
        "base_version": 0,
        "stats": {},
        "data_change": True,
        "deletes": deletes or {},
        "app_txn": None,
        "schema": None,
        "constraint": None,
    }


def test_log_io_routes_through_store(spark, tmp_path, restore_store):
    path = str(tmp_path / "t")
    TL.init_table(path)
    rec = Recording()
    TL.set_log_store(rec)
    df = spark.range(0, 10).selectExpr("id as k")
    v = TL.txn_append(spark, df.coalesce(1), path, [])
    assert rec.calls["put_if_absent"] == 1  # exactly the commit point
    assert rec.calls["list"] > 0
    assert {r["k"] for r in TL.txn_read(spark, path).collect()} == set(
        range(10)
    )
    assert rec.calls["read"] > 0  # the fold read the commit via the store
    # checkpoints publish through put_atomic
    for i in range(v + 1, TL.CHECKPOINT_EVERY + 1):
        TL.commit(path, [], [], "append", [], base_version=i - 1)
    assert rec.calls["put_atomic"] >= 1


def test_lost_cas_rebases_nonconflicting_append(tmp_path, restore_store):
    path = str(tmp_path / "t")
    TL.init_table(path)
    TL.set_log_store(InjectRival(_rival("append", ["p=1"])))
    v = TL.commit(
        path,
        ["p=1/ours.parquet"],
        [],
        "append",
        [],
        base_version=0,
        stats={},
    )
    # rival took v1; our append rebased onto it and landed at v2
    assert v == 2
    assert TL._read_commit(path, 1)["writer"] == "rival"
    _, files = TL.snapshot(path)
    assert "p=1/ours.parquet" in files


def test_lost_cas_conflicts_merge_on_partition_overlap(
    tmp_path, restore_store
):
    path = str(tmp_path / "t")
    TL.init_table(path)
    TL.set_log_store(InjectRival(_rival("append", ["p=1"])))
    with pytest.raises(TL.CommitConflictError):
        TL.commit(
            path,
            ["p=1/merge-out.parquet"],
            [],
            "merge",
            ["p=1"],
            base_version=0,
            stats={},
        )
    # the rival's commit is intact; ours never landed
    assert TL.latest_version(path) == 1
    assert TL._read_commit(path, 1)["writer"] == "rival"


def test_lost_cas_conflicts_delete_on_touched_file(
    tmp_path, restore_store
):
    path = str(tmp_path / "t")
    TL.init_table(path)
    v = TL.commit(
        path, ["a.parquet"], [], "append", [], base_version=0, stats={}
    )
    # rival rewrites a.parquet away; our delete's vector on it must
    # conflict, not resurrect-or-double-apply
    TL.set_log_store(
        InjectRival(_rival("optimize", ["."], removes=["a.parquet"]))
    )
    with pytest.raises(TL.CommitConflictError):
        TL.commit(
            path,
            [],
            [],
            "delete",
            [],
            base_version=v,
            stats={},
            deletes={"a.parquet": {"dv": "_dv/x", "n": 1}},
        )
