"""Multi-process LogStore fault harness (VERDICT r7 #5): commit /
restore / vacuum races driven from SEPARATE OS processes through both
LocalLogStore (POSIX create-exclusive) and SqliteCoordinatedLogStore
(object-store puts + coordinator CAS — the documented S3 recipe), plus
the coordinated store's crash-window recovery with injected failures.

No Spark anywhere: commit/txn_restore/txn_vacuum are metadata-plane,
so workers are plain CPython subprocesses — real processes, real
filesystem, real SQLite contention, no mock."""

import os
import subprocess
import sys

import pytest

from django_datastream_spark import txnlog as TL
from django_datastream_spark.logstores import (
    ChaosError,
    SqliteCoordinatedLogStore,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys, time
sys.path.insert(0, os.environ["REPO_ROOT"])
import pyarrow as pa
import pyarrow.parquet as pq
from django_datastream_spark import txnlog as TL

mode, root, wid, n, db = sys.argv[1:6]
n = int(n)
if db:
    from django_datastream_spark.logstores import SqliteCoordinatedLogStore
    TL.set_log_store(SqliteCoordinatedLogStore(db))
ok = 0
if mode == "append":
    for i in range(n):
        rel = f"part-{wid}-{i}.parquet"
        pq.write_table(
            pa.table({"k": [int(wid)], "i": [i]}),
            os.path.join(root, rel),
        )
        TL.commit(root, [rel], [], "append", [],
                  base_version=TL.latest_version(root), stats={})
        ok += 1
elif mode == "restore":
    for i in range(n):
        head = TL.latest_version(root)
        if head >= 2:
            try:
                r = TL.txn_restore(root, head - 1)
                if r["files_added"] or r["files_removed"]:
                    ok += 1
            except (TL.CommitConflictError, ValueError):
                pass
        time.sleep(0.02)
elif mode == "vacuum":
    for i in range(n):
        # huge retention + age guard: exercises fold/list under racing
        # commits without destroying anything (destructive vacuum is
        # the parent's quiesced final step)
        TL.txn_vacuum(root, retain_versions=10_000, min_age_s=3600)
        ok += 1
        time.sleep(0.02)
print(ok)
"""


def _run_workers(specs, tmp_path):
    """specs: list of (mode, root, wid, n, db). Returns success counts."""
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, REPO_ROOT=REPO_ROOT)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), mode, root, str(wid), str(n),
             db or ""],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for mode, root, wid, n, db in specs
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(int(out.strip()))
    return outs


def _store_db(tmp_path, kind):
    if kind == "local":
        return None
    return str(tmp_path / "coordinator.sqlite")


def _install(db):
    if db is None:
        return TL.set_log_store(TL.LocalLogStore())
    return TL.set_log_store(SqliteCoordinatedLogStore(db))


@pytest.mark.parametrize("kind", ["local", "coordinated"])
def test_cross_process_append_race_loses_nothing(tmp_path, kind):
    root = str(tmp_path / "t")
    db = _store_db(tmp_path, kind)
    prev = _install(db)
    try:
        TL.init_table(root)
        n_workers, per = 4, 12
        counts = _run_workers(
            [("append", root, w, per, db) for w in range(n_workers)],
            tmp_path,
        )
        # CONSERVATION: every successful commit took exactly one
        # version — a broken CAS (two writers on one name) would lose
        # a commit and break this equality
        assert sum(counts) == n_workers * per
        head = TL.latest_version(root)
        assert head == n_workers * per
        # dense history: every version readable, every add distinct
        adds = []
        for v in range(1, head + 1):
            c = TL._read_commit(root, v)
            assert c["version"] == v and c["op"] == "append"
            adds.extend(c["adds"])
        assert len(adds) == len(set(adds)) == n_workers * per
        _, files = TL.snapshot(root)
        assert files == set(adds)
        for rel in files:
            assert os.path.exists(os.path.join(root, rel))
    finally:
        TL.set_log_store(prev)


@pytest.mark.parametrize("kind", ["local", "coordinated"])
def test_cross_process_commit_restore_vacuum_soak(tmp_path, kind):
    root = str(tmp_path / "t")
    db = _store_db(tmp_path, kind)
    prev = _install(db)
    try:
        TL.init_table(root)
        counts = _run_workers(
            [
                ("append", root, 0, 10, db),
                ("append", root, 1, 10, db),
                ("restore", root, 2, 8, db),
                ("vacuum", root, 3, 8, db),
            ],
            tmp_path,
        )
        n_commits = counts[0] + counts[1] + counts[2]
        head = TL.latest_version(root)
        assert head == n_commits  # vacuum commits nothing
        assert counts[3] == 8  # fold-under-race never crashed
        # every historical snapshot still folds, and the live set is
        # fully present on disk (nothing destroyed by racing vacuums)
        for v in range(1, head + 1):
            TL.snapshot(root, v)
        _, live = TL.snapshot(root)
        for rel in live:
            assert os.path.exists(os.path.join(root, rel))
        # quiesced destructive vacuum: plant an orphan, sweep, and the
        # live set survives while the orphan goes
        orphan = os.path.join(root, "orphan-crashed-writer.parquet")
        with open(orphan, "wb") as f:
            f.write(b"PAR1junkPAR1")
        removed = TL.txn_vacuum(root, retain_versions=0, min_age_s=0.0)
        assert "orphan-crashed-writer.parquet" in removed
        _, live2 = TL.snapshot(root)
        assert live2 == live
        for rel in live2:
            assert os.path.exists(os.path.join(root, rel))
    finally:
        TL.set_log_store(prev)


# ---------------------------------------------------------------------------
# coordinated-store unit + crash-window suite
# ---------------------------------------------------------------------------
def test_coordinated_basic_contract(tmp_path):
    db = str(tmp_path / "c.sqlite")
    s = SqliteCoordinatedLogStore(db)
    d = str(tmp_path / "log")
    p = os.path.join(d, "v0000000001.json")
    s.put_if_absent(p, b"one")
    assert s.read(p) == b"one"
    with pytest.raises(FileExistsError):
        s.put_if_absent(p, b"two")
    assert s.read(p) == b"one"  # loser never tears the winner
    assert s.list(d) == ["v0000000001.json"]
    s.put_atomic(os.path.join(d, "checkpoint-v1.json"), b"cp")
    s.put_atomic(os.path.join(d, "checkpoint-v1.json"), b"cp2")
    assert s.read(os.path.join(d, "checkpoint-v1.json")) == b"cp2"
    with pytest.raises(FileNotFoundError):
        s.read(os.path.join(d, "missing.json"))
    assert s.list(str(tmp_path / "nope")) == []


def test_crash_after_stage_leaves_name_free(tmp_path):
    db = str(tmp_path / "c.sqlite")
    d = str(tmp_path / "log")
    p = os.path.join(d, "v0000000001.json")
    chaotic = SqliteCoordinatedLogStore(db, fail_after_stage=True)
    with pytest.raises(ChaosError):
        chaotic.put_if_absent(p, b"torn")
    s = SqliteCoordinatedLogStore(db)
    assert s.list(d) == []  # staged orphan invisible
    s.put_if_absent(p, b"good")  # name still free: no claim landed
    assert s.read(p) == b"good"


def test_crash_after_claim_is_recovered_by_readers(tmp_path):
    """THE crash window: writer A claims the name, dies before
    publishing. The name is taken (B's rival commit must lose), and
    A's content — staged complete before the claim — is visible to
    every reader via fix-up-on-read."""
    db = str(tmp_path / "c.sqlite")
    d = str(tmp_path / "log")
    p = os.path.join(d, "v0000000001.json")
    a = SqliteCoordinatedLogStore(db, fail_after_claim=True)
    with pytest.raises(ChaosError):
        a.put_if_absent(p, b"from-A")
    assert not os.path.exists(p)  # publish never ran
    b = SqliteCoordinatedLogStore(db)
    with pytest.raises(FileExistsError):
        b.put_if_absent(p, b"from-B")  # the claim fences B out
    assert b.read(p) == b"from-A"  # and recovery serves A's commit
    assert "v0000000001.json" in b.list(d)
    # zombie A resuming its publish is idempotent, never tears
    a.fail_after_claim = False
    rows = list(b.list(d))
    assert b.read(p) == b"from-A" and rows == ["v0000000001.json"]


def test_crash_after_claim_recovery_through_txn_fold(tmp_path):
    """End-to-end through the txn layer: a commit whose writer died
    post-claim still counts — latest_version sees it, the fold reads
    it, and the next writer lands on the NEXT version."""
    db = str(tmp_path / "c.sqlite")
    root = str(tmp_path / "t")
    prev = TL.set_log_store(
        SqliteCoordinatedLogStore(db, fail_after_claim=True)
    )
    try:
        TL.init_table(root)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"k": [1]}), os.path.join(root, "a.parquet")
        )
        with pytest.raises(ChaosError):
            TL.commit(root, ["a.parquet"], [], "append", [],
                      base_version=0, stats={})
        # healthy writer takes over the SAME log
        TL.set_log_store(SqliteCoordinatedLogStore(db))
        assert TL.latest_version(root) == 1  # crashed commit visible
        pq.write_table(
            pa.table({"k": [2]}), os.path.join(root, "b.parquet")
        )
        v = TL.commit(root, ["b.parquet"], [], "append", [],
                      base_version=TL.latest_version(root), stats={})
        assert v == 2
        _, files = TL.snapshot(root)
        assert files == {"a.parquet", "b.parquet"}
    finally:
        TL.set_log_store(prev)


def test_preexisting_canonical_object_fails_closed(tmp_path):
    """A canonical object the coordinator DB has never heard of (a
    table previously written via LocalLogStore, or a recreated DB)
    must make put_if_absent FAIL, not silently overwrite a committed
    version — the coordinator DB must live as long as the objects it
    guards, and this check is the tripwire when it didn't."""
    db = str(tmp_path / "coord.db")
    target = str(tmp_path / "tbl" / "_txn" / "00000000000000000001.json")
    os.makedirs(os.path.dirname(target))
    with open(target, "wb") as f:
        f.write(b"committed-elsewhere")
    s = SqliteCoordinatedLogStore(db)
    with pytest.raises(FileExistsError):
        s.put_if_absent(target, b"usurper")
    with open(target, "rb") as f:
        assert f.read() == b"committed-elsewhere"
    # but an object THIS coordinator published keeps the normal
    # contract: second put raises, content is the first writer's
    fresh = str(tmp_path / "tbl" / "_txn" / "00000000000000000002.json")
    s.put_if_absent(fresh, b"first")
    with pytest.raises(FileExistsError):
        s.put_if_absent(fresh, b"second")
    assert s.read(fresh) == b"first"
