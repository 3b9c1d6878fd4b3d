"""The WRITE side of the FileIO seam (round 11): produce → stream →
maintain → vacuum runs end-to-end on an object-store root that has no
POSIX path.

Strategy mirrors test_fileio.py's read twins, but the FIXTURES
themselves are now BUILT through the seam: the streaming sinks land
batches on a ``fake://`` root (Spark stages data at
``FileIO.spark_path``, promotion is server-side copy + delete, the
commit point is the store's conditional PUT), then OPTIMIZE /
checkpoint / log-cleanup / VACUUM / expire / orphan-removal maintain
it — all through object verbs only. Any residual ``os.*``/``open`` on
a table-space path fails outright because ``fake://…`` does not exist
as a POSIX path.

Also pins the LogStore unification (log_store_for: POSIX roots keep
the process-global store; other FileIOs commit through themselves),
conditional-PUT race semantics, and write-failure injection (an
injected PUT fault mid-commit must leave the table readable and the
retry exactly-once).
"""

import os
import threading

import pytest

from django_datastream_spark import logstores as LS
from django_datastream_spark import txnlog as TL
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import fileio as FIO
from django_datastream_spark.sources import iceberg as IB


@pytest.fixture
def fake_store(tmp_path):
    scheme = f"fakew{os.getpid()}"
    backing = str(tmp_path / "bucket")
    os.makedirs(backing, exist_ok=True)
    store = FIO.FakeObjectStore(scheme, backing)
    FIO.register_fileio(scheme, store)
    try:
        yield store, f"{scheme}://t"
    finally:
        FIO.unregister_fileio(scheme)


# ── unit: write verbs ────────────────────────────────────────────────
def test_local_fileio_conditional_put(tmp_path):
    io = FIO.LocalFileIO()
    p = str(tmp_path / "log" / "v1.json")
    io.put_if_absent(p, b"winner")
    with pytest.raises(FileExistsError):
        io.put_if_absent(p, b"loser")
    assert io.read_bytes(p) == b"winner"  # loser never tore the winner
    io.put_atomic(p, b"rewritten")
    assert io.read_bytes(p) == b"rewritten"


def test_fake_store_conditional_put_and_copy(fake_store):
    store, root = fake_store
    store.put_if_absent(f"{root}/log/v1.json", b"winner")
    with pytest.raises(FileExistsError):
        store.put_if_absent(f"{root}/log/v1.json", b"loser")
    assert store.read_bytes(f"{root}/log/v1.json") == b"winner"
    # move = server-side copy + delete, never a rename
    store.put_bytes(f"{root}/stage/a.parquet", b"bytes")
    store.move_file(f"{root}/stage/a.parquet", f"{root}/data/a.parquet")
    assert store.read_bytes(f"{root}/data/a.parquet") == b"bytes"
    assert not store.exists(f"{root}/stage/a.parquet")
    assert store.counters["copy_object"] == 1
    assert store.counters["put_if_absent"] == 2
    # delete is idempotent (S3 DeleteObject semantics)
    store.delete(f"{root}/data/a.parquet")
    store.delete(f"{root}/data/a.parquet")
    with pytest.raises(FileNotFoundError):
        store.delete(f"{root}/data/a.parquet", missing_ok=False)


def test_fake_store_conditional_put_races_one_winner(fake_store):
    store, root = fake_store
    path = f"{root}/log/00000000000000000007.json"
    outcomes: list[str] = []
    lock = threading.Lock()

    def claim(tag):
        try:
            store.put_if_absent(path, tag.encode())
            with lock:
                outcomes.append(tag)
        except FileExistsError:
            pass

    ts = [
        threading.Thread(target=claim, args=(f"w{i}",)) for i in range(8)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(outcomes) == 1  # exactly one writer won the name
    assert store.read_bytes(path) == outcomes[0].encode()


def test_log_store_for_unification(fake_store, tmp_path):
    store, _root = fake_store
    # POSIX roots keep the PROCESS-GLOBAL store (deployment override
    # must keep governing local tables)
    assert LS.log_store_for(FIO.LocalFileIO()) is TL.get_log_store()
    # any other FileIO commits through itself
    ls = LS.log_store_for(store)
    assert isinstance(ls, LS.FileIOLogStore)
    ls.put_if_absent(f"{_root}/_delta_log/x.json", b"{}")
    with pytest.raises(FileExistsError):
        ls.put_if_absent(f"{_root}/_delta_log/x.json", b"{}")
    assert ls.list(f"{_root}/_delta_log") == ["x.json"]
    assert ls.list(f"{_root}/nope") == []


def test_walk_files_and_empty_dir_prune(tmp_path):
    io = FIO.LocalFileIO()
    base = str(tmp_path / "w")
    io.put_bytes(os.path.join(base, "a/b/one.parquet"), b"1")
    io.put_bytes(os.path.join(base, "two.parquet"), b"2")
    assert io.walk_files(base) == ["a/b/one.parquet", "two.parquet"]
    io.delete(os.path.join(base, "a/b/one.parquet"))
    io.remove_empty_dirs(base)
    assert io.walk_files(base) == ["two.parquet"]
    assert not os.path.isdir(os.path.join(base, "a"))


# ── Delta: the full write chain on an object-store root ───────────────
def _batch(spark, b, rows=10, parts=True):
    if parts:
        return spark.createDataFrame(
            [(b * rows + j, float(j), j % 2) for j in range(rows)],
            "k long, v double, p int",
        ).coalesce(1)
    return spark.createDataFrame(
        [(b * rows + j, float(j)) for j in range(rows)],
        "k long, v double",
    ).coalesce(1)


def test_delta_write_chain_on_object_store(spark, fake_store):
    store, root = fake_store
    assert not os.path.exists(root)  # the root has NO POSIX path
    sink = DL.delta_streaming_sink(
        root, "app", partition_by=["p"], checkpoint_every=3
    )
    for b in range(5):
        sink(_batch(spark, b), b)
        sink(_batch(spark, b), b)  # worst-case redelivery: refused
    want = list(range(50))
    assert sorted(
        r["k"] for r in DL.read_delta(spark, root).collect()
    ) == want
    # maintenance cycle, all through object verbs
    res = DL.optimize_delta(spark, root, target_file_bytes=1 << 22)
    assert res["rewritten_files"] > 0 and not res["skipped"]
    head = max(DL.delta_versions(root))
    DL.write_delta_checkpoint(root, head)
    DL.cleanup_delta_log(root, keep_commits=2)
    vac = DL.vacuum_delta(root, keep_versions=1)
    assert vac["removed_files"] > 0
    assert sorted(
        r["k"] for r in DL.read_delta(spark, root).collect()
    ) == want
    # time travel to the retained head still serves
    assert sorted(
        r["k"] for r in DL.read_delta(spark, root, version=head).collect()
    ) == want
    # ledger floor survives maintenance: stale replay refused
    before = max(DL.delta_versions(root))
    sink(_batch(spark, 0), 0)
    assert max(DL.delta_versions(root)) == before
    # the chain really exercised object WRITE verbs
    for verb in ("put", "put_if_absent", "copy_object", "delete"):
        assert store.counters.get(verb, 0) > 0, verb


def test_delta_sink_then_streaming_read_on_object_store(
    spark, fake_store, tmp_path
):
    """The sink→stream leg: a paced streaming reader drains a table
    that only exists behind object verbs (worker processes get the
    pickled store via the fileio option)."""
    from django_datastream_spark.sources import external_stream as XS

    store, root = fake_store
    sink = DL.delta_streaming_sink(root, "app", checkpoint_every=None)
    for b in range(4):
        sink(_batch(spark, b, parts=False), b)
    XS.register(spark)
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    for _run in range(6):
        q = (
            spark.readStream.format("delta_table")
            .option("path", root)
            .option("fileio", FIO.encode_fileio(store))
            .option("maxFilesPerTrigger", "2")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)
        try:
            n = spark.read.parquet(out).count()
        except Exception:  # noqa: BLE001 — no output yet
            n = 0
        if n >= 40:
            break
    rows = [r["k"] for r in spark.read.parquet(out).select("k").collect()]
    assert sorted(rows) == list(range(40))
    assert len(rows) == len(set(rows))  # exactly once


def test_delta_sink_put_failure_is_safe(spark, fake_store):
    """An injected object-store fault on the COMMIT put: the batch
    fails, the table stays readable at the old version, and the retry
    lands the batch exactly once."""
    store, root = fake_store
    sink = DL.delta_streaming_sink(root, "app", checkpoint_every=None)
    sink(_batch(spark, 0, parts=False), 0)
    store.fail_substr = ".json"
    with pytest.raises(FIO.FakeObjectStoreError):
        sink(_batch(spark, 1, parts=False), 1)
    store.fail_substr = None
    assert sorted(
        r["k"] for r in DL.read_delta(spark, root).collect()
    ) == list(range(10))  # batch 1 never half-landed
    sink(_batch(spark, 1, parts=False), 1)  # Spark's retry
    assert sorted(
        r["k"] for r in DL.read_delta(spark, root).collect()
    ) == list(range(20))
    # the failed attempt's orphaned data files are debris until vacuum
    DL.vacuum_delta(root, keep_versions=1)
    assert sorted(
        r["k"] for r in DL.read_delta(spark, root).collect()
    ) == list(range(20))


def test_delta_commit_race_on_object_store(fake_store):
    store, root = fake_store
    DL.write_delta_commit(root, 0, [{"protocol": {
        "minReaderVersion": 1, "minWriterVersion": 2}}])
    with pytest.raises(FileExistsError):
        DL.write_delta_commit(root, 0, [{"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}}])
    assert DL.delta_versions(root) == [0]


# ── Iceberg: the full write chain on an object-store root ─────────────
def test_iceberg_write_chain_on_object_store(spark, fake_store):
    store, root = fake_store
    assert not os.path.exists(root)
    sink = IB.iceberg_streaming_sink(root, "app")
    for b in range(6):
        sink(_batch(spark, b, parts=False), b)
        sink(_batch(spark, b, parts=False), b)  # replay refused
    want = list(range(60))
    assert sorted(
        r["k"] for r in IB.read_iceberg(spark, root).collect()
    ) == want
    res = IB.optimize_iceberg(spark, root, target_file_bytes=1 << 22)
    assert res["rewritten_files"] == 6 and res["new_files"] == 1
    assert sorted(
        r["k"] for r in IB.read_iceberg(spark, root).collect()
    ) == want
    exp = IB.expire_snapshots(root, keep_snapshots=2)
    assert exp["expired"] > 0 and exp["removed_files"] > 0
    IB.remove_orphan_files(root, staging_grace_s=0)
    assert sorted(
        r["k"] for r in IB.read_iceberg(spark, root).collect()
    ) == want
    # the sink ledger survives expiry (summary → property fold)
    assert IB.last_sink_batch(root, "app") == 5
    before = len(IB.iceberg_snapshots(root))
    sink(_batch(spark, 0, parts=False), 0)
    assert len(IB.iceberg_snapshots(root)) == before
    # time travel to a retained snapshot still serves
    sid = IB.iceberg_snapshots(root)[-1]["snapshot_id"]
    assert IB.read_iceberg(spark, root, snapshot_id=sid).count() == 60
    for verb in ("put", "put_if_absent", "copy_object", "delete"):
        assert store.counters.get(verb, 0) > 0, verb


def test_iceberg_metadata_cas_on_object_store(fake_store):
    store, root = fake_store
    IB.write_metadata(root, 1, [
        {"id": 1, "name": "k", "type": "long", "required": False}
    ], [], None, atomic_new=True)
    with pytest.raises(FileExistsError):
        IB.write_metadata(root, 1, [
            {"id": 1, "name": "k", "type": "long", "required": False}
        ], [], None, atomic_new=True)


# ── HadoopFileIO: write verbs through the JVM connectors ─────────────
def test_delta_write_chain_via_hadoop_fileio(spark, tmp_path):
    """The deployment adapter's WRITE verbs (create/rename/delete via
    the JVM FileSystem) drive the same chain over a file:// URI root —
    the s3a/gs/abfss shape with the local connector standing in.
    collect_file_stats honors executor_safe=False (bounded driver
    fallback), so the whole chain stays driver-only as documented."""
    io = FIO.HadoopFileIO(spark)
    FIO.register_fileio("file", io)
    try:
        root = f"file://{tmp_path}/tbl"
        sink = DL.delta_streaming_sink(root, "app", checkpoint_every=None)
        for b in range(3):
            df = spark.createDataFrame(
                [(b * 10 + j, float(j)) for j in range(10)],
                "k long, v double",
            ).coalesce(1)
            sink(df, b)
            sink(df, b)  # replay refused
        want = list(range(30))
        assert sorted(
            r["k"] for r in DL.read_delta(spark, root).collect()
        ) == want
        DL.optimize_delta(spark, root, target_file_bytes=1 << 22)
        head = max(DL.delta_versions(root))
        DL.write_delta_checkpoint(root, head)
        DL.cleanup_delta_log(root, keep_commits=1)
        DL.vacuum_delta(root, keep_versions=1)
        assert sorted(
            r["k"] for r in DL.read_delta(spark, root).collect()
        ) == want
    finally:
        FIO.unregister_fileio("file")


def test_hadoop_fileio_commit_point_cas(spark, tmp_path):
    """create(overwrite=false) through the JVM — atomic on the local
    connector (and HDFS/ABFS); the racing writer surfaces as
    FileExistsError, never a clobbered commit."""
    io = FIO.HadoopFileIO(spark)
    p = f"file://{tmp_path}/log/v1.json"
    io.put_if_absent(p, b"winner")
    with pytest.raises(FileExistsError):
        io.put_if_absent(p, b"loser")
    assert io.read_bytes(p) == b"winner"
    io.put_bytes(p, b"rewritten")
    assert io.read_bytes(p) == b"rewritten"
    io.move_file(p, f"file://{tmp_path}/log2/v1.json")
    assert not io.exists(p)
    assert io.walk_files(f"file://{tmp_path}") == ["log2/v1.json"]
    io.delete(f"file://{tmp_path}/log2/v1.json")
    io.delete(f"file://{tmp_path}/log2/v1.json")  # idempotent
    io.remove_empty_dirs(f"file://{tmp_path}")
    assert io.walk_files(f"file://{tmp_path}") == []
