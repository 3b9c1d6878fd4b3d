"""PyArrowFileIO — the PICKLABLE deployment adapter over
``pyarrow.fs.FileSystem`` (VERDICT r10 item 2): executor-safe
metadata decode for real remote schemes without the py4j gateway.

Tested locally via ``LocalFileSystem`` behind a registered scheme, so
the ``pafs://…`` root has no direct POSIX meaning at the call sites:
reads AND writes that pass prove they route through the Arrow
filesystem object (the same proof shape as the FakeObjectStore
twins). The executor-side legs (DV anti-join decode, distributed
footer stats) pin that the adapter pickles into tasks and decodes
there — exactly what HadoopFileIO cannot do.
"""

import os
import pickle

import pytest

from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import fileio as FIO
from django_datastream_spark.sources import iceberg as IB
from tests.test_delta import _build_hive_table
from tests.test_delta_dv import _build_dv_table
from tests.test_iceberg import _build_nonmonotonic_table


@pytest.fixture
def pafs(tmp_path):
    """A PyArrowFileIO over LocalFileSystem behind a fresh scheme;
    yields (io, posix_root, pafs_root)."""
    scheme = f"pafs{os.getpid()}"
    backing = str(tmp_path / "bucket")
    os.makedirs(backing, exist_ok=True)
    io = FIO.PyArrowFileIO(scheme=scheme, base=backing)
    FIO.register_fileio(scheme, io)
    try:
        yield io, os.path.join(backing, "t"), f"{scheme}://t"
    finally:
        FIO.unregister_fileio(scheme)


# ── unit: the adapter itself ─────────────────────────────────────────
def test_pyarrow_fileio_verbs(pafs):
    io, posix, root = pafs
    io.put_bytes(f"{root}/log/00001.json", b"one")
    io.put_bytes(f"{root}/log/00002.json", b"two")
    assert io.list_dir(f"{root}/log") == ["00001.json", "00002.json"]
    assert io.list_dir(f"{root}/log", start_after="00001.json") == [
        "00002.json"
    ]
    assert io.read_bytes(f"{root}/log/00001.json") == b"one"
    assert io.read_range(f"{root}/log/00002.json", 1, 2) == b"wo"
    assert io.exists(f"{root}/log/00001.json")
    assert not io.exists(f"{root}/log/00003.json")
    assert io.size(f"{root}/log/00001.json") == 3
    assert io.mtime(f"{root}/log/00001.json") > 0
    assert io.is_dir(f"{root}/log")
    # commit point: LocalFileSystem gets the POSIX link-CAS
    io.put_if_absent(f"{root}/log/00003.json", b"three")
    with pytest.raises(FileExistsError):
        io.put_if_absent(f"{root}/log/00003.json", b"loser")
    io.move_file(f"{root}/log/00003.json", f"{root}/data/00003.json")
    assert not io.exists(f"{root}/log/00003.json")
    assert io.walk_files(root) == [
        "data/00003.json", "log/00001.json", "log/00002.json",
    ]
    io.delete(f"{root}/data/00003.json")
    io.delete(f"{root}/data/00003.json")  # idempotent
    io.remove_empty_dirs(root)
    assert io.walk_files(root) == ["log/00001.json", "log/00002.json"]
    io.delete_prefix(f"{root}/log")
    assert io.walk_files(root) == []


def test_pyarrow_fileio_pickles(pafs):
    io, posix, root = pafs
    io.put_bytes(f"{root}/x.bin", b"payload")
    clone = pickle.loads(pickle.dumps(io))
    assert clone.read_bytes(f"{root}/x.bin") == b"payload"
    assert getattr(clone, "executor_safe", False) is True


def test_pyarrow_fileio_remote_cas_fails_with_guidance(tmp_path):
    from pyarrow.fs import LocalFileSystem, SubTreeFileSystem

    # SubTreeFileSystem stands in for "not a LocalFileSystem": the
    # conditional-PUT boundary must fail closed with remediation
    sub = SubTreeFileSystem(str(tmp_path), LocalFileSystem())
    io = FIO.PyArrowFileIO(fs=sub)
    with pytest.raises(NotImplementedError, match="coordinator"):
        io.put_if_absent("log/v1.json", b"x")


# ── interop reads through the adapter (incl. executor-side decode) ───
def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_delta_reads_via_pyarrow_fileio(spark, pafs):
    _io, posix, root = pafs
    _build_hive_table(posix)
    want = DL.read_delta(spark, posix)
    got = DL.read_delta(spark, root)
    assert sorted(map(tuple, want.collect())) == sorted(
        map(tuple, got.collect())
    )
    assert DL.delta_versions(root) == [0, 1, 2]
    got2 = DL.read_delta(spark, root, where={"doc_id": (10, 13)})
    assert _ids(got2) == [10, 12]


@pytest.mark.parametrize("storage", ["u", "i"])
def test_delta_dv_decodes_executor_side_via_pyarrow(spark, pafs, storage):
    """The DV anti-join's bitmap decode runs INSIDE mapInPandas tasks
    with the pickled adapter — the executor-safe story HadoopFileIO
    cannot offer."""
    _io, posix, root = pafs
    _build_dv_table(posix, storage)
    assert _ids(DL.read_delta(spark, root)) == [0, 2, 4, 6, 7, 8, 9]
    assert _ids(DL.read_delta(spark, root, version=1)) == [
        0, 2, 4, 5, 6, 7, 8, 9,
    ]


def test_iceberg_reads_via_pyarrow_fileio(spark, pafs):
    _io, posix, root = pafs
    _build_nonmonotonic_table(posix)
    want = sorted(map(tuple, IB.read_iceberg(spark, posix).collect()))
    got = sorted(map(tuple, IB.read_iceberg(spark, root).collect()))
    assert want == got
    snaps = IB.iceberg_snapshots(root)
    assert len(snaps) >= 2


# ── the write chain through the adapter ──────────────────────────────
def test_delta_write_chain_via_pyarrow_fileio(spark, pafs):
    io, posix, root = pafs
    sink = DL.delta_streaming_sink(root, "app", checkpoint_every=None)
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + j, float(j)) for j in range(10)],
            "k long, v double",
        ).coalesce(1)
        sink(df, b)
        sink(df, b)  # replay refused through the Arrow-backed ledger
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
