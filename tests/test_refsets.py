"""Cross-log retention on MULTI-LOG roots (round 11, sources/refsets.py).

The hazard class: adopt/publish/convert leave one root with up to
three metadata trees (_txn_log, _delta_log, metadata/) describing the
SAME data files, and each log's maintenance verb used to compute
liveness from its own history alone — so vacuuming one log could
delete files a sibling's remaining history still references
(time-travel FileNotFoundError on the sibling), and txn_vacuum's data
walk could sweep the sibling's spec-named ``.parquet`` METADATA
(Delta checkpoints, CDF exports, Iceberg position-delete exports) as
orphans.

Pins here:
1. txn_vacuum never touches sibling metadata planes and never removes
   a data file the sibling log still references.
2. vacuum_delta on a published (txn-sourced) root spares txn-history
   files; reclaiming requires tightening EVERY log — and then works.
3. txn_log_cleanup is the txn tier's retention knob: commits at/below
   the newest checkpoint drop, the head commit and fold stay exact,
   below-horizon reads raise (never mis-read).
"""

import os

import pytest
from pyspark.sql import functions as F

from django_datastream_spark import txnlog as TL
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import iceberg as IB
from django_datastream_spark.sources import refsets as RS


def _df(spark, lo=0, hi=30):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") * 0.5).alias("val"),
        )
        .coalesce(1)
    )


def test_txn_vacuum_spares_sibling_metadata_planes(spark, tmp_path):
    """The latent sweep bug: Delta checkpoints, CDF exports and
    Iceberg position-delete exports are spec-named ``.parquet`` files
    a txn-side data walk used to see as orphans."""
    root = str(tmp_path / "t")
    TL.txn_append(spark, _df(spark), root, [])
    TL.txn_delete(spark, root, F.col("doc_id") % 5 == 0)
    DL.publish_delta(
        spark, root, checkpoint=True, change_data_feed=True
    )
    IB.publish_iceberg(spark, root)
    io_files_before = {
        rel
        for rel in __import__(
            "django_datastream_spark.sources.fileio",
            fromlist=["io_for"],
        ).io_for(root).walk_files(root)
        if rel.split(os.sep)[0]
        in ("_delta_log", "_change_data", "pub-deletes", "metadata")
    }
    assert any(
        r.startswith("_delta_log") and r.endswith(".parquet")
        for r in io_files_before
    ), "fixture must include a spec-named delta checkpoint parquet"
    removed = TL.txn_vacuum(root, retain_versions=0)
    assert not [
        r
        for r in removed
        if r.split(os.sep)[0]
        in ("_delta_log", "_change_data", "pub-deletes", "metadata")
    ]
    # both sibling planes still serve, hash-identically
    want = [i for i in range(30) if i % 5 != 0]
    assert sorted(
        r["doc_id"] for r in DL.read_delta(spark, root).collect()
    ) == want
    assert sorted(
        r["doc_id"] for r in IB.read_iceberg(spark, root).collect()
    ) == want


def test_cross_log_retention_contract(spark, tmp_path, monkeypatch):
    """vacuum_delta spares txn history; txn_vacuum spares delta
    history; after BOTH logs tighten retention the shared files
    reclaim — the full multi-log retention story on one root."""
    monkeypatch.setattr(TL, "CHECKPOINT_EVERY", 1)
    root = str(tmp_path / "t")
    TL.txn_append(spark, _df(spark, 0, 30), root, [])
    TL.txn_append(spark, _df(spark, 30, 60), root, [])
    _v, old_files = TL.snapshot(root, 2)
    TL.txn_optimize(spark, root, target_file_bytes=1 << 30)
    _v, new_files = TL.snapshot(root)
    superseded = sorted(old_files - new_files)
    assert superseded, "optimize must have rewritten the small files"
    DL.publish_delta(spark, root, checkpoint=True)

    # delta-side vacuum: txn history (v1/v2 + their checkpoints)
    # still references the superseded files -> spared
    DL.vacuum_delta(root, keep_versions=1)
    for rel in superseded:
        assert os.path.exists(os.path.join(root, rel)), rel
    # txn-side vacuum: the published delta log's commit history
    # references them too -> spared from this side as well
    TL.txn_vacuum(root, retain_versions=0)
    for rel in superseded:
        assert os.path.exists(os.path.join(root, rel)), rel
    # txn time travel across the full history is still exact
    assert len(TL.snapshot(root, 1)[1]) > 0

    # tighten EVERY log: delta checkpoint+cleanup, txn log cleanup
    DL.cleanup_delta_log(root)
    TL.txn_log_cleanup(root)
    removed = TL.txn_vacuum(root, retain_versions=0)
    assert set(superseded) <= set(removed)
    # both heads still serve the same 60 rows
    assert DL.read_delta(spark, root).count() == 60
    assert TL.txn_count(spark, root) == 60


def test_txn_log_cleanup_horizon(tmp_path, monkeypatch):
    """Metadata-only: commits at/below the newest checkpoint drop,
    head + fold stay exact, below-horizon reads RAISE."""
    monkeypatch.setattr(TL, "CHECKPOINT_EVERY", 5)
    root = str(tmp_path / "t")
    TL.init_table(root)
    for i in range(12):
        TL.commit(
            root, [f"f{i:02d}.parquet"], [], "append", [],
            base_version=i, stats={},
        )
    res = TL.txn_log_cleanup(root)
    assert res["checkpoint"] == 10
    assert res["removed_commits"] == 10  # v1..v10
    assert TL.latest_version(root) == 12
    _v, files = TL.snapshot(root)
    assert files == {f"f{i:02d}.parquet" for i in range(12)}
    with pytest.raises(FileNotFoundError):
        TL._read_commit(root, 3)
    with pytest.raises(FileNotFoundError):
        TL.snapshot(root, 3)  # below the horizon: raises, never lies
    assert TL.snapshot(root, 11)[1] == {
        f"f{i:02d}.parquet" for i in range(11)
    }


def test_txn_log_cleanup_keep_commits_window(tmp_path, monkeypatch):
    monkeypatch.setattr(TL, "CHECKPOINT_EVERY", 5)
    root = str(tmp_path / "t")
    TL.init_table(root)
    for i in range(12):
        TL.commit(
            root, [f"f{i:02d}.parquet"], [], "append", [],
            base_version=i, stats={},
        )
    TL.txn_log_cleanup(root, keep_commits=4)
    # floor = 12-4 = 8: v9..v12 stay for lagging incremental readers
    for v in (9, 10, 11, 12):
        assert TL._read_commit(root, v)["version"] == v
    with pytest.raises(FileNotFoundError):
        TL._read_commit(root, 8)
    assert TL.snapshot(root)[1] == {
        f"f{i:02d}.parquet" for i in range(12)
    }


def test_refsets_empty_on_single_log_roots(spark, tmp_path):
    """A pure txn root protects nothing for siblings (and vice
    versa) — the guard is free where only one log exists."""
    root = str(tmp_path / "t")
    TL.txn_append(spark, _df(spark), root, [])
    assert RS.delta_referenced(root) == set()
    assert RS.iceberg_referenced(root) == set()
    files, dirs = RS.sibling_referenced(root, exclude="txn")
    assert files == set() and dirs == set()
