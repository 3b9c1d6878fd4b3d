"""Pins for the round-11 second self-review (conversion + retention).

1. txn_log_cleanup must NOT brick re-convert/re-publish: lineage
   checks and publish walks start at the fold horizon; released
   commits are skipped, not crashed on.
2. The retention guard fails CLOSED: an unreadable sibling tree
   aborts maintenance instead of silently protecting nothing.
3. optimize_delta is ALLOWED on a Delta-sourced conversion mirror
   (the _delta_log is the source; refresh tracks the rewrite) while
   optimize_iceberg on the same root is refused (derived view).
4. A foreign target tree coexisting with a pure mirror is refused
   (the stamp, not the mirror alone, attests the product).
5. convert_external_table's remediation for parquet registrations
   names the adopt path, not publish_* (which cannot work there).
6. Re-publish reuses content-stable manifests (no footer re-reads).
"""

import os

import pytest
from pyspark.sql import functions as F

from django_datastream_spark import txnlog as TL
from django_datastream_spark.sources import convert as CV
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import iceberg as IB
from tests.test_convert import _build_plain_delta, _ids
from tests.test_delta import _add, _write_data
from tests.test_iceberg import FIELDS, _data


def test_cleanup_then_reconvert_and_republish(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(TL, "CHECKPOINT_EVERY", 2)
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    CV.convert_delta_to_iceberg(spark, root)          # txn v1
    _write_data(root, "c.parquet", range(20, 23))
    DL.write_delta_commit(root, 2, [_add("c.parquet")])
    CV.convert_delta_to_iceberg(spark, root)          # txn v2 + cp
    res = TL.txn_log_cleanup(root)
    assert res["removed_commits"] >= 1
    assert TL.fold_horizon(root) == 2
    # the bricking repro: another source commit, convert again —
    # lineage + publish must tolerate the released commits
    _write_data(root, "d.parquet", range(30, 33))
    DL.write_delta_commit(root, 3, [_add("d.parquet")])
    r = CV.convert_delta_to_iceberg(spark, root)
    assert r["txn_version"] == 3
    assert _ids(IB.read_iceberg(spark, root)) == sorted(
        list(range(15)) + list(range(20, 23)) + list(range(30, 33))
    )
    # the published snapshot set shrank with txn retention: only
    # versions >= the horizon appear
    md = IB.iceberg_metadata(root)
    assert len(md["snapshots"]) == 2  # v2, v3


def test_fresh_publish_delta_below_horizon_fails_closed(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(TL, "CHECKPOINT_EVERY", 2)
    root = str(tmp_path / "t")
    df = spark.range(5).select(
        F.col("id").alias("doc_id"), (F.col("id") * 0.5).alias("val")
    )
    TL.txn_append(spark, df, root, [])
    TL.txn_append(spark, df, root, [])
    TL.txn_log_cleanup(root)
    assert TL.fold_horizon(root) == 2
    with pytest.raises(DL.DeltaUnsupportedError, match="contiguous"):
        DL.publish_delta(spark, root)


def test_refsets_fail_closed_on_unreadable_sibling(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    CV.convert_delta_to_iceberg(spark, root)
    # corrupt the sibling Iceberg tree's manifest list
    md = IB.iceberg_metadata(root)
    ml = os.path.join(root, md["snapshots"][0]["manifest-list"])
    with open(ml, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(Exception):
        DL.vacuum_delta(root, keep_versions=1)
    # nothing was deleted on the way down
    assert os.path.exists(os.path.join(root, "a.parquet"))


def test_optimize_allowed_on_source_log_of_mirror(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    CV.convert_delta_to_iceberg(spark, root)
    assert CV.mirror_source(root) == "delta"
    # source-side compaction is legitimate; the next conversion
    # refresh tracks the rewrite as a live-set diff
    res = DL.optimize_delta(spark, root, target_file_bytes=1 << 20)
    assert res["rewritten_files"] > 0
    r = CV.convert_delta_to_iceberg(spark, root)
    assert _ids(IB.read_iceberg(spark, root)) == list(range(15))
    assert r["txn_version"] == 2
    # the DERIVED iceberg view still refuses layout maintenance
    with pytest.raises(IB.IcebergUnsupportedError, match="DERIVED"):
        IB.optimize_iceberg(spark, root, target_file_bytes=1 << 20)


def test_foreign_target_tree_with_pure_mirror_refused(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    # adopt WITHOUT publishing (pure mirror, no stamped metadata)
    DL.adopt_delta(spark, root, root)
    # an external tool then creates a REAL iceberg table at the root
    _data(root, "data/Z.parquet", range(100, 103))
    IB.write_manifest(root, "mZ.avro", [(1, "data/Z.parquet")], 1)
    IB.write_manifest_list(root, "sZ.avro", ["mZ.avro"], 1)
    IB.write_metadata(
        root, 1, FIELDS,
        [{"snapshot-id": 1, "manifest-list": "metadata/sZ.avro"}],
        current_snapshot_id=1,
    )
    with pytest.raises(ValueError, match="foreign"):
        CV.convert_delta_to_iceberg(spark, root)


def test_parquet_registration_remediation(spark, tmp_path):
    from django_datastream_spark import exceptions as exc
    from django_datastream_spark.api import Datastream

    ds = Datastream(spark, str(tmp_path / "store"))
    proot = str(tmp_path / "p")
    spark.range(3).select(
        F.col("id").alias("doc_id")
    ).write.parquet(proot)
    ds.register_external_table("p", proot)
    with pytest.raises(exc.DatastreamError, match="adopt"):
        ds.convert_external_table("p", "iceberg")


def test_republish_reuses_content_stable_manifests(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    CV.convert_delta_to_iceberg(spark, root)
    m1 = os.path.join(root, "metadata", "pub-added-1.avro")
    before = (os.path.getmtime(m1), os.path.getsize(m1))
    _write_data(root, "c.parquet", range(20, 23))
    DL.write_delta_commit(root, 2, [_add("c.parquet")])
    CV.convert_delta_to_iceberg(spark, root)
    after = (os.path.getmtime(m1), os.path.getsize(m1))
    assert before == after  # not rewritten on republish
    assert os.path.exists(
        os.path.join(root, "metadata", "pub-added-2.avro")
    )


def test_commit_timestamps_monotonized_under_clock_ties(tmp_path):
    """Delta's timestamp rule: commits landing within one clock tick
    (shared mtime) still resolve in a TOTAL order — the flake class
    the full-suite run surfaced (startingTimestamp resolving to the
    wrong commit under load)."""
    root = str(tmp_path / "t")
    _build_plain_delta(root)
    # force ALL commit files onto one clock tick
    log = os.path.join(root, "_delta_log")
    t = os.path.getmtime(os.path.join(log, f"{0:020d}.json"))
    for v in (0, 1):
        os.utime(os.path.join(log, f"{v:020d}.json"), (t, t))
    ts0 = DL._commit_timestamp_ms(root, 0)
    ts1 = DL._commit_timestamp_ms(root, 1)
    assert ts1 == ts0 + 1  # monotonized, not equal
    # version-at resolution is deterministic at the boundary
    assert DL.delta_version_at(root, ts0) == 0
    assert DL.delta_version_at(root, ts1) == 1
