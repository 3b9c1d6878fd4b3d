"""Generic partition-scoped MERGE INTO (operators/merge.py): update /
delete / insert semantics, and the touched-volume guarantee that
partitions without matched keys are never rewritten."""

from __future__ import annotations
import pytest

import os

from django_datastream_spark.operators.merge import merge_into


def _write_target(spark, path):
    spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0),
            (2, "2024-01-01", 20.0),
            (3, "2024-01-02", 30.0),
            (4, "2024-01-03", 40.0),
        ],
        "k long, p string, v double",
    ).write.partitionBy("p").parquet(path)


def _read(spark, path):
    # partition-dir values type-infer to DATE on read-back; normalize
    return {
        r["k"]: (str(r["p"]), r["v"])
        for r in spark.read.parquet(path).collect()
    }


def _part_files(path, p):
    d = os.path.join(path, f"p={p}")
    return sorted(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )


def test_merge_update_and_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    before_untouched = _part_files(path, "2024-01-02")

    src = spark.createDataFrame(
        [
            (2, "2024-01-01", 99.0),   # matched -> update
            (5, "2024-01-01", 50.0),   # new key, existing partition
            (6, "2024-01-04", 60.0),   # new key, new partition
        ],
        "k long, p string, v double",
    )
    stats = merge_into(
        spark, path, src, key_cols=["k"], partition_cols=["p"]
    )
    assert stats["rewritten_files"] >= 1 and stats["inserted"]
    got = _read(spark, path)
    assert got == {
        1: ("2024-01-01", 10.0),
        2: ("2024-01-01", 99.0),
        3: ("2024-01-02", 30.0),
        4: ("2024-01-03", 40.0),
        5: ("2024-01-01", 50.0),
        6: ("2024-01-04", 60.0),
    }
    # the partition with no matched key was not rewritten
    assert _part_files(path, "2024-01-02") == before_untouched


def test_merge_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    src = spark.createDataFrame(
        [
            (3, "2024-01-02", 0.0),    # matched -> delete
            (7, "2024-01-02", 70.0),   # unmatched -> insert (not
                                       # resurrected by the delete)
        ],
        "k long, p string, v double",
    )
    stats = merge_into(
        spark,
        path,
        src,
        key_cols=["k"],
        partition_cols=["p"],
        when_matched="delete",
    )
    assert stats["rewritten_files"] >= 1
    got = _read(spark, path)
    assert 3 not in got
    assert got[7] == ("2024-01-02", 70.0)
    assert set(got) == {1, 2, 4, 7}


def test_merge_matched_only_ignore_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    src = spark.createDataFrame(
        [(1, "2024-01-01", 11.0), (8, "2024-01-09", 80.0)],
        "k long, p string, v double",
    )
    merge_into(
        spark,
        path,
        src,
        key_cols=["k"],
        partition_cols=["p"],
        when_not_matched="ignore",
    )
    got = _read(spark, path)
    assert got[1] == ("2024-01-01", 11.0)
    assert 8 not in got


def test_merge_into_fresh_table(spark, tmp_path):
    path = str(tmp_path / "t")
    src = spark.createDataFrame(
        [(1, "2024-01-01", 1.0)], "k long, p string, v double"
    )
    stats = merge_into(
        spark, path, src, key_cols=["k"], partition_cols=["p"]
    )
    assert stats == {"rewritten_files": 0, "inserted": True}
    assert _read(spark, path) == {1: ("2024-01-01", 1.0)}


def test_merge_idempotent_replay(spark, tmp_path):
    """Replaying the same CDC batch is a no-op on row content — the
    at-least-once delivery property foreachBatch sinks rely on."""
    path = str(tmp_path / "t")
    _write_target(spark, path)
    src = spark.createDataFrame(
        [(2, "2024-01-01", 99.0), (6, "2024-01-04", 60.0)],
        "k long, p string, v double",
    )
    for _ in range(2):
        merge_into(
            spark, path, src, key_cols=["k"], partition_cols=["p"]
        )
    got = _read(spark, path)
    assert got[2] == ("2024-01-01", 99.0)
    assert got[6] == ("2024-01-04", 60.0)
    assert len(got) == 5


def test_merge_delete_vacates_whole_partition(spark, tmp_path):
    """A delete-only merge that removes a partition's LAST row must
    clear the partition — the case dynamic partition overwrite cannot
    express (nothing is written for an emptied partition)."""
    path = str(tmp_path / "t")
    _write_target(spark, path)
    src = spark.createDataFrame(
        [(4, "2024-01-03", 0.0)], "k long, p string, v double"
    )
    merge_into(
        spark,
        path,
        src,
        key_cols=["k"],
        partition_cols=["p"],
        when_matched="delete",
        when_not_matched="ignore",
    )
    got = _read(spark, path)
    assert set(got) == {1, 2, 3}
    assert not os.path.isdir(os.path.join(path, "p=2024-01-03"))


def test_merge_applies_cdc_stream_foreachbatch(spark, tmp_path):
    """The streaming CDC-apply loop: a changelog stream drained via
    foreachBatch + merge_into must leave the table at last-writer-wins
    state — the standard 'apply Debezium feed to a lakehouse table'
    topology, here on vanilla parquet."""
    import json as _json
    import os as _os

    src = str(tmp_path / "cdc")
    path = str(tmp_path / "t")
    _os.makedirs(src)

    batches = [
        [
            {"k": 1, "p": "2024-01-01", "v": 1.0, "op": "upsert"},
            {"k": 2, "p": "2024-01-01", "v": 2.0, "op": "upsert"},
        ],
        [
            {"k": 1, "p": "2024-01-01", "v": 10.0, "op": "upsert"},
            {"k": 3, "p": "2024-01-02", "v": 3.0, "op": "upsert"},
        ],
        [
            {"k": 2, "p": "2024-01-01", "v": 0.0, "op": "delete"},
            {"k": 4, "p": "2024-01-02", "v": 4.0, "op": "upsert"},
        ],
    ]

    def apply_batch(bdf, _bid):
        ups = bdf.filter(bdf.op == "upsert").drop("op")
        dels = bdf.filter(bdf.op == "delete").drop("op")
        if ups.take(1):
            merge_into(
                bdf.sparkSession, path, ups,
                key_cols=["k"], partition_cols=["p"],
            )
        if dels.take(1):
            merge_into(
                bdf.sparkSession, path, dels,
                key_cols=["k"], partition_cols=["p"],
                when_matched="delete", when_not_matched="ignore",
            )

    for i, rows in enumerate(batches):
        with open(f"{src}/b{i}.jsonl", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        stream = spark.readStream.schema(
            "k long, p string, v double, op string"
        ).json(src)
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option(
                "checkpointLocation", str(tmp_path / "ck")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    got = _read(spark, path)
    assert got == {
        1: ("2024-01-01", 10.0),
        3: ("2024-01-02", 3.0),
        4: ("2024-01-02", 4.0),
    }


def test_merge_validation_errors(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_target(spark, path)
    ok = spark.createDataFrame(
        [(1, "2024-01-01", 1.0)], "k long, p string, v double"
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="when_matched"):
        merge_into(spark, path, ok, ["k"], ["p"], when_matched="upsert")
    with _pt.raises(ValueError, match="multiple rows"):
        dup = spark.createDataFrame(
            [(1, "2024-01-01", 1.0), (1, "2024-01-01", 2.0)],
            "k long, p string, v double",
        )
        merge_into(spark, path, dup, ["k"], ["p"])
    with _pt.raises(ValueError, match="missing target columns"):
        narrow = spark.createDataFrame(
            [(1, "2024-01-01")], "k long, p string"
        )
        merge_into(spark, path, narrow, ["k"], ["p"])


def test_merge_preserves_target_only_rows_full_schema(spark, tmp_path):
    """Rewriting a conflict file must not lose kept rows' columns or
    values — the target schema is authoritative and the source is
    projected onto it."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "2024-01-01", 10.0, "keepme"), (2, "2024-01-01", 20.0, "x")],
        "k long, p string, v double, extra string",
    ).write.partitionBy("p").parquet(path)
    src = spark.createDataFrame(
        [(2, "2024-01-01", 99.0, "y")],
        "k long, p string, v double, extra string",
    )
    merge_into(spark, path, src, ["k"], ["p"])
    got = {
        r["k"]: (r["v"], r["extra"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {1: (10.0, "keepme"), 2: (99.0, "y")}


@pytest.mark.slow
def test_merge_model_based_random_sequences(spark, tmp_path):
    """Model-based check: random CDC batch sequences applied through
    merge_into must leave the table exactly at the state of a trivial
    in-memory dict model (upsert = dict[k] = row; delete = pop).
    Catches interaction bugs (update-then-delete-then-reinsert, fresh
    partitions appearing and vacating) that single-scenario tests
    miss."""
    import random

    rng = random.Random(0xD00D)
    parts = ["2024-01-01", "2024-01-02", "2024-01-03"]
    # partition-stable key→partition mapping (the documented invariant)
    part_of = {k: parts[k % 3] for k in range(12)}

    for trial in range(3):
        path = str(tmp_path / f"t{trial}")
        model: dict[int, float] = {}
        for step in range(4):
            keys = rng.sample(range(12), rng.randint(1, 5))
            op = rng.choice(["upsert", "delete"])
            rows = [
                (k, part_of[k], float(100 * trial + 10 * step + k))
                for k in keys
            ]
            src = spark.createDataFrame(
                rows, "k long, p string, v double"
            )
            if op == "upsert":
                merge_into(spark, path, src, ["k"], ["p"])
                for k, _p, v in rows:
                    model[k] = v
            else:
                merge_into(
                    spark, path, src, ["k"], ["p"],
                    when_matched="delete", when_not_matched="ignore",
                )
                for k, _p, _v in rows:
                    model.pop(k, None)
        try:
            got = {
                r["k"]: r["v"]
                for r in spark.read.parquet(path).collect()
            }
        except Exception:
            got = {}  # table never created (all-delete sequence)
        assert got == model, f"trial={trial} diverged from model"


# ---------------------------------------------------------------------------
# manifest commit: crash-consistency (exactly-once) contract
# ---------------------------------------------------------------------------
from django_datastream_spark.operators import merge as merge_mod
from django_datastream_spark.operators.merge import (
    read_committed,
    read_manifest,
    vacuum_uncommitted,
)


def _committed(spark, path):
    return {
        r["k"]: (str(r["p"]), r["v"])
        for r in read_committed(spark, path).collect()
    }


def _established(spark, tmp_path):
    """Target with a committed manifest (first merge bootstraps it)."""
    path = str(tmp_path / "t")
    _write_target(spark, path)
    merge_into(
        spark, path,
        spark.createDataFrame([(2, "2024-01-01", 20.0)],
                              "k long, p string, v double"),
        ["k"], ["p"],
    )
    assert read_manifest(path) is not None
    return path


def test_merge_crash_before_commit_is_invisible(spark, tmp_path, monkeypatch):
    """Kill the merge between the append and the manifest swap: the
    committed read must still be the EXACT pre-merge table (no dupes,
    no partial update), vacuum reclaims the orphans, and a clean
    re-run of the same merge then lands exactly-once."""
    path = _established(spark, tmp_path)
    before = _committed(spark, path)
    src = spark.createDataFrame(
        [(2, "2024-01-01", 99.0), (8, "2024-01-01", 80.0)],
        "k long, p string, v double",
    )

    def boom(*a, **k):
        raise RuntimeError("injected crash before manifest swap")

    monkeypatch.setattr(merge_mod, "_write_manifest", boom)
    try:
        merge_into(spark, path, src, ["k"], ["p"])
        raise AssertionError("crash injection did not fire")
    except RuntimeError:
        pass
    # committed snapshot: unchanged, exactly-once
    assert _committed(spark, path) == before
    # the crash window left orphans a PLAIN read would double-count
    plain = spark.read.parquet(path).count()
    assert plain > len(before)
    # recovery: vacuum converges the directory back to the commit
    removed = vacuum_uncommitted(path)
    assert removed
    assert {
        r["k"]: (str(r["p"]), r["v"])
        for r in spark.read.parquet(path).collect()
    } == before
    # retry is clean
    monkeypatch.undo()
    merge_into(spark, path, src, ["k"], ["p"])
    after = _committed(spark, path)
    assert after[2] == ("2024-01-01", 99.0) and after[8] == ("2024-01-01", 80.0)
    assert len(after) == len(before) + 1


def test_merge_retry_without_vacuum_stays_exactly_once(
    spark, tmp_path, monkeypatch
):
    """A crashed merge re-run WITHOUT vacuuming first must not read
    (or re-emit) the crash orphans: the merge plans against the
    committed file set, not the raw listing."""
    path = _established(spark, tmp_path)
    before = _committed(spark, path)
    src = spark.createDataFrame(
        [(1, "2024-01-01", 11.0)], "k long, p string, v double"
    )
    monkeypatch.setattr(
        merge_mod, "_write_manifest",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    try:
        merge_into(spark, path, src, ["k"], ["p"])
    except RuntimeError:
        pass
    monkeypatch.undo()
    merge_into(spark, path, src, ["k"], ["p"])
    after = _committed(spark, path)
    assert after == {**before, 1: ("2024-01-01", 11.0)}
    # committed read is exactly-once even though pre-retry orphans may
    # still sit on disk; vacuum then reconciles the plain read too
    vacuum_uncommitted(path)
    assert {
        r["k"]: (str(r["p"]), r["v"])
        for r in spark.read.parquet(path).collect()
    } == after


def test_merge_crash_after_commit_keeps_new_state(
    spark, tmp_path, monkeypatch
):
    """Kill the merge after the manifest swap but before the conflict
    delete: the committed read is the POST-merge table exactly-once
    (the swap is the commit point); vacuum reclaims the superseded
    files."""
    path = _established(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "2024-01-01", 77.0)], "k long, p string, v double"
    )

    def boom(*a, **k):
        raise RuntimeError("injected crash before conflict delete")

    monkeypatch.setattr(merge_mod, "_delete_file", boom)
    try:
        merge_into(spark, path, src, ["k"], ["p"])
        raise AssertionError("crash injection did not fire")
    except RuntimeError:
        pass
    after = _committed(spark, path)
    assert after[2] == ("2024-01-01", 77.0)
    assert sorted(after) == [1, 2, 3, 4]
    # plain read still sees the stale conflict-file copy of k=2
    assert spark.read.parquet(path).count() > len(after)
    removed = vacuum_uncommitted(path)
    assert removed
    assert {
        r["k"]: (str(r["p"]), r["v"])
        for r in spark.read.parquet(path).collect()
    } == after


def test_merge_defer_conflict_delete_isolates_readers(spark, tmp_path):
    """defer_conflict_delete=True: superseded files stay on disk (so a
    reader planned against the previous commit never loses a file
    mid-job) but are invisible to committed readers; an explicit
    vacuum reclaims them."""
    path = _established(spark, tmp_path)
    files_before = set(merge_mod._list_data_files(path))
    src = spark.createDataFrame(
        [(3, "2024-01-02", 33.0)], "k long, p string, v double"
    )
    stats = merge_into(
        spark, path, src, ["k"], ["p"], defer_conflict_delete=True
    )
    assert stats["rewritten_files"] >= 1
    # every pre-merge file is still present (no reader raced)
    assert files_before <= set(merge_mod._list_data_files(path))
    after = _committed(spark, path)
    assert after[3] == ("2024-01-02", 33.0)
    assert sorted(after) == [1, 2, 3, 4]
    removed = vacuum_uncommitted(path)
    assert removed
    assert {
        r["k"]: (str(r["p"]), r["v"])
        for r in spark.read.parquet(path).collect()
    } == after


def test_merge_all_deleted_then_reinsert_via_manifest(spark, tmp_path):
    """Delete every committed row, then merge again: the empty
    committed state is honored (re-insert path), and read_committed
    needs an explicit schema only while the table is empty."""
    path = str(tmp_path / "t")
    src0 = spark.createDataFrame(
        [(1, "2024-01-01", 1.0)], "k long, p string, v double"
    )
    merge_into(spark, path, src0, ["k"], ["p"])
    merge_into(
        spark, path, src0, ["k"], ["p"],
        when_matched="delete", when_not_matched="ignore",
    )
    assert read_manifest(path)["files"] == []
    assert read_committed(spark, path, "k long, p string, v double").count() == 0
    merge_into(spark, path, src0, ["k"], ["p"])
    assert _committed(spark, path) == {1: ("2024-01-01", 1.0)}
