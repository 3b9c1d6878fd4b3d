"""Pins for the round-11 self-review findings (the post-build
adversarial pass over the write-seam + keyset-pagination diff).

1. stream_datapoints cursors carry FULL-precision boundaries —
   sub-second datapoints page exactly-once (the _iso() second
   truncation re-served or skipped rows at page edges).
2. table_rows offset pages sort key-columns-first, so the
   next_cursor they hand out is consistent with cursor pages even
   when non-key orderable columns (arrays) exist.
3. PyArrowFileIO.put_atomic lands complete bytes via tmp+move —
   never an in-place truncate a concurrent reader could tear.
4. delete_rel_files on a FileIO root prunes ONLY deleted files'
   ancestor dirs, never unrelated (possibly mid-write) empty dirs.
5. _cmp_pair normalizes the temporal separator only when BOTH sides
   are temporal-shaped — ordinary string-column stats never get
   rewritten into a non-conservative prune.
6. Cross-endpoint cursors fail as ValueError('malformed cursor'),
   not a KeyError.
7. remove_orphan_files keeps "removed" = data files; swept staging
   debris reports under "staging_dirs".
"""

import datetime as dt
import json
import os

import pytest

from django_datastream_spark import http_api, txnlog as TL
from django_datastream_spark.api import Datastream
from django_datastream_spark.operators.merge import delete_rel_files
from django_datastream_spark.sources import delta as DL
from django_datastream_spark.sources import fileio as FIO
from django_datastream_spark.sources import iceberg as IB


def test_stream_cursor_subsecond_pages_exactly_once(spark, tmp_path):
    ds = Datastream(spark, str(tmp_path / "store"))
    sid = ds.ensure_stream({"name": "subsec"})
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    # 25 datapoints 100 ms apart — whole pages share one second
    ds.append_multiple(
        [
            {
                "stream_id": sid,
                "value": float(i),
                "timestamp": t0 + dt.timedelta(milliseconds=100 * i),
            }
            for i in range(25)
        ]
    )
    got = []
    cursor = None
    pages = 0
    while True:
        p = {"cursor": cursor} if cursor else {}
        page = http_api.stream_datapoints(ds, sid, params=p, limit=10)
        got.extend(d["v"] for d in page["datapoints"])
        cursor = page["meta"]["next_cursor"]
        pages += 1
        assert pages < 10  # a second-truncated cursor LIVELOCKS here
        if not cursor or not page["datapoints"]:
            break
    assert got == [float(i) for i in range(25)]


def test_table_cursor_consistent_with_array_columns(spark, tmp_path):
    """Schema with a non-key orderable column (array): the offset
    page's next_cursor must continue EXACTLY where page 1 ended."""
    root = str(tmp_path / "arr")
    TL.txn_append(
        spark,
        spark.createDataFrame(
            [([i % 7, i % 3], i) for i in range(300)],
            "tags array<int>, id long",
        ),
        root,
        [],
    )
    DL.publish_delta(spark, root)
    ds = Datastream(spark, str(tmp_path / "store"))
    ds.register_external_table("arr", root)
    p1 = http_api.table_rows(ds, "arr", limit=100, offset=0)
    by_cursor = http_api.table_rows(
        ds, "arr", params={"cursor": p1["meta"]["next_cursor"]}, limit=100
    )
    by_offset = http_api.table_rows(ds, "arr", limit=100, offset=100)
    assert by_cursor["objects"] == by_offset["objects"]
    # and full cursor paging is exactly-once
    seen, cursor = [], None
    while True:
        page = http_api.table_rows(
            ds, "arr",
            params={"cursor": cursor} if cursor else None, limit=100,
        )
        seen.extend(o["id"] for o in page["objects"])
        cursor = page["meta"]["next_cursor"]
        if not cursor or not page["objects"]:
            break
    assert sorted(seen) == list(range(300))
    assert len(seen) == len(set(seen))


def test_cross_endpoint_cursor_is_malformed(spark, tmp_path):
    ds = Datastream(spark, str(tmp_path / "store"))
    sid = ds.ensure_stream({"name": "x"})
    table_cursor = http_api._encode_cursor({"k": {"id": 1}})
    with pytest.raises(ValueError, match="malformed cursor"):
        http_api.stream_datapoints(
            ds, sid, params={"cursor": table_cursor}, limit=10
        )


def test_pyarrow_put_atomic_never_truncates_in_place(tmp_path):
    io = FIO.PyArrowFileIO()
    p = str(tmp_path / "meta" / "version-hint.text")
    io.put_atomic(p, b"1")
    io.put_atomic(p, b"22")
    assert io.read_bytes(p) == b"22"
    # the complete-then-move protocol leaves no tmp residue
    assert os.listdir(str(tmp_path / "meta")) == ["version-hint.text"]


def test_delete_rel_files_spares_unrelated_empty_dirs(tmp_path):
    scheme = f"rvw{os.getpid()}"
    backing = str(tmp_path / "bucket")
    store = FIO.FakeObjectStore(scheme, backing)
    FIO.register_fileio(scheme, store)
    try:
        root = f"{scheme}://t"
        store.put_bytes(f"{root}/p=1/a.parquet", b"x")
        # a concurrent writer's momentarily-EMPTY staging dir
        os.makedirs(os.path.join(backing, "t/.staging-live/_temporary/0"))
        removed = delete_rel_files(root, ["p=1/a.parquet"])
        assert removed == ["p=1/a.parquet"]
        # the deleted file's own hive dir is pruned...
        assert not os.path.isdir(os.path.join(backing, "t/p=1"))
        # ...but the unrelated empty staging tree SURVIVES
        assert os.path.isdir(
            os.path.join(backing, "t/.staging-live/_temporary/0")
        )
    finally:
        FIO.unregister_fileio(scheme)


def test_cmp_pair_guard_only_when_both_temporal():
    # ordinary string column: max '2024-01-02A99' > lo '2024-01-02 10'
    # in true string order — the file must be KEPT (one-sided
    # normalization would have rewritten lo to 'T' form and pruned)
    stats = json.dumps({
        "minValues": {"s": "2024-01-02A00"},
        "maxValues": {"s": "2024-01-02A99"},
    })
    assert DL._may_match(
        {}, stats, {"s": ("2024-01-02 10", None)}, set()
    )
    # both-temporal normalization still prunes correctly
    stats_t = json.dumps({
        "minValues": {"ts": "2024-01-05 01:00:00"},
        "maxValues": {"ts": "2024-01-05 23:00:00"},
    })
    assert not DL._may_match(
        {}, stats_t, {"ts": ("2024-01-06T00:00:00", None)}, set()
    )


def test_orphan_counter_separates_staging(spark, tmp_path):
    root = str(tmp_path / "ice")
    sink = IB.iceberg_streaming_sink(root, "app")
    sink(
        spark.createDataFrame(
            [(1, 1.0)], "k long, v double"
        ).coalesce(1),
        0,
    )
    # one orphan data file + one stale staging dir
    with open(os.path.join(root, "data", "orphan.parquet"), "wb") as f:
        f.write(b"junk")
    os.makedirs(os.path.join(root, "_staging_dead"))
    with open(
        os.path.join(root, "_staging_dead", "part.parquet"), "wb"
    ) as f:
        f.write(b"junk")
    res = IB.remove_orphan_files(root, staging_grace_s=0)
    assert res["removed"] == 1  # data files only
    assert res["staging_dirs"] == 1
