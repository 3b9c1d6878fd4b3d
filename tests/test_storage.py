"""Storage-layer behavior: streams-log auto-compaction and seq plumbing
(SURVEY §1.3 / T4-T5 scale notes)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from django_datastream_spark.storage import Tables
from django_datastream_spark.streaming.ingest import _batch_seq_col

UTC = dt.timezone.utc


def _row(i: int) -> dict:
    return {
        "stream_id": "s1",
        "value_type": "numeric",
        "highest_granularity": "seconds",
        "value_downsamplers": ["mean"],
        "time_downsamplers": ["first"],
        "derived_from": None,
        "derive_op": None,
        "derive_args": None,
        "tags": "{}",
        "tags_flat": {},
        "earliest_ts": None,
        "latest_ts": dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=i),
        "downsampled_until": None,
    }


def test_streams_log_autocompacts_and_reads_stay_correct(spark, tmp_path):
    """100 single-row upserts must not leave 100 log files behind: the log
    auto-compacts past STREAMS_LOG_MAX_FILES, reads keep resolving the
    latest version, and the version history collapses to the live set."""
    t = Tables(spark, str(tmp_path / "store"))
    t.STREAMS_LOG_MAX_FILES = 12  # lower the knob so the test stays fast
    for i in range(40):
        t.upsert_streams([_row(i)])
    n_files = sum(
        1 for f in os.listdir(t.streams_path) if f.endswith(".parquet")
    )
    assert n_files <= t.STREAMS_LOG_MAX_FILES + 1
    live = t.read_streams().collect()
    assert len(live) == 1
    # latest upsert wins after however many compactions happened
    assert live[0]["latest_ts"] == dt.datetime(2024, 1, 1) + dt.timedelta(seconds=39)
    # log itself is bounded too (live rows + post-compaction appends)
    assert t.read_streams_log().count() <= t.STREAMS_LOG_MAX_FILES + 1


def test_batch_seq_assignment_is_not_single_partition(spark):
    """The per-batch seq window must partition by stream (parallel hash
    exchange), never a global single-partition sort."""
    rows = [
        ("s%d" % (i % 4), dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i))
        for i in range(16)
    ]
    df = spark.createDataFrame(rows, "stream_id string, ts timestamp")
    out = df.withColumn("seq", _batch_seq_col(1000))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(stream_id" in plan
    # per-stream seqs are unique and ts-ordered
    got = out.collect()
    by_stream: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r["stream_id"], r["ts"])):
        by_stream.setdefault(r["stream_id"], []).append(r["seq"])
    for seqs in by_stream.values():
        assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
