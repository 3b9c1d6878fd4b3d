"""Streaming ingest + windowed downsample behavior (SURVEY §2.8 T1/T3).

Uses the file source with Trigger.AvailableNow so each test is a
deterministic, bounded run.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from django_datastream_spark.api import Datastream
from django_datastream_spark.streaming.ingest import (
    StreamingIngest,
    parse_json_payload,
    streaming_downsample,
)

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 6, 1, tzinfo=UTC)


def iso(i: int) -> str:
    return (T0 + dt.timedelta(seconds=i)).strftime("%Y-%m-%dT%H:%M:%S.000Z")


def write_jsonl(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_ingest_validates_and_lands(spark, tmp_path):
    engine = Datastream(spark, str(tmp_path / "store"))
    sid = engine.ensure_stream({"title": "s"})
    src = str(tmp_path / "incoming")
    ing = StreamingIngest(engine, src, str(tmp_path / "cp"))

    write_jsonl(
        f"{src}/b0.json",
        [
            {"stream_id": sid, "ts": iso(0), "value": 1.0},
            {"stream_id": sid, "ts": iso(1), "value": 2.0},
            {"stream_id": sid, "ts": iso(1), "value": 99.0},  # dup ts → reject
            {"stream_id": "nope", "ts": iso(2), "value": 3.0},  # unknown → reject
        ],
    )
    ing.run_available()

    pts = list(engine.get_data(sid, "seconds"))
    assert [p["v"] for p in pts] == [1.0, 2.0]
    rejects = spark.read.parquet(ing.rejects_path)
    assert rejects.count() == 2

    # second batch: replay of an old timestamp is rejected against the
    # persisted latest_ts (T1 across micro-batches)
    write_jsonl(
        f"{src}/b1.json",
        [
            {"stream_id": sid, "ts": iso(1), "value": 50.0},  # ≤ latest → reject
            {"stream_id": sid, "ts": iso(5), "value": 5.0},
        ],
    )
    ing.run_available()
    pts = list(engine.get_data(sid, "seconds"))
    assert [p["v"] for p in pts] == [1.0, 2.0, 5.0]
    assert spark.read.parquet(ing.rejects_path).count() == 3
    meta = engine.find_streams({"title": "s"})[0]
    assert meta["latest_ts"].replace(tzinfo=UTC) == T0 + dt.timedelta(seconds=5)


@pytest.mark.slow
def test_auto_downsample_materializes_completed_buckets(spark, tmp_path):
    engine = Datastream(spark, str(tmp_path / "store"))
    sid = engine.ensure_stream({"title": "auto"})
    src = str(tmp_path / "in")
    ing = StreamingIngest(engine, src, str(tmp_path / "cp"), auto_downsample=True)
    write_jsonl(
        f"{src}/b0.json",
        [
            {"stream_id": sid, "ts": iso(i), "value": float(i)}
            for i in range(0, 70, 5)  # spans minute 0 fully, minute 1 partially
        ],
    )
    ing.run_available()
    pts = list(engine.get_data(sid, "minutes"))
    assert len(pts) == 1  # only the completed minute materialized
    assert pts[0]["v"]["count"] == 12 and pts[0]["v"]["sum"] == sum(range(0, 60, 5))
    # next batch completes minute 1
    write_jsonl(
        f"{src}/b1.json",
        [{"stream_id": sid, "ts": iso(125), "value": 1.0}],
    )
    ing.run_available()
    pts = list(engine.get_data(sid, "minutes"))
    assert len(pts) == 2
    assert pts[1]["v"]["count"] == 2  # points at 60 and 65


@pytest.mark.slow
def test_incremental_derive_equals_batch_recompute(spark, tmp_path):
    """FIXTURES B3.4: lag-family derived streams materialized batch-by-batch
    through the streaming path must equal a full batch recompute."""
    engine = Datastream(spark, str(tmp_path / "store"))
    src = engine.ensure_stream({"title": "cnt"})
    d_der = engine.ensure_stream(
        {"title": "der"}, derive_from=[src], derive_op="derivative"
    )
    d_rst = engine.ensure_stream(
        {"title": "rst"}, derive_from=[src], derive_op="counter_reset"
    )
    d_cd = engine.ensure_stream(
        {"title": "cd"},
        derive_from=[src],
        derive_op="counter_derivative",
        derive_args={"max_value": 1000},
    )
    vals = [0, 100, 300, 900, 50, 400, 990, 20, 500, 700]
    srcdir = str(tmp_path / "in")
    ing = StreamingIngest(engine, srcdir, str(tmp_path / "cp"))
    # three micro-batches with awkward split points (wrap spans batches)
    for bi, chunk in enumerate([vals[:3], vals[3:5], vals[5:]]):
        off = sum(len(c) for c in [vals[:3], vals[3:5]][:bi])
        write_jsonl(
            f"{srcdir}/b{bi}.json",
            [
                {"stream_id": src, "ts": iso((off + i) * 10), "value": float(v)}
                for i, v in enumerate(chunk)
            ],
        )
        ing.run_available()

    # materialized incrementally
    got = {
        name: [(p["t"], p["v"]) for p in engine.get_data(sid, "seconds")]
        for name, sid in [("der", d_der), ("rst", d_rst), ("cd", d_cd)]
    }
    # batch recompute over the full source history
    full = engine.backprocess_streams()
    batch = {
        sid: sorted(
            (r["ts"], r["value"])
            for r in full.filter(full.stream_id == sid).collect()
        )
        for sid in (d_der, d_rst, d_cd)
    }
    assert got["der"] == [(t, pytest.approx(v)) for t, v in batch[d_der]]
    assert got["rst"] == [(t, pytest.approx(v)) for t, v in batch[d_rst]]
    assert got["cd"] == [(t, pytest.approx(v)) for t, v in batch[d_cd]]
    # sanity: derivative has one point per source point minus the first
    assert len(got["der"]) == len(vals) - 1


@pytest.mark.slow
def test_incremental_sum_equals_batch_and_aggs_follow(spark, tmp_path):
    """`sum`-derived streams materialized through the streaming path must
    equal a full batch recompute even when a lagging source updates slots
    that a faster source already pushed past — and the downsampled
    points_agg buckets must follow the corrected slots (a sum slot is
    final only once EVERY source has passed it)."""
    engine = Datastream(spark, str(tmp_path / "store"))
    a = engine.ensure_stream({"title": "srcA"})
    b = engine.ensure_stream({"title": "srcB"})
    s = engine.ensure_stream(
        {"title": "sum"},
        derive_from=[a, b],
        derive_op="sum",
        highest_granularity="seconds10",
    )
    srcdir = str(tmp_path / "in")
    ing = StreamingIngest(engine, srcdir, str(tmp_path / "cp"), auto_downsample=True)

    # b0: a races ahead past the minute boundary; b sits in slot 0
    write_jsonl(
        f"{srcdir}/b0.json",
        [{"stream_id": a, "ts": iso(t), "value": float(t)} for t in range(0, 71, 10)]
        + [{"stream_id": b, "ts": iso(5), "value": 100.0}],
    )
    ing.run_available()
    # b1: b lags into slot [10,20) — a slot the fast source already passed,
    # inside a minute bucket the OLD watermark logic would have finalized
    write_jsonl(
        f"{srcdir}/b1.json",
        [{"stream_id": b, "ts": iso(15), "value": 200.0}],
    )
    ing.run_available()
    # b2: both sources move on
    write_jsonl(
        f"{srcdir}/b2.json",
        [
            {"stream_id": a, "ts": iso(80), "value": 80.0},
            {"stream_id": b, "ts": iso(65), "value": 300.0},
            {"stream_id": b, "ts": iso(130), "value": 1.0},
            {"stream_id": a, "ts": iso(130), "value": 1.0},
        ],
    )
    ing.run_available()

    # expected slot sums (seconds10 rounding) over ALL final source points
    src_pts = [(t, float(t)) for t in range(0, 71, 10)] + [(80, 80.0), (130, 1.0)]
    src_pts += [(5, 100.0), (15, 200.0), (65, 300.0), (130, 1.0)]
    expected: dict[int, float] = {}
    for t, v in src_pts:
        expected[t // 10 * 10] = expected.get(t // 10 * 10, 0.0) + v

    got = {
        int((p["t"].replace(tzinfo=UTC) - T0).total_seconds()): p["v"]
        for p in engine.get_data(s, "seconds10")
    }
    assert got == {k: pytest.approx(v) for k, v in expected.items()}

    # incremental materialization == batch recompute (FIXTURES B3.4)
    full = engine.backprocess_streams({"title": "sum"})
    batch = {
        int((r["ts"] - T0.replace(tzinfo=None)).total_seconds()): r["value"]
        for r in full.collect()
    }
    assert batch == {k: pytest.approx(v) for k, v in expected.items()}

    # points_agg minute buckets track the corrected slots: minute 0 must
    # include the lagging b-point that landed after a's clock passed it
    agg = {
        int((r["bucket_ts"] - T0.replace(tzinfo=None)).total_seconds()): r
        for r in engine.tables.read_points_agg()
        .filter((F.col("stream_id") == s) & (F.col("granularity") == "minutes"))
        .collect()
    }
    min0 = {k: v for k, v in expected.items() if k < 60}
    assert agg[0]["v"]["sum"] == pytest.approx(sum(min0.values()))
    assert agg[0]["v"]["count"] == len(min0)
    # exactly one stored row per bucket (upserts, not duplicate appends)
    dup = (
        engine.tables.read_points_agg()
        .filter(F.col("stream_id") == s)
        .groupBy("granularity", "bucket_ts")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup.count() == 0


def test_ingest_attach_runs_against_non_file_source(spark, tmp_path):
    """The foreachBatch pipeline is source-agnostic: drive it end-to-end
    from a rate-micro-batch stream (no files anywhere) through the same
    attach() entry point a Kafka source would use."""
    engine = Datastream(spark, str(tmp_path / "store"))
    sid = engine.ensure_stream({"title": "ratefed"})
    ing = StreamingIngest(engine, str(tmp_path / "in"), str(tmp_path / "cp"))
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 20)
        .option("numPartitions", 2)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )
    shaped = src.select(
        F.lit(sid).alias("stream_id"),
        (F.to_timestamp(F.lit(T0.replace(tzinfo=None))) + F.make_interval(
            secs=F.col("value").cast("double")
        )).alias("ts"),
        (F.col("value") * 10.0).alias("value"),
        F.lit(None).cast("string").alias("value_nominal"),
    )
    ing.attach(shaped).awaitTermination()
    pts = list(engine.get_data(sid, "seconds"))
    assert [p["v"] for p in pts] == [10.0 * i for i in range(20)]
    meta = engine.find_streams({"title": "ratefed"})[0]
    assert meta["latest_ts"].replace(tzinfo=UTC) == T0 + dt.timedelta(seconds=19)


def test_kafka_shaped_payload_lands_identically(spark, tmp_path):
    """Kafka transport parity: the same JSON objects the file source
    reads, arriving as message-value bytes and decoded by the shared
    parse_json_payload, must land (and reject) identically through the
    foreachBatch body."""
    engine = Datastream(spark, str(tmp_path / "store"))
    sid = engine.ensure_stream({"title": "kshaped"})
    ing = StreamingIngest(engine, str(tmp_path / "in"), str(tmp_path / "cp"))
    payloads = [
        json.dumps({"stream_id": sid, "ts": iso(0), "value": 1.0}),
        json.dumps({"stream_id": sid, "ts": iso(1), "value": 2.0}),
        json.dumps({"stream_id": sid, "ts": iso(1), "value": 9.0}),  # dup → reject
        json.dumps({"stream_id": "nope", "ts": iso(2), "value": 3.0}),
    ]
    kafka_like = spark.createDataFrame(
        [(p.encode("utf-8"),) for p in payloads], "value binary"
    )
    ing.ingest_dataframe(parse_json_payload(kafka_like))
    assert [p["v"] for p in engine.get_data(sid, "seconds")] == [1.0, 2.0]
    assert spark.read.parquet(ing.rejects_path).count() == 2


def test_stateful_sessionize_closes_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions close data-driven
    within a batch, survive the state store across micro-batches, and the
    final open session closes by event-time timeout."""
    from django_datastream_spark.streaming.stateful import stateful_sessionize
    from django_datastream_spark.streaming.ingest import INGEST_SCHEMA

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    def run_batch(name: str, rows: list[dict]) -> None:
        write_jsonl(f"{src}/{name}", rows)
        stream = spark.readStream.schema(INGEST_SCHEMA).json(src)
        q = (
            stateful_sessionize(stream.select("stream_id", "ts", "value"), gap_s=30)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 0: session A (0,5,10), then after a >30s gap session B (100..102)
    run_batch(
        "b0.json",
        [
            {"stream_id": "s1", "ts": iso(t), "value": float(t)}
            for t in (0, 5, 10, 100, 101, 102)
        ],
    )
    got0 = {
        (r["stream_id"], r["session_start"].replace(tzinfo=UTC)): r
        for r in spark.read.parquet(out).collect()
    }
    a = got0[("s1", T0)]
    assert a["session_end"].replace(tzinfo=UTC) == T0 + dt.timedelta(seconds=10)
    assert a["n_points"] == 3 and a["value_sum"] == 15.0
    # session B is still open (only closable once the watermark moves on)
    assert len(got0) == 1

    # batch 1: a much later point → watermark passes B's horizon, B closes
    # by TIMEOUT (no new data in its gap), and C opens
    run_batch("b1.json", [{"stream_id": "s1", "ts": iso(500), "value": 1.0}])
    got1 = {
        (r["stream_id"], r["session_start"].replace(tzinfo=UTC)): r
        for r in spark.read.parquet(out).collect()
    }
    b = got1[("s1", T0 + dt.timedelta(seconds=100))]
    assert b["session_end"].replace(tzinfo=UTC) == T0 + dt.timedelta(seconds=102)
    assert b["n_points"] == 3 and b["value_sum"] == 303.0
    assert len(got1) == 2  # C (at 500) still open


def test_streaming_downsample_completed_bucket_rule(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    # bucket [0,10): 3 points; bucket [10,20): 2 points; tail point at 25
    rows = [
        {"stream_id": "s1", "ts": iso(i), "value": float(v)}
        for i, v in [(0, 1), (3, 2), (9, 3), (10, 10), (15, 20), (25, 99)]
    ]
    write_jsonl(f"{src}/b0.json", rows)
    q = streaming_downsample(spark, src, out, cp, "seconds10")
    q.awaitTermination()

    got = {
        r["bucket_ts"].replace(tzinfo=UTC): r
        for r in spark.read.parquet(out).collect()
    }
    # watermark advanced to 25 ⇒ buckets ending ≤25 are closed: [0,10), [10,20)
    assert set(got) == {T0, T0 + dt.timedelta(seconds=10)}
    b0 = got[T0]
    assert b0["count"] == 3 and b0["sum"] == 6.0 and b0["min"] == 1.0
    # the open tail bucket [20,30) emits once a later batch moves the watermark
    write_jsonl(f"{src}/b1.json", [{"stream_id": "s1", "ts": iso(41), "value": 7.0}])
    q = streaming_downsample(spark, src, out, cp, "seconds10")
    q.awaitTermination()
    got2 = {r["bucket_ts"].replace(tzinfo=UTC) for r in spark.read.parquet(out).collect()}
    assert T0 + dt.timedelta(seconds=20) in got2
    # bucket [40,50) is still open — not emitted
    assert T0 + dt.timedelta(seconds=40) not in got2


def test_equal_ts_seq_assignment_is_deterministic(spark, tmp_path):
    """check_timestamp=False replays are bit-identical: equal-timestamp
    rows within one batch get seq from row CONTENT (ts, value,
    value_nominal), not from the source's accidental partition layout —
    so re-ingesting the same batch under a different partitioning stores
    the same (ts, seq-order, value) sequence (VERDICT r3 #8)."""
    # 5 rows per timestamp, values deliberately out of order in the input
    vals = [5.0, 1.0, 3.0, 2.0, 4.0]
    orders = []
    for run, nparts in enumerate((1, 8)):
        engine = Datastream(spark, str(tmp_path / f"store{run}"))
        sid = engine.ensure_stream({"title": "dup"})
        rows = [
            (sid, T0 + dt.timedelta(seconds=s), v, None)
            for s in range(4)
            for v in vals
        ]
        df = spark.createDataFrame(
            rows, "stream_id string, ts timestamp, value double, value_nominal string"
        ).repartition(nparts)
        ing = StreamingIngest(
            engine, str(tmp_path / f"in{run}"), str(tmp_path / f"cp{run}"),
            check_timestamp=False,
        )
        ing.ingest_dataframe(df)
        pts = list(engine.get_data(sid, "seconds"))  # ordered by (ts, seq)
        orders.append([(p["t"], p["v"]) for p in pts])
    assert orders[0] == orders[1]
    # within each equal-ts group the content order is ascending by value
    assert [v for _, v in orders[0]] == sorted(vals) * 4


def test_sessionize_lateness_covers_cross_stream_skew(spark, tmp_path):
    """The sessionize watermark is global, but streams pace
    independently: with lateness=0 a lagging stream's rows are dropped
    as late and its sessions silently lost; the nonzero default
    (2*gap_s) keeps them within the skew bound (ADVICE r3)."""
    from django_datastream_spark.streaming.stateful import stateful_sessionize
    from django_datastream_spark.streaming.ingest import INGEST_SCHEMA

    def run(tag: str, lateness):
        src = str(tmp_path / f"in_{tag}")
        out = str(tmp_path / f"out_{tag}")
        cp = str(tmp_path / f"cp_{tag}")

        def run_batch(name: str, rows: list[dict]) -> None:
            write_jsonl(f"{src}/{name}", rows)
            stream = spark.readStream.schema(INGEST_SCHEMA).json(src)
            q = (
                stateful_sessionize(
                    stream.select("stream_id", "ts", "value"),
                    gap_s=30,
                    lateness=lateness,
                )
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", cp)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # fast stream advances the global watermark to ~500
        run_batch(
            "b0.json",
            [{"stream_id": "fast", "ts": iso(t), "value": 1.0} for t in (500, 501)],
        )
        # slow stream arrives 50s behind the fast stream's event time
        run_batch(
            "b1.json",
            [{"stream_id": "slow", "ts": iso(t), "value": 1.0} for t in (450, 455)],
        )
        # a much later fast point closes everything still open by timeout
        run_batch("b2.json", [{"stream_id": "fast", "ts": iso(2000), "value": 1.0}])
        return {r["stream_id"] for r in spark.read.parquet(out).collect()}

    # default lateness (2*gap = 60s) covers the 50s skew: slow survives
    assert run("default", None) == {"fast", "slow"}
    # zero lateness: the slow stream's rows are dropped, session lost
    assert run("zero", "0 seconds") == {"fast"}


# ---------------------------------------------------------------------------
# file-format sources (sources/files.py): CSV / JSONL with quarantine
# ---------------------------------------------------------------------------


def test_csv_source_batch_ingest_with_quarantine(spark, tmp_path):
    from django_datastream_spark.sources import files as fsrc

    engine = Datastream(spark, str(tmp_path / "store"))
    sid = engine.ensure_stream({"title": "csv"})
    src = str(tmp_path / "csv_in")
    os.makedirs(src)
    with open(f"{src}/b0.csv", "w") as f:
        f.write("stream_id,ts,value,value_nominal\n")
        f.write(f"{sid},{iso(0)},1.5,\n")
        f.write(f"{sid},{iso(1)},2.5,\n")
        f.write(f"{sid},not-a-timestamp,3.5,\n")      # malformed ts
        f.write(f",{iso(2)},4.5,\n")                  # missing stream_id

    good, bad = fsrc.split_quarantine(fsrc.read_ingest_csv(spark, src))
    assert [f.name for f in good.schema.fields] == [
        "stream_id", "ts", "value", "value_nominal",
    ]
    assert good.count() == 2
    assert bad.count() == 2

    ing = StreamingIngest(engine, str(tmp_path / "unused"), str(tmp_path / "cp"))
    ing.ingest_dataframe(good)
    assert [p["v"] for p in engine.get_data(sid, "seconds")] == [1.5, 2.5]


def test_jsonl_source_streaming_attach(spark, tmp_path):
    from django_datastream_spark.sources import files as fsrc

    engine = Datastream(spark, str(tmp_path / "store"))
    sid = engine.ensure_stream({"title": "jl"})
    src = str(tmp_path / "jl_in")
    write_jsonl(
        f"{src}/b0.json",
        [
            {"stream_id": sid, "ts": iso(0), "value": 7.0},
            {"stream_id": sid, "ts": "garbage", "value": 8.0},
        ],
    )
    ing = StreamingIngest(engine, str(tmp_path / "unused2"), str(tmp_path / "cp2"))
    good = fsrc.split_quarantine(
        fsrc.read_ingest_jsonl(spark, src, streaming=True)
    )[0]
    q = ing.attach(good)
    q.awaitTermination(120)
    assert [p["v"] for p in engine.get_data(sid, "seconds")] == [7.0]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Replayed points (same stream_id+ts) are emitted exactly once,
    including replays that arrive in a later run through the same
    checkpoint — the at-least-once -> exactly-once seam."""
    from django_datastream_spark.streaming.ingest import streaming_dedup

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    write_jsonl(
        f"{src}/b0.json",
        [
            {"stream_id": "s1", "ts": iso(0), "value": 1.0},
            {"stream_id": "s1", "ts": iso(1), "value": 2.0},
            {"stream_id": "s1", "ts": iso(0), "value": 1.0},  # same-batch dup
            {"stream_id": "s2", "ts": iso(0), "value": 5.0},  # same ts, other stream
        ],
    )
    streaming_dedup(spark, src, out, cp).awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # the dup collapsed, the cross-stream twin kept

    # replay the same point in a NEW run (state restored from the
    # checkpoint; watermark hasn't passed ts+lateness) + one new point
    write_jsonl(
        f"{src}/b1.json",
        [
            {"stream_id": "s1", "ts": iso(0), "value": 1.0},  # cross-run replay
            {"stream_id": "s1", "ts": iso(5), "value": 3.0},
        ],
    )
    streaming_dedup(spark, src, out, cp).awaitTermination()
    got = sorted(
        (r["stream_id"], r["ts"].second, r["value"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [("s1", 0, 1.0), ("s1", 1, 2.0), ("s1", 5, 3.0), ("s2", 0, 5.0)]


def test_stateful_ewma_state_carries_across_batches(spark, tmp_path):
    """Streaming EWMA: within-batch values match the exact recurrence,
    and the state store carries (ewma, n) across micro-batches so the
    second batch continues the series instead of restarting it."""
    from django_datastream_spark.streaming.ingest import INGEST_SCHEMA
    from django_datastream_spark.streaming.stateful import stateful_ewma

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    alpha = 0.3

    def run_batch(name: str, rows: list[dict]) -> None:
        write_jsonl(f"{src}/{name}", rows)
        stream = spark.readStream.schema(INGEST_SCHEMA).json(src)
        q = (
            stateful_ewma(stream.select("stream_id", "ts", "value"), alpha=alpha)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    vals0 = [10.0, 20.0, 5.0]
    run_batch(
        "b0.json",
        [
            {"stream_id": "s1", "ts": iso(t), "value": v}
            for t, v in zip((0, 1, 2), vals0)
        ]
        + [{"stream_id": "s2", "ts": iso(0), "value": 100.0}],
    )
    vals1 = [40.0, 2.0]
    run_batch(
        "b1.json",
        [
            {"stream_id": "s1", "ts": iso(t), "value": v}
            for t, v in zip((3, 4), vals1)
        ],
    )

    # exact recurrence replay (same floats, same order)
    exp, e = [], None
    for v in vals0 + vals1:
        e = v if e is None else alpha * v + (1 - alpha) * e
        exp.append(e)

    got = sorted(
        (
            (r["ts"].second, r["ewma"])
            for r in spark.read.parquet(out).collect()
            if r["stream_id"] == "s1"
        )
    )
    assert [t for t, _ in got] == [0, 1, 2, 3, 4]
    for (_, g), x in zip(got, exp):
        assert abs(g - x) < 1e-12, (g, x)
    # the independent stream seeds its own state
    s2 = [r for r in spark.read.parquet(out).collect() if r["stream_id"] == "s2"]
    assert len(s2) == 1 and s2[0]["ewma"] == 100.0


def test_stream_stream_interval_join(spark, tmp_path):
    """Two live streams joined on key within an event-time window:
    in-window pairs emit, out-of-window and wrong-key pairs don't, and
    a second micro-batch still matches against the buffered left rows
    (stream-stream state, not per-batch joins)."""
    import json as _json

    from django_datastream_spark.streaming.joins import interval_join

    schema = "user string, ts timestamp, info string"
    src_l = str(tmp_path / "views")
    src_r = str(tmp_path / "clicks")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(src_l), os.makedirs(src_r)

    def jrow(user, sec, info):
        return _json.dumps({"user": user, "ts": iso(sec), "info": info})

    def run():
        left = spark.readStream.schema(schema).json(src_l)
        right = spark.readStream.schema(schema).json(src_r)
        q = (
            interval_join(left, right, "user", window="30 seconds")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with open(f"{src_l}/b0.json", "w") as f:
        f.write("\n".join([jrow("u1", 0, "v1"), jrow("u2", 10, "v2")]))
    with open(f"{src_r}/b0.json", "w") as f:
        f.write(
            "\n".join(
                [
                    jrow("u1", 20, "c-in"),       # within 30s of v1 -> match
                    jrow("u1", 45, "c-late"),     # 45s after v1 -> no match
                    jrow("u3", 5, "c-nokey"),     # no left u3 -> no match
                ]
            )
        )
    run()
    got = {
        (r["l_info"], r["r_info"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {("v1", "c-in")}

    # batch 2: a click matching the STILL-BUFFERED left row of u2
    with open(f"{src_r}/b1.json", "w") as f:
        f.write(jrow("u2", 30, "c-b2"))
    run()
    got2 = {
        (r["l_info"], r["r_info"])
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == {("v1", "c-in"), ("v2", "c-b2")}


def test_stream_scores_against_batch_profile(spark, tmp_path):
    """Lambda seam: a profile built in BATCH scores a live stream via
    a stream-static broadcast join — same operator
    (timeseries.score_against_profile), no state, and the streamed
    flags must equal the batch-scored flags on identical data."""
    import json as _json

    from django_datastream_spark.operators import timeseries as tso

    rows = [
        {"k": "a", "value": float(v)}
        for v in (10, 11, 9, 10, 12, 10, 11, 50)  # 50 = anomaly
    ] + [
        {"k": "b", "value": float(v)}
        for v in (0, 1, 0, -1, 0, 1, -40)          # -40 = anomaly
    ]
    hist = spark.createDataFrame(
        [(r["k"], r["value"]) for r in rows[:-1]], "k string, value double"
    )
    profile = tso.build_profile(hist, keys=("k",))

    src = str(tmp_path / "live")
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/batch0.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    live = (
        spark.readStream.schema("k string, value double")
        .json(src)
    )
    scored = tso.score_against_profile(live, profile, keys=("k",))
    q = (
        scored.writeStream.format("memory")
        .queryName("scored_live")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["value"]): r["is_anomaly"]
        for r in spark.sql("SELECT * FROM scored_live").collect()
    }
    batch = {
        (r["k"], r["value"]): r["is_anomaly"]
        for r in tso.score_against_profile(
            spark.createDataFrame(
                [(r["k"], r["value"]) for r in rows],
                "k string, value double",
            ),
            profile,
            keys=("k",),
        ).collect()
    }
    assert got == batch
    assert got[("a", 50.0)] is True and got[("b", -40.0)] is True
    assert sum(got.values()) == 2


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Native session_window in STREAMING mode (state-backed session
    merging across micro-batches) must finalize the same sessions the
    batch operator computes on the full data — including a session
    whose events straddle two micro-batches."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    # user A: events at 0s, 5s | 100s..105s (two sessions, 10s gap);
    # the second session's events straddle the two input files.
    b0 = [
        {"user": "A", "ts": iso(0)},
        {"user": "A", "ts": iso(5)},
        {"user": "A", "ts": iso(100)},
        {"user": "B", "ts": iso(50)},
    ]
    b1 = [
        {"user": "A", "ts": iso(105)},
        # sentinel far in the future: pushes the watermark past every
        # session end so append mode emits them all
        {"user": "Z", "ts": iso(100_000)},
    ]
    write_jsonl(f"{src}/b0.json", b0)
    write_jsonl(f"{src}/b1.json", b1)

    def sessions(df):
        return df.groupBy(
            F.session_window("ts", "10 seconds"), "user"
        ).agg(F.count(F.lit(1)).alias("n"))

    stream = (
        spark.readStream.schema("user string, ts string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .select("user", F.to_timestamp("ts").alias("ts"))
        .withWatermark("ts", "1 second")
    )
    q = (
        sessions(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = (
        spark.read.schema("user string, ts string")
        .json(src)
        .select("user", F.to_timestamp("ts").alias("ts"))
    )
    want = {
        (r["user"], r["session_window"]["start"], r["n"])
        for r in sessions(batch).collect()
        if r["user"] != "Z"  # sentinel session never closes upstream
    }
    got = {
        (r["user"], r["session_window"]["start"], r["n"])
        for r in spark.read.parquet(out).collect()
    }
    assert want == got
    # the straddling session really merged: user A has a 2-event
    # session starting at t=100
    assert any(u == "A" and n == 2 for (u, _s, n) in got) and len(
        [1 for (u, *_ ) in got if u == "A"]
    ) == 2


@pytest.mark.slow
def test_streaming_late_point_rolls_back_watermark_plan_side(
    spark, tmp_path
):
    """The streaming metadata plan's transform_values rollback (the
    DataFrame mirror of api.append_multiple's healing): with
    check_timestamp=False, a micro-batch landing BELOW a stream's
    finalized bucket must lower downsampled_until so the next
    auto_downsample recomputes that bucket — and never touch (null)
    entries for granularities that never downsampled."""
    engine = Datastream(spark, str(tmp_path / "store"))
    sid = engine.ensure_stream({"title": "late"})
    ing = StreamingIngest(
        engine,
        str(tmp_path / "in"),
        str(tmp_path / "cp"),
        check_timestamp=False,
        auto_downsample=True,
    )
    batch1 = spark.createDataFrame(
        [(sid, T0 + dt.timedelta(seconds=i), 1.0) for i in range(0, 600, 10)],
        "stream_id string, ts timestamp, value double",
    ).withColumn("value_nominal", F.lit(None).cast("string"))
    ing.ingest_dataframe(batch1)

    def minute_counts():
        return {
            p["t"]["first"].replace(second=0, tzinfo=None): p["v"]["count"]
            for p in engine.get_data(
                sid, "minutes",
                value_downsamplers=["count"],
                time_downsamplers=["first"],
            )
        }

    before = minute_counts()
    assert before[(T0 + dt.timedelta(seconds=60)).replace(tzinfo=None)] == 6
    meta = engine._get_stream(sid)
    wm_before = dict(meta["downsampled_until"] or {})
    assert any(v is not None for v in wm_before.values())

    # late point BELOW the finalized minute bucket, via the streaming path
    batch2 = spark.createDataFrame(
        [(sid, T0 + dt.timedelta(seconds=65), 1.0)],
        "stream_id string, ts timestamp, value double",
    ).withColumn("value_nominal", F.lit(None).cast("string"))
    ing.ingest_dataframe(batch2, batch_id=1)
    # the rolled-back floor reaches the late point's bucket
    wm_mid = engine._get_stream(sid)["downsampled_until"]["minutes"]
    assert wm_mid.replace(tzinfo=None) <= (
        T0 + dt.timedelta(seconds=60)
    ).replace(tzinfo=None)
    # batch2's own frontier (t=65) cannot COMPLETE the [60,120) bucket
    # (completed-bucket rule); a later batch advancing the frontier
    # triggers the recompute through the same streaming path
    batch3 = spark.createDataFrame(
        [(sid, T0 + dt.timedelta(seconds=700), 1.0)],
        "stream_id string, ts timestamp, value double",
    ).withColumn("value_nominal", F.lit(None).cast("string"))
    ing.ingest_dataframe(batch3, batch_id=2)

    after = minute_counts()
    assert after[(T0 + dt.timedelta(seconds=60)).replace(tzinfo=None)] == 7
    # null (never-downsampled) entries stayed null — a floor there
    # would wrongly mark unseen history final
    wm_after = engine._get_stream(sid)["downsampled_until"]
    for g, v in wm_before.items():
        if v is None:
            assert wm_after[g] is None, g


def test_running_fn_sorts_across_arrow_chunks():
    """A key whose micro-batch spans several Arrow chunks must be
    ordered as ONE batch: chunk-local sorting would interleave seq_no
    and cumsum across out-of-order chunks."""
    import pandas as pd

    from django_datastream_spark.streaming.stateful import _running_fn

    class FakeState:
        exists = False

        def __init__(self):
            self.val = None

        def update(self, v):
            self.val = v

    # chunk 2 holds EARLIER timestamps than chunk 1
    c1 = pd.DataFrame(
        {"event_id": [3, 4], "ts": pd.to_datetime(["2024-01-02", "2024-01-03"]),
         "value": [30.0, 40.0]}
    )
    c2 = pd.DataFrame(
        {"event_id": [1, 2], "ts": pd.to_datetime(["2023-12-30", "2023-12-31"]),
         "value": [10.0, 20.0]}
    )
    st = FakeState()
    out = pd.concat(list(_running_fn((5,), iter([c1, c2]), st)))
    assert list(out["event_id"]) == [1, 2, 3, 4]
    assert list(out["seq_no"]) == [1, 2, 3, 4]
    assert list(out["running_value"]) == [10.0, 30.0, 60.0, 100.0]
    assert st.val == (4, 100.0)


@pytest.mark.parametrize("provider", [None, "rocksdb"])
def test_state_store_providers_agree(spark, tmp_path, provider):
    """The RocksDB state store option (VERDICT r6 #7): a stateful
    availableNow replay (watermarked tumbling agg + dropDuplicates)
    produces identical results under the HDFS-backed default and
    RocksDB, and the streaming_state scope restores both confs on
    exit. RocksDB is the at-scale answer (off-heap state, incremental
    changelog) — see session.streaming_state for the measured
    small-scale trade-off."""
    from django_datastream_spark.session import streaming_state

    src = str(tmp_path / f"src-{provider}")
    os.makedirs(src)
    rows = []
    for i in range(200):
        rows.append((f"k{i % 37}", T0 + dt.timedelta(seconds=i), float(i)))
        if i % 5 == 0:  # duplicates for the dedup state
            rows.append(
                (f"k{i % 37}", T0 + dt.timedelta(seconds=i), float(i))
            )
    spark.createDataFrame(
        rows, "k string, ts timestamp, v double"
    ).coalesce(2).write.parquet(src, mode="overwrite")

    stream = spark.readStream.schema(
        "k string, ts timestamp, v double"
    ).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 second")
        .dropDuplicates(["k", "ts"])
        .groupBy(F.window("ts", "60 seconds"), "k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    out = str(tmp_path / f"out-{provider}")
    cp = str(tmp_path / f"cp-{provider}")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    with streaming_state(spark, provider=provider, state_partitions=4):
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
    # confs restored
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_parts
    if provider is not None:
        default_provider = (
            "org.apache.spark.sql.execution.streaming."
            "state.HDFSBackedStateStoreProvider"
        )
        assert (
            spark.conf.get(
                "spark.sql.streaming.stateStore.providerClass",
                default_provider,
            )
            != "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )

    got = {
        (r["k"], r["window"]["start"].isoformat(), r["n"], r["s"])
        for r in spark.read.parquet(out).collect()
    }
    # exact recompute: watermark-closed 60s buckets only (append mode
    # emits a bucket once the watermark passes its end: max ts 199s,
    # delay 1s => frontier 198s closes buckets ending at 60/120/180)
    import collections

    expect = collections.defaultdict(lambda: [0, 0.0])
    for k, ts, v in set(rows):  # set() = dedup exactly
        b = (ts - T0).total_seconds() // 60 * 60
        if b + 60 <= 198:
            key = (k, (T0 + dt.timedelta(seconds=b)))
            expect[key][0] += 1
            expect[key][1] += v
    want = {
        (k, t.replace(tzinfo=None).isoformat(), n, s)
        for (k, t), (n, s) in expect.items()
    }
    assert got == want
