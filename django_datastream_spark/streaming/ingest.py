"""Structured Streaming ingest + continuous downsample (SURVEY §2.8, §3.2).

Reference behavior being reproduced:

- T1: ``append(check_timestamp=True)`` rejects non-monotonic timestamps.
  A stream can't raise per-record, so the streaming form VALIDATES in
  ``foreachBatch`` and routes violations to a quarantine table (exactly
  the rows the batch API would have raised on — Q27's predicate).
- T3: completed-bucket rule — the streaming downsample emits a bucket
  only once the watermark passes its end (append output mode).
- T4: incremental state — per-stream ``latest_ts`` is carried in the
  streams metadata table and merged per micro-batch; bucket state lives
  in the Structured Streaming state store.

Scale notes: every micro-batch is one validation join (broadcast of the
small latest_ts dim) + one partitioned append; the windowed aggregation
is a standard streaming stateful agg that scales with open buckets, not
history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..api import Datastream
from ..granularity import BY_NAME

INGEST_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_nominal", T.StringType()),
    ]
)


class StreamingIngest:
    """File-source streaming ingest into a Datastream store.

    Producers drop JSON-lines files with (stream_id, ts, value[,
    value_nominal]) into ``source_dir``; each micro-batch validates and
    lands them. Swap the readStream source for Kafka in production — the
    foreachBatch body is source-agnostic.
    """

    def __init__(
        self,
        engine: Datastream,
        source_dir: str,
        checkpoint_dir: str,
        check_timestamp: bool = True,
        auto_downsample: bool = False,
    ):
        self.engine = engine
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.check_timestamp = check_timestamp
        # continuously materialize points_agg after each micro-batch;
        # cheap because downsample_streams is watermark-bounded (it scans
        # only raw data since the last completed coarsest bucket)
        self.auto_downsample = auto_downsample
        os.makedirs(source_dir, exist_ok=True)

    @property
    def rejects_path(self) -> str:
        return os.path.join(self.engine.tables.root, "rejects")

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = self.engine.spark
        if not batch.head(1):
            return
        streams = self.engine.find_streams(None)
        known = {s["stream_id"] for s in streams if not s["derive_op"]}
        batch = batch.withColumn("seq", F.monotonically_increasing_id() + F.lit(batch_id) * (1 << 40))
        batch = batch.withColumn(
            "value_graph",
            F.lit(None).cast(
                self.engine.tables.read_points_raw().schema["value_graph"].dataType
            ),
        )
        unknown = batch.filter(~F.col("stream_id").isin(list(known)) if known else F.lit(True))
        batch = batch.filter(F.col("stream_id").isin(list(known)) if known else F.lit(False))

        if self.check_timestamp:
            latest = spark.createDataFrame(
                [
                    (s["stream_id"], s["latest_ts"])
                    for s in streams
                    if s["latest_ts"] is not None
                ]
                or [("__none__", None)],
                "stream_id string, _latest timestamp",
            )
            w = Window.partitionBy("stream_id").orderBy("ts", "seq")
            checked = (
                batch.withColumn("_prev", F.lag("ts").over(w))
                .join(F.broadcast(latest), "stream_id", "left")
            )
            bad = checked.filter(
                (F.col("ts") <= F.col("_latest")) | (F.col("ts") <= F.col("_prev"))
            )
            good = checked.filter(
                ((F.col("_latest").isNull()) | (F.col("ts") > F.col("_latest")))
                & ((F.col("_prev").isNull()) | (F.col("ts") > F.col("_prev")))
            ).drop("_prev", "_latest")
            rejects = bad.drop("_prev", "_latest").unionByName(unknown)
        else:
            good, rejects = batch, unknown

        rej_rows = rejects.withColumn("batch_id", F.lit(batch_id))
        if rej_rows.head(1):
            rej_rows.drop("value_graph").write.mode("append").parquet(self.rejects_path)

        cols = [f.name for f in self.engine.tables.read_points_raw().schema.fields if f.name != "p_date"]
        good = good.select(*cols)
        if good.head(1):
            # tail state for incremental derive must be read BEFORE the
            # batch is appended: one row per source stream at its previous
            # latest_ts (lag context across micro-batches, SURVEY T4)
            derived_new = self._incremental_derive(good, streams)
            self.engine.tables.append_points_raw(good)
            if derived_new is not None:
                self.engine.tables.append_points_raw(derived_new)
                good = good.unionByName(derived_new)
            bounds = {
                r["stream_id"]: (r["mn"], r["mx"])
                for r in good.groupBy("stream_id")
                .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
                .collect()
            }
            updated = []
            batch_max = None
            for s in streams:
                if s["stream_id"] in bounds:
                    mn, mx = bounds[s["stream_id"]]
                    s = dict(s)
                    s["earliest_ts"] = (
                        mn if s["earliest_ts"] is None else min(s["earliest_ts"], mn)
                    )
                    s["latest_ts"] = (
                        mx if s["latest_ts"] is None else max(s["latest_ts"], mx)
                    )
                    batch_max = mx if batch_max is None else max(batch_max, mx)
                updated.append(s)
            self.engine._write_streams_dicts(updated)
            if self.auto_downsample and batch_max is not None:
                # completed-bucket rule keyed to observed event time: buckets
                # ending at or before the batch's max ts are final for every
                # monotonic stream
                self.engine.downsample_streams(until=batch_max)

    def _incremental_derive(
        self, batch: DataFrame, streams: list[dict]
    ) -> DataFrame | None:
        """Incrementally materialize lag-family derived streams
        (derivative / counter_reset / counter_derivative): run the batch
        derive plan over (per-source tail point ∪ new points) and keep only
        outputs newer than each derived stream's latest materialized point.
        Identical plans to the batch rebuild ⇒ incremental == batch
        (FIXTURES B3.4). The `sum` operator stays a computed view — its
        slots mutate as other sources arrive, so it is not append-only.
        """
        from ..operators import derive as derive_ops

        spark = self.engine.spark
        lag_ops = {"derivative", "counter_reset", "counter_derivative"}
        derived_meta = [
            s
            for s in streams
            if s["derive_op"] in lag_ops
        ]
        if not derived_meta:
            return None
        src_ids = sorted(
            {sid for s in derived_meta for sid in (s["derived_from"] or [])}
        )
        batch_src = batch.filter(F.col("stream_id").isin(src_ids))
        if not batch_src.head(1):
            return None
        # tail: each source's last stored point (ts == latest_ts)
        tails = spark.createDataFrame(
            [
                (s["stream_id"], s["latest_ts"])
                for s in streams
                if s["stream_id"] in src_ids and s["latest_ts"] is not None
            ]
            or [("__none__", None)],
            "stream_id string, _lts timestamp",
        )
        tail_pts = (
            self.engine.tables.read_points_raw()
            .join(F.broadcast(tails), "stream_id")
            .filter(F.col("ts") == F.col("_lts"))
            .select("stream_id", "ts", "value")
        )
        source_pts = tail_pts.unionByName(
            batch_src.select("stream_id", "ts", "value")
        )
        out = derive_ops.build_derive_plan(derived_meta, source_pts)
        if out is None:
            return None
        # suppress re-emission of the tail-to-tail deltas already stored
        latest_derived = spark.createDataFrame(
            [
                (s["stream_id"], s["latest_ts"])
                for s in derived_meta
                if s["latest_ts"] is not None
            ]
            or [("__none__", None)],
            "stream_id string, _dlts timestamp",
        )
        out = (
            out.join(F.broadcast(latest_derived), "stream_id", "left")
            .filter(F.col("_dlts").isNull() | (F.col("ts") > F.col("_dlts")))
            .drop("_dlts")
        )
        out = (
            out.withColumn("seq", F.monotonically_increasing_id())
            .withColumn("value_nominal", F.lit(None).cast("string"))
            .withColumn(
                "value_graph",
                F.lit(None).cast(
                    self.engine.tables.read_points_raw().schema["value_graph"].dataType
                ),
            )
            .select("stream_id", "ts", "seq", "value", "value_nominal", "value_graph")
        )
        return out if out.head(1) else None

    def run_available(self) -> None:
        """Process everything currently in source_dir, then stop
        (Trigger.AvailableNow) — the batch-refresh mode."""
        q = (
            self.engine.spark.readStream.schema(INGEST_SCHEMA)
            .json(self.source_dir)
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def streaming_downsample(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    granularity_name: str = "seconds10",
    lateness: str = "0 seconds",
):
    """True Structured Streaming windowed downsample: tumbling window of
    the given granularity with a watermark; append mode emits each bucket
    exactly once, after the watermark passes its end (completed-bucket
    rule T3; ``lateness`` > 0 is the engine's extension over the
    reference's strict monotonicity).

    Returns the StreamingQuery (AvailableNow trigger).
    """
    g = BY_NAME[granularity_name]
    src = spark.readStream.schema(INGEST_SCHEMA).json(source_dir)
    agg = (
        src.withWatermark("ts", lateness)
        .groupBy(
            "stream_id",
            F.window("ts", f"{g.duration_s} seconds").alias("_w"),
        )
        .agg(
            F.avg("value").alias("mean"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.sum(F.col("value") * F.col("value")).alias("sum_squares"),
            F.count("value").alias("count"),
            F.min("ts").alias("t_first"),
            F.max("ts").alias("t_last"),
        )
        .select(
            "stream_id",
            F.col("_w.start").alias("bucket_ts"),
            F.lit(g.name).alias("granularity"),
            "mean",
            "sum",
            "min",
            "max",
            "sum_squares",
            "count",
            "t_first",
            "t_last",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
