"""Physical table layout (SURVEY.md §1.3 / FIXTURES.md B1).

Three tables under a root directory:

- ``streams``     — small metadata table (one row per stream). Snapshot-
                    overwritten parquet; at production scale this becomes a
                    Delta/Iceberg table with MERGE, the layout is identical.
- ``points_raw``  — appends at each stream's highest granularity,
                    partitioned by ``p_date`` (UTC day of ts) so range scans
                    prune partitions; within a partition, files are written
                    clustered by stream batch.
- ``points_agg``  — downsampled buckets for all coarser granularities,
                    partitioned by ``(granularity, p_date)``.

All aggregate columns are *algebraic carriers* (sum, count, sum_squares,
t_sum_epoch, frequencies) plus their finished presentation values, so a
coarser granularity can be computed by merging the next-finer aggregates
without rescanning raw data — the property that makes the downsample
cascade O(raw + Σ aggregates) instead of O(6 × raw) at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STREAMS_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("value_type", T.StringType()),
        T.StructField("highest_granularity", T.StringType()),
        T.StructField("value_downsamplers", T.ArrayType(T.StringType())),
        T.StructField("time_downsamplers", T.ArrayType(T.StringType())),
        T.StructField("derived_from", T.ArrayType(T.StringType())),
        T.StructField("derive_op", T.StringType()),
        T.StructField("derive_args", T.StringType()),  # json
        T.StructField("tags", T.StringType()),  # json
        T.StructField("earliest_ts", T.TimestampType()),
        T.StructField("latest_ts", T.TimestampType()),
        # per-granularity downsample progress (bucket_end watermark)
        T.StructField(
            "downsampled_until", T.MapType(T.StringType(), T.TimestampType())
        ),
    ]
)

GRAPH_TYPE = T.StructType(
    [
        T.StructField(
            "v", T.ArrayType(T.StructType([T.StructField("i", T.StringType())]))
        ),
        T.StructField(
            "e",
            T.ArrayType(
                T.StructType(
                    [T.StructField("f", T.StringType()), T.StructField("t", T.StringType())]
                )
            ),
        ),
    ]
)

POINTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        # insertion sequence — total order for ties when check_timestamp is
        # off (the reference gets this from MongoDB ObjectId creation order)
        T.StructField("seq", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_nominal", T.StringType()),  # canonical json
        T.StructField("value_graph", GRAPH_TYPE),
    ]
)

V_TYPE = T.StructType(
    [
        T.StructField("mean", T.DoubleType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
        T.StructField("sum_squares", T.DoubleType()),
        T.StructField("std_dev", T.DoubleType()),
        T.StructField("count", T.LongType()),
        T.StructField("frequencies", T.MapType(T.StringType(), T.LongType())),
        T.StructField("most_often", T.StringType()),
        T.StructField("least_often", T.StringType()),
    ]
)

T_TYPE = T.StructType(
    [
        T.StructField("first", T.TimestampType()),
        T.StructField("last", T.TimestampType()),
        T.StructField("mean", T.TimestampType()),
    ]
)

POINTS_AGG_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType()),
        T.StructField("granularity", T.StringType()),
        T.StructField("bucket_ts", T.TimestampType()),
        T.StructField("v", V_TYPE),
        T.StructField("t", T_TYPE),
        # algebraic carrier: exact sum of epoch-seconds, for merging t.mean
        T.StructField("t_sum_epoch", T.LongType()),
    ]
)


class Tables:
    """Parquet-backed storage for one engine instance."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------
    @property
    def streams_path(self) -> str:
        return os.path.join(self.root, "streams")

    @property
    def points_raw_path(self) -> str:
        return os.path.join(self.root, "points_raw")

    @property
    def points_agg_path(self) -> str:
        return os.path.join(self.root, "points_agg")

    def _exists(self, path: str) -> bool:
        return os.path.isdir(path) and any(
            n.endswith(".parquet") or n.startswith(("p_date=", "granularity="))
            for n in os.listdir(path)
        )

    # -- streams metadata --------------------------------------------------
    def read_streams(self) -> DataFrame:
        if not self._exists(self.streams_path):
            return self.spark.createDataFrame([], STREAMS_SCHEMA)
        return self.spark.read.parquet(self.streams_path)

    def write_streams(self, df: DataFrame) -> None:
        # metadata is small (≤ millions of rows): snapshot overwrite through
        # a driver-side materialization so we never read-while-overwrite.
        rows = df.collect()
        out = self.spark.createDataFrame(rows, STREAMS_SCHEMA)
        out.coalesce(1).write.mode("overwrite").parquet(self.streams_path)

    # -- raw points --------------------------------------------------------
    def read_points_raw(self) -> DataFrame:
        if not self._exists(self.points_raw_path):
            return self.spark.createDataFrame([], POINTS_RAW_SCHEMA).withColumn(
                "p_date", F.to_date("ts")
            )
        return self.spark.read.parquet(self.points_raw_path)

    def append_points_raw(self, df: DataFrame) -> None:
        (
            df.withColumn("p_date", F.to_date("ts"))
            .write.mode("append")
            .partitionBy("p_date")
            .parquet(self.points_raw_path)
        )

    # -- aggregates --------------------------------------------------------
    def read_points_agg(self) -> DataFrame:
        if not self._exists(self.points_agg_path):
            return self.spark.createDataFrame([], POINTS_AGG_SCHEMA)
        return self.spark.read.parquet(self.points_agg_path).select(
            *[f.name for f in POINTS_AGG_SCHEMA.fields]
        )

    def append_points_agg(self, df: DataFrame) -> None:
        (
            df.select(*[f.name for f in POINTS_AGG_SCHEMA.fields])
            .write.mode("append")
            .partitionBy("granularity")
            .parquet(self.points_agg_path)
        )
