"""Custom pluggable source via the Python Data Source API (Spark 4,
``pyspark.sql.datasource``) — the engine's source-plugin seam.

The reference wires new inputs by subclassing its storage backend; the
Spark-native equivalent is a DataSource registration: schema +
partition planning on the driver, per-partition generators on
executors.  This module ships a deterministic synthetic-events source
(``format("synthetic_events")``) proving the seam end-to-end: the same
row function a benchmark harness or backfill job would use, split
across N input partitions that executors evaluate IN PARALLEL with no
driver materialization.

Scale shape: ``partitions()`` returns only partition descriptors
(driver metadata); every row is produced executor-side from the
partition index, so the source scales to arbitrary row counts the way
``spark.range`` does.  Options: ``rows`` (total), ``partitions``
(parallelism), ``seed`` (value stream).
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
_TYPES = ("click", "view", "purchase", "signup", "error")


def _row(i: int, seed: int):
    # md5-derived value stream: deterministic, engine-portable, and
    # incompressible (the property the skew-join tests rely on)
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    value = int(h[:8], 16) / 0xFFFFFFFF * 100.0
    return (
        i,
        _T0 + dt.timedelta(seconds=i),
        i % 50,
        _TYPES[i % len(_TYPES)],
        round(value, 6),
    )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 0))
        if self.rows < 0:
            raise ValueError(f"rows must be >= 0, got {self.rows}")
        if self.n_parts < 1:
            raise ValueError(
                f"partitions must be >= 1, got {self.n_parts}"
            )

    def partitions(self):
        # driver-side METADATA only: (start, end) index ranges.
        # rows=0 still returns ONE (empty) partition — pyspark
        # substitutes [None] for an empty list and read(None) crashes
        if self.rows == 0:
            return [InputPartition((0, 0))]
        per = -(-self.rows // self.n_parts)
        return [
            InputPartition((p * per, min((p + 1) * per, self.rows)))
            for p in range(self.n_parts)
            if p * per < self.rows
        ]

    def read(self, partition):
        start, end = partition.value
        for i in range(start, end):
            yield _row(i, self.seed)


def register(spark) -> None:
    """Idempotent registration of the synthetic_events format."""
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming leg of the seam: offset-tracked micro-batches of the
    SAME deterministic row stream.  ``read(start)`` advances the
    offset by ``batchRows``; ``readBetweenOffsets`` replays any range
    exactly (what checkpoint recovery calls after a failure), which is
    trivially correct here because rows are a pure function of index —
    the property a real connector gets from a replayable log."""

    def __init__(self, options):
        self.batch = int(options.get("batchRows", 100))
        self.seed = int(options.get("seed", 0))
        if self.batch < 1:
            raise ValueError(
                f"batchRows must be >= 1, got {self.batch}"
            )

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = start["i"]
        end = {"i": i + self.batch}
        return (
            [_row(j, self.seed) for j in range(i, i + self.batch)],
            end,
        )

    def readBetweenOffsets(self, start, end):
        return [_row(j, self.seed) for j in range(start["i"], end["i"])]
