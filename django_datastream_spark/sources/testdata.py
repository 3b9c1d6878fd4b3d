"""Loaders for the driver testdata (`/root/testdata/sf*/<table>.parquet`).

The only non-trivial part: `events.parquet` carries TIMESTAMP(NANOS)
which Spark's parquet reader rejects outright. With
`spark.sql.legacy.parquet.nanosAsLong=true` the column arrives as BIGINT
nanoseconds; we convert to a microsecond TimestampType with integer
arithmetic (`div 1000` — float division would lose precision at 1.7e18).
DuckDB (the oracle) also truncates NANOS→µs internally, so both engines
observe bit-identical timestamps.

At engine scale this shim is irrelevant: our own tables (api/tables.py)
are written as µs parquet where pushdown and pruning work natively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Names of parquet columns physically stored as timestamp[ns]."""
    try:
        import pyarrow.dataset as pads
        import pyarrow as pa

        schema = pads.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing ns-timestamps to TimestampType."""
    from ..session import harden_session

    harden_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        # BIGINT nanos (legacy.nanosAsLong) → µs TimestampType, exact.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load tables and register them as temp views (for spark.sql paths)."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
