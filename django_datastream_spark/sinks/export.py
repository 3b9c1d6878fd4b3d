"""Sharded training-corpus export (reference: SURVEY §2.10 extension
surface — the hand-off from data prep to the tokenizer/trainer, which
wants many similarly-sized, reproducibly-assigned shards rather than one
giant file or partitioner-dependent splits).

Shard assignment is a deterministic per-row map (``xxhash64(id) mod
num_shards``), so the doc→shard mapping is stable across runs, cluster
sizes, and input partitionings — re-exporting after an upstream change
moves only the docs that changed shards, and a trainer can address
shard ``k`` of ``n`` without a manifest lookup. File size is bounded via
``maxRecordsPerFile`` (no driver-side counting pass at any scale).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FORMATS = ("jsonl", "parquet", "orc")


def export_corpus(
    df: DataFrame,
    path: str,
    fmt: str = "jsonl",
    num_shards: int = 16,
    id_col: str = "doc_id",
    max_rows_per_file: int | None = None,
) -> dict:
    """Write ``df`` as ``num_shards`` deterministic shards under
    ``path/shard=K/``; returns the manifest (also written to
    ``path/_manifest.json``).

    Scale shape: one hash repartition on the shard id (the only shuffle),
    then a streaming write; ``maxRecordsPerFile`` splits oversized shards
    during the write itself. The manifest is built from a driver-side
    file listing — O(number of files), never a data scan.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
    ).repartition(num_shards, "shard")
    writer = sharded.write.mode("overwrite").partitionBy("shard")
    if max_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_rows_per_file)
    if fmt == "jsonl":
        writer.json(path)
    elif fmt == "orc":
        # ORC is built into Spark (no extra package): same columnar
        # pushdown/pruning story as parquet for Hive-ecosystem trainers
        writer.orc(path)
    else:
        writer.parquet(path)

    files = []
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.startswith(("_", ".")):
                continue
            p = os.path.join(root, n)
            files.append(
                {
                    "path": os.path.relpath(p, path),
                    "bytes": os.path.getsize(p),
                }
            )
    manifest = {
        "format": fmt,
        "num_shards": num_shards,
        "id_col": id_col,
        "schema": df.schema.jsonValue(),
        "files": files,
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read an exported corpus back (shard column included, typed via the
    manifest's saved schema so jsonl round-trips losslessly)."""
    from pyspark.sql.types import StructType

    with open(os.path.join(path, "_manifest.json")) as f:
        manifest = json.load(f)
    schema = StructType.fromJson(manifest["schema"])
    if manifest["format"] == "jsonl":
        df = spark.read.schema(schema).json(path)
    elif manifest["format"] == "orc":
        df = spark.read.orc(path)
    else:
        df = spark.read.parquet(path)
    return df
