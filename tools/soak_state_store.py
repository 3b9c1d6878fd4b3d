"""100x-state streaming soak: HDFS-backed vs RocksDB state store on a
large-keyspace streaming dedup (VERDICT r7 #4).

The r7 decision kept the HDFS-backed default from a GATE-scale
measurement (~1e5 state rows) and ARGUED that RocksDB wins at 100x
state; this soak measures that claim: an unbounded ``dropDuplicates``
over >= 1e7 distinct long keys, replayed availableNow in fixed file
batches, per-batch wall cost and state-operator metrics recorded from
the query progress for BOTH providers (RocksDB additionally with
changelog checkpointing, its at-scale configuration). Dedup is the
purest 1e7-entry state shape — every key becomes a state-store row
that every subsequent batch's snapshot/changelog must carry.

Usage: python tools/soak_state_store.py [n_keys] [n_batches] [state_partitions]
Defaults: 10_000_000 keys, 8 batches, 32 partitions. Prints a
per-provider table + one JSON line; results recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from django_datastream_spark.session import (  # noqa: E402
    get_spark,
    streaming_state,
)

CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def build_source(spark, src: str, n_keys: int, n_batches: int) -> int:
    """n_keys unique long keys + 25% duplicates, written as
    ``4 * n_batches`` files so maxFilesPerTrigger=4 yields exactly
    ``n_batches`` micro-batches; contiguous id ranges per file mean
    state grows ~linearly across the replay."""
    n_rows = n_keys + n_keys // 4
    (
        spark.range(0, n_rows, 1, 4 * n_batches)
        .select(
            (F.col("id") % n_keys).alias("k"),
            (F.col("id") * 7 % 1000).cast("double").alias("v"),
        )
        .write.option("maxRecordsPerFile", 2_000_000_000)
        .parquet(src, mode="overwrite")
    )
    return n_rows


def run(spark, provider, src, cp, state_partitions):
    stream = spark.readStream.schema("k long, v double").option(
        "maxFilesPerTrigger", 4
    ).parquet(src)
    dedup = stream.dropDuplicates(["k"])  # unbounded keyed state
    seen = []

    def fb(df, bid):
        seen.append((bid, df.count()))

    if provider == "rocksdb":
        spark.conf.set(CHANGELOG_KEY, "true")
    t0 = time.time()
    try:
        with streaming_state(
            spark, provider=provider, state_partitions=state_partitions
        ):
            q = (
                dedup.writeStream.foreachBatch(fb)
                .option("checkpointLocation", cp)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if provider == "rocksdb":
            spark.conf.unset(CHANGELOG_KEY)
    wall = time.time() - t0
    batches = []
    for p in q.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "batch": p["batchId"],
                "ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "state_rows": so.get("numRowsTotal"),
                "state_mem_mb": round(
                    (so.get("memoryUsedBytes") or 0) / 1e6, 1
                ),
                "commit_ms": (p.get("durationMs") or {}).get(
                    "commitOffsets"
                ),
            }
        )
    distinct_out = sum(n for _, n in seen)
    return {
        "provider": provider or "hdfs",
        "wall_s": round(wall, 1),
        "distinct_out": distinct_out,
        "final_state_rows": batches[-1]["state_rows"] if batches else None,
        "batches": batches,
    }


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("state-soak")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="statesoak-")
    src = f"{base}/src"
    build_source(spark, src, n_keys, n_batches)
    results = []
    for provider in (None, "rocksdb"):
        cp = f"{base}/cp-{provider or 'hdfs'}"
        r = run(spark, provider, src, cp, parts)
        assert r["distinct_out"] == n_keys, r["distinct_out"]
        results.append(r)
        print(f"\n=== {r['provider']}  wall={r['wall_s']}s  "
              f"state={r['final_state_rows']} rows ===")
        for b in r["batches"]:
            print(f"  batch {b['batch']}: {b['ms']} ms  "
                  f"state_rows={b['state_rows']}  "
                  f"mem={b['state_mem_mb']} MB")
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({
        "n_keys": n_keys, "n_batches": n_batches,
        "state_partitions": parts,
        "results": [
            {k: v for k, v in r.items() if k != "batches"}
            for r in results
        ],
    }))


if __name__ == "__main__":
    main()
