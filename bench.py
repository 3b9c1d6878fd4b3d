"""Benchmark harness — runs the declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (computes the full plan,
no driver collect/Arrow cost in the timing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from django_datastream_spark.plans import declared
    from django_datastream_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so q01 isn't charged for session spin-up
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()

    timings: dict[str, float] = {}
    for name, fn in declared.QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    line = json.dumps(
        {
            "metric": "declared_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_val,
        }
    )
    # artifact hardening (BENCH_r04/r05 parsed as null driver-side):
    # stop Spark FIRST so no progress-bar/console-sink '\r' noise can
    # land on stdout around the JSON line, write the same JSON to a
    # file (mirroring tools/verify_local.py's VERIFY_LOCAL_JSON), and
    # only then print it — flushed, on its own line.
    spark.stop()
    out_json = os.environ.get("SPARK_GRAFT_BENCH_JSON")
    if out_json:
        with open(out_json, "w") as f:
            f.write(line + "\n")
    sys.stdout.write("\n" + line + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    run()
