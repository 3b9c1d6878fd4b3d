"""Micro-bench: what the bloom index buys at sf0.1.

Builds a txn table from the events table INTERLEAVED by event_id % 8
(every file spans the full key range, so min/max stats cannot prune a
point lookup), then measures:

- point lookup wall time without any index (scans every file)
- ``txn_bloom_build`` wall time (one task per file)
- the same lookup with the index (scans the true-positive file(s))
- kept/pruned file counts for the probe
- a 100-key CDC MERGE into an unindexed clone vs an indexed clone
  (the merge probe scans prune through the same index)

Usage: python tools/bench_bloom.py [sf_dir]
Prints one JSON line; writes $BENCH_BLOOM_JSON if set.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from django_datastream_spark import txnlog as TL  # noqa: E402
from django_datastream_spark.operators.merge import merge_into  # noqa: E402
from django_datastream_spark.session import get_spark  # noqa: E402
from django_datastream_spark.sources.testdata import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-bloom")
    base = tempfile.mkdtemp(prefix="benchbloom-")
    root = os.path.join(base, "t")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    n = ev.count()
    for r in range(8):
        TL.txn_append(
            spark,
            ev.filter(F.col("event_id") % 8 == r).coalesce(1),
            root,
            [],
        )
    probe = n // 2  # event_ids are dense from 1
    t0 = time.time()
    c0 = TL.txn_read(spark, root, where={"event_id": probe}).count()
    t_noidx = time.time() - t0

    t0 = time.time()
    built = TL.txn_bloom_build(spark, root, ["event_id"])
    t_build = time.time() - t0

    _, kept, pruned = TL.prune_files(root, {"event_id": probe})
    t0 = time.time()
    c1 = TL.txn_read(spark, root, where={"event_id": probe}).count()
    t_idx = time.time() - t0
    assert c0 == c1 == 1, (c0, c1)

    # CDC merge: same 100-key batch into unindexed vs indexed clones
    batch = (
        ev.filter(F.col("event_id") % (n // 100) == 0)
        .limit(100)
        .withColumn("value", F.lit(-1.0))
    )
    t1r, t2r = os.path.join(base, "c1"), os.path.join(base, "c2")
    TL.txn_clone(root, t1r)
    shutil.rmtree(os.path.join(TL._local_root(t1r), "_bloom"),
                  ignore_errors=True)  # clone without the index
    TL.txn_clone(root, t2r)
    t0 = time.time()
    merge_into(spark, t1r, batch, ["event_id"], [], txn=True)
    t_merge_noidx = time.time() - t0
    t0 = time.time()
    merge_into(spark, t2r, batch, ["event_id"], [], txn=True)
    t_merge_idx = time.time() - t0

    out = {
        "sf_dir": sf_dir,
        "rows": n,
        "files": 8,
        "indexed_files": built["indexed_files"],
        "bloom_build_s": round(t_build, 2),
        "lookup_noindex_s": round(t_noidx, 2),
        "lookup_indexed_s": round(t_idx, 2),
        "kept_files": len(kept),
        "pruned_files": len(pruned),
        "merge100_noindex_s": round(t_merge_noidx, 2),
        "merge100_indexed_s": round(t_merge_idx, 2),
    }
    print(json.dumps(out))
    path = os.environ.get("BENCH_BLOOM_JSON")
    if path:
        with open(path, "w") as f:
            json.dump(out, f)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
