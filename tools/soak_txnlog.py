"""Multi-writer soak for the txn log: N threads race append commits
against one table; prints per-writer commit latency and verifies the
final snapshot contains every row with contiguous versions.

Usage: python tools/soak_txnlog.py [writers] [commits_per_writer]
"""

from __future__ import annotations

import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

from django_datastream_spark import txnlog as TL  # noqa: E402
from django_datastream_spark.session import get_spark  # noqa: E402


def main() -> None:
    writers = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("txnlog-soak")
    table = tempfile.mkdtemp(prefix="txnsoak-")
    TL.init_table(table)
    lat: dict[int, list[float]] = {i: [] for i in range(writers)}
    errs: list[Exception] = []

    def run(w: int) -> None:
        for c in range(per):
            df = spark.createDataFrame(
                [(w * 10_000 + c, "p%d" % (c % 3), float(c))],
                "k long, p string, v double",
            )
            t0 = time.time()
            try:
                TL.txn_append(spark, df, table, ["p"], writer=f"w{w}")
            except Exception as e:  # noqa: BLE001 — report at exit
                errs.append(e)
                return
            lat[w].append(time.time() - t0)

    ts = [threading.Thread(target=run, args=(w,)) for w in range(writers)]
    t0 = time.time()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.time() - t0
    assert not errs, errs
    head = TL.latest_version(table)
    _, files = TL.snapshot(table)
    n = TL.txn_read(spark, table).count()
    total = writers * per
    assert head == total, (head, total)
    assert n == total, (n, total)
    flat = [x for xs in lat.values() for x in xs]
    flat.sort()
    print(
        "writers=%d commits=%d wall=%.1fs throughput=%.1f commits/s "
        "p50=%.2fs p95=%.2fs files=%d"
        % (
            writers,
            total,
            wall,
            total / wall,
            flat[len(flat) // 2],
            flat[int(len(flat) * 0.95)],
            len(files),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
