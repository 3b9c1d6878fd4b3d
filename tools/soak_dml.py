"""DML soak for the txn log: concurrent APPEND writers race row-level
DELETE/UPDATE writers, a periodic OPTIMIZE compactor, and a periodic
RESTORE roll-backer against one table — every append passing through
an enforced CHECK constraint — with conflicting losers retrying; then
the final state is checked against the log (the ground truth).

Invariants verified:
- commit versions are contiguous 1..head (no lost or torn commit)
- no key duplicated (exactly-once appends through rebases + restores)
- txn_count (metadata) == actual scan count
- a violating append still refuses mid-soak (constraint enforced)
- after optimize+vacuum the table still reads identically
- a bloom indexer racing every writer (and a mid-soak vacuum that can
  unlink files under its feet) never fails, and point lookups through
  whatever index state it left match the full scan for every key

Usage: python tools/soak_dml.py [appenders] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

from django_datastream_spark import txnlog as TL  # noqa: E402
from django_datastream_spark.session import get_spark  # noqa: E402


def main() -> None:
    appenders = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("txn-dml-soak")
    table = tempfile.mkdtemp(prefix="txndml-")
    TL.init_table(table)
    TL.txn_add_constraint(spark, table, "v_nonneg", "v >= 0")
    errs: list[Exception] = []
    conflicts = {"n": 0}

    def appender(w: int) -> None:
        for c in range(rounds):
            df = spark.createDataFrame(
                [
                    (w * 100_000 + c * 10 + j, float(j), 0)
                    for j in range(10)
                ],
                "k long, v double, gen int",
            )
            try:
                TL.txn_append(spark, df, table, [], writer=f"app{w}")
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return

    def _wait_for_data() -> None:
        t0 = time.time()
        while TL.latest_version(table) < 1 and time.time() - t0 < 120:
            time.sleep(0.3)

    def deleter() -> None:
        _wait_for_data()
        for c in range(rounds):
            for _attempt in range(10):
                try:
                    r = TL.txn_delete(
                        spark, table, f"k % 7 = {c % 7} and gen = 0",
                        writer="del",
                    )
                    if r["deleted_rows"] == 0:
                        time.sleep(0.5)  # nothing matched yet: re-try
                        continue
                    break
                except TL.CommitConflictError:
                    conflicts["n"] += 1
                    time.sleep(0.1)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)
                    return

    def updater() -> None:
        _wait_for_data()
        for c in range(rounds):
            for _attempt in range(10):
                try:
                    r = TL.txn_update(
                        spark, table, f"k % 5 = {c % 5} and gen = 0",
                        {"gen": "gen + 1"}, writer="upd",
                    )
                    if r["updated_rows"] == 0:
                        time.sleep(0.5)
                        continue
                    break
                except TL.CommitConflictError:
                    conflicts["n"] += 1
                    time.sleep(0.1)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)
                    return

    def compactor() -> None:
        _wait_for_data()
        for _c in range(max(1, rounds // 2)):
            time.sleep(1.0)
            for _attempt in range(10):
                try:
                    TL.txn_optimize(spark, table, writer="opt")
                    # mid-soak vacuum with retention: superseded files
                    # vanish UNDER the racing bloom indexer, which must
                    # skip them, never fail (restore targets head-2,
                    # inside the retained window)
                    TL.txn_vacuum(table, retain_versions=3)
                    break
                except TL.CommitConflictError:
                    conflicts["n"] += 1
                    time.sleep(0.2)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)
                    return

    def indexer() -> None:
        _wait_for_data()
        for _c in range(rounds):
            try:
                TL.txn_bloom_build(spark, table, ["k"])
                # a point lookup through whatever index state exists
                # must agree with an unindexed scan — both reads
                # pinned to ONE version so racing deletes can't fake
                # a miss (sidecars are per-immutable-file, so they
                # are truthful for every snapshot)
                v, files = TL.snapshot(table)
                if not files:
                    time.sleep(0.3)  # only the constraint commit yet
                    continue
                some = TL.txn_read(spark, table, version=v).limit(1).collect()
                if some:
                    k = some[0]["k"]
                    got = TL.txn_read(
                        spark, table, version=v, where={"k": k}
                    ).count()
                    assert got >= 1, f"indexed lookup lost k={k}"
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return
            time.sleep(0.3)

    def restorer() -> None:
        _wait_for_data()
        t0 = time.time()
        # rollback needs history to roll back over
        while TL.latest_version(table) < 4 and time.time() - t0 < 60:
            time.sleep(0.3)
        for _c in range(max(1, rounds // 2)):
            time.sleep(1.0)
            head = TL.latest_version(table)
            target = max(1, head - 2)
            for _attempt in range(10):
                try:
                    TL.txn_restore(table, target, writer="rst")
                    break
                except TL.CommitConflictError:
                    conflicts["n"] += 1
                    time.sleep(0.2)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)
                    return

    threads = [
        threading.Thread(target=appender, args=(w,)) for w in range(appenders)
    ] + [
        threading.Thread(target=deleter),
        threading.Thread(target=updater),
        threading.Thread(target=compactor),
        threading.Thread(target=restorer),
        threading.Thread(target=indexer),
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    assert not errs, errs

    head = TL.latest_version(table)
    # contiguity: every version 1..head readable
    ops = []
    for v in range(1, head + 1):
        c = TL._read_commit(table, v)
        ops.append((v, c["op"]))

    # model replay: apply committed snapshots' semantics via the log
    # itself at each version and check the FINAL read is consistent
    rows = {
        r["k"]: (r["v"], r["gen"])
        for r in TL.txn_read(spark, table).collect()
    }
    meta_count = TL.txn_count(spark, table)
    assert meta_count == len(rows), (meta_count, len(rows))
    # no key duplicated (exactly-once appends, update preserves identity)
    scan_n = TL.txn_read(spark, table).count()
    assert scan_n == len(rows), (scan_n, len(rows))

    # the CHECK constraint still enforces after the whole melee
    try:
        TL.txn_append(
            spark,
            spark.createDataFrame([(-1, -1.0, 0)], "k long, v double, gen int"),
            table,
            [],
        )
        raise AssertionError("violating append must refuse")
    except TL.ConstraintViolationError:
        pass

    # vacuum then re-read: identical
    removed = TL.txn_vacuum(table)
    rows2 = {
        r["k"]: (r["v"], r["gen"])
        for r in TL.txn_read(spark, table).collect()
    }
    assert rows2 == rows

    # every sampled key answers identically through the bloom index
    TL.txn_bloom_build(spark, table, ["k"])
    for k in list(rows)[:10]:
        got = {
            r["k"]: (r["v"], r["gen"])
            for r in TL.txn_read(spark, table, where={"k": k}).collect()
        }
        assert got == {k: rows[k]}, (k, got)

    out = {
        "appenders": appenders,
        "rounds": rounds,
        "head_version": head,
        "ops": {
            op: sum(1 for _, o in ops if o == op)
            for op in {o for _, o in ops}
        },
        "final_rows": len(rows),
        "conflict_retries": conflicts["n"],
        "vacuumed_files": len(removed),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(out))
    path = os.environ.get("SOAK_DML_JSON")
    if path:
        with open(path, "w") as f:
            json.dump(out, f)
    spark.stop()


if __name__ == "__main__":
    main()
