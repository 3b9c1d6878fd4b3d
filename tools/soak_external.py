"""External-format CHURN soak: paced streaming readers and time-travel
reads RACE the idempotent sink, OPTIMIZE, checkpointing, log cleanup
and VACUUM / expire_snapshots on BOTH lakehouse formats for hundreds
to thousands of commits (VERDICT r9 item 5).

Per format, concurrently:
- the SINK thread lands batches through the exactly-once foreachBatch
  callable — every batch offered TWICE (worst-case redelivery) plus a
  stale replay after maintenance, so the ledger is exercised under
  churn, not just at the end;
- the READER thread drains the table through the paced streaming
  source (`maxFilesPerTrigger` / `maxSnapshotsPerTrigger`) into an
  accumulating parquet sink, looping availableNow runs (each run
  drains one paced slice, the source's documented trigger shape);
- the MAINTENANCE thread cycles OPTIMIZE → checkpoint → log cleanup →
  vacuum (Delta) / expire_snapshots → remove_orphan_files (Iceberg);
- the TIME-TRAVEL thread re-reads a retained pinned version/snapshot
  and re-checks it returns exactly its era's rows (or raises the
  documented unrecoverable error once maintenance dropped it — never
  wrong rows).

Invariants at the end (and progressively):
- the reader's accumulated output holds EVERY produced row EXACTLY
  once (no loss, no duplication at any offset — the exactly-once
  contract end to end through replays and maintenance);
- the sink ledger FLOOR survives maintenance: a replay of any old
  batch id is refused AFTER checkpoint/log-cleanup (Delta txn ledger)
  and AFTER expire_snapshots (Iceberg summary→property fold);
- the final table scan equals the produced set exactly.

Usage: python tools/soak_external.py [rounds] [fmt] [pace] [store]
  rounds: sink batches per format (default 60; raise for long soaks)
  fmt: delta | iceberg | both (default both)
  pace: maxFilesPerTrigger / maxSnapshotsPerTrigger for the reader
        (default 3 / 2; raise for long-horizon runs so reader wall
        stays O(commits/pace))
  store: posix (default) | fake — ``fake`` runs the WHOLE chain (sink,
        maintenance, paced reader, time travel) against a
        FakeObjectStore root with no POSIX path: every write is an
        object verb, the commit point is the store's conditional PUT,
        and the paced reader's worker processes get the pickled store
        via the ``fileio`` option. The round-11 write-seam soak.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import threading
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from django_datastream_spark.session import get_spark  # noqa: E402


def _make_root(prefix: str, fake: bool):
    """(root, extra reader options, cleanup) — a POSIX tmpdir, or a
    FakeObjectStore root registered under a fresh scheme."""
    from django_datastream_spark.sources import fileio as FIO

    if not fake:
        root = tempfile.mkdtemp(prefix=prefix)
        shutil.rmtree(root)
        return root, {}, lambda: None
    scheme = f"soak{uuid.uuid4().hex[:8]}"
    backing = tempfile.mkdtemp(prefix=prefix + "backing-")
    store = FIO.FakeObjectStore(scheme, backing)
    FIO.register_fileio(scheme, store)

    def _cleanup():
        FIO.unregister_fileio(scheme)
        shutil.rmtree(backing, ignore_errors=True)

    return f"{scheme}://tbl", {"fileio": FIO.encode_fileio(store)}, _cleanup


def _reader_offset(cp: str, key: str) -> int:
    """The paced reader's newest checkpointed offset field (``v`` for
    Delta, ``n`` for Iceberg) — what a production operator sizes
    retention against (retention must exceed consumer lag)."""
    import json as _json

    d = os.path.join(cp, "offsets")
    try:
        names = sorted(
            (n for n in os.listdir(d) if n.isdigit()), key=int
        )
    except FileNotFoundError:
        return -1
    for name in reversed(names):
        try:
            with open(os.path.join(d, name)) as f:
                lines = [ln.strip() for ln in f if ln.strip()]
            off = _json.loads(lines[-1])
            if isinstance(off, str):
                off = _json.loads(off)
            return int(off.get(key, -1))
        except Exception:  # noqa: BLE001  (torn write: try older)
            continue
    return -1


def _drain_paced(spark, fmt_name, table, cp, out, opts, stop_at_rows):
    """Loop availableNow runs of the paced source until the output
    holds stop_at_rows() rows or the flag flips; returns row count."""
    from django_datastream_spark.sources import external_stream as XS

    XS.register(spark)

    def one_run():
        r = spark.readStream.format(fmt_name).option("path", table)
        for k, v in opts.items():
            r = r.option(k, str(v))
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)

    while True:
        try:
            one_run()
        except Exception as e:  # noqa: BLE001
            # the table can be mid-commit/maintenance; retry briefly
            if "cleaned up" in str(e) or "expired" in str(e):
                raise
            time.sleep(0.2)
            continue
        try:
            n = spark.read.parquet(out).count()
        except Exception:  # noqa: BLE001  (no output yet)
            n = 0
        if n >= stop_at_rows():
            return n


def soak_delta(spark, rounds: int, pace: int = 3, fake: bool = False) -> dict:
    from django_datastream_spark.sources import delta as DL

    root, reader_opts, cleanup = _make_root("soak-delta-", fake)
    sink = DL.delta_streaming_sink(root, "soak", checkpoint_every=None)
    produced: set[int] = set()
    done = {"flag": False}
    errs: list[Exception] = []
    ROWS_PER = 20

    def df_of(b):
        return spark.createDataFrame(
            [(b * ROWS_PER + j, float(j)) for j in range(ROWS_PER)],
            "k long, v double",
        ).coalesce(1)

    def sinker():
        try:
            for b in range(rounds):
                sink(df_of(b), b)
                sink(df_of(b), b)  # immediate worst-case redelivery
                produced.update(b * ROWS_PER + j for j in range(ROWS_PER))
                if b % 7 == 3 and b > 7:
                    sink(df_of(b - 5), b - 5)  # stale replay
        except Exception as e:  # noqa: BLE001
            errs.append(e)
        finally:
            done["flag"] = True

    def maintainer():
        # retention-vs-lag: cleanup keeps a commit tail deeper than
        # the reader's worst lag + batch span (the keep_commits knob
        # this soak motivated), and vacuum only runs once the reader
        # has consumed the rewrite-candidate era — exactly how a
        # production operator sizes retention against consumers
        last_head = -1
        while not done["flag"]:
            try:
                vs = DL.delta_versions(root)
                reader_at = _reader_offset(cp, "v")
                # throttle: a cycle per ~8 new commits, else OPTIMIZE
                # itself becomes a commit storm the paced reader must
                # chase (every maintenance commit is a reader trigger)
                if vs and max(vs) - last_head >= 8:
                    DL.optimize_delta(
                        spark, root, target_file_bytes=1 << 22
                    )
                    head = max(DL.delta_versions(root))
                    last_head = head
                    DL.write_delta_checkpoint(root, head)
                    DL.cleanup_delta_log(root, keep_commits=40)
                    if reader_at >= head - 1:
                        DL.vacuum_delta(root, keep_versions=2)
            except (FileExistsError, Exception):  # noqa: BLE001
                pass  # rival commit / mid-write fold: next cycle
            time.sleep(1.0)

    def traveler():
        while not done["flag"]:
            try:
                vs = DL.delta_versions(root)
                if vs:
                    v = vs[len(vs) // 2]
                    got = DL.read_delta(spark, root, version=v).count()
                    assert got % ROWS_PER == 0, (v, got)
            except Exception:  # noqa: BLE001
                pass  # vacuumed-era pins may raise: documented
            time.sleep(0.4)

    out = tempfile.mkdtemp(prefix="soak-delta-out-")
    shutil.rmtree(out)
    cp = tempfile.mkdtemp(prefix="soak-delta-cp-")
    threads = [
        threading.Thread(target=sinker),
        threading.Thread(target=maintainer),
        threading.Thread(target=traveler),
    ]
    for t in threads:
        t.start()
    n = _drain_paced(
        spark, "delta_table", root, cp, out,
        {"maxFilesPerTrigger": pace, **reader_opts},
        lambda: len(produced) if done["flag"] else len(produced) + 1,
    )
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    # exactly-once at every offset
    rows = [r["k"] for r in spark.read.parquet(out).select("k").collect()]
    assert len(rows) == len(set(rows)), "duplicated rows in the feed"
    assert set(rows) == produced, (
        f"feed lost {len(produced - set(rows))} rows / "
        f"gained {len(set(rows) - produced)}"
    )
    # final scan == produced set
    final = {r["k"] for r in DL.read_delta(spark, root).collect()}
    assert final == produced
    # ledger floor after maintenance: stale replays still refuse
    before = max(DL.delta_versions(root))
    sink(df_of(0), 0)
    assert max(DL.delta_versions(root)) == before, "ledger floor lost"
    cleanup()
    return {
        "format": "delta", "rows": n, "commits": before + 1,
        "store": "fake" if fake else "posix",
    }


def soak_iceberg(spark, rounds: int, pace: int = 2, fake: bool = False) -> dict:
    from django_datastream_spark.sources import iceberg as IB

    root, reader_opts, cleanup = _make_root("soak-ice-", fake)
    sink = IB.iceberg_streaming_sink(root, "soak")
    produced: set[int] = set()
    done = {"flag": False}
    errs: list[Exception] = []
    ROWS_PER = 20

    def df_of(b):
        return spark.createDataFrame(
            [(b * ROWS_PER + j, float(j)) for j in range(ROWS_PER)],
            "k long, v double",
        ).coalesce(1)

    def sinker():
        try:
            for b in range(rounds):
                sink(df_of(b), b)
                sink(df_of(b), b)
                produced.update(b * ROWS_PER + j for j in range(ROWS_PER))
                if b % 7 == 3 and b > 7:
                    sink(df_of(b - 5), b - 5)
        except Exception as e:  # noqa: BLE001
            errs.append(e)
        finally:
            done["flag"] = True

    def maintainer():
        # expiry honors the reader: only expire snapshots the paced
        # reader has consumed (its lineage position from the stream
        # checkpoint) — retention must exceed consumer lag, the same
        # rule the Delta side sizes keep_commits by
        while not done["flag"]:
            time.sleep(0.5)
            try:
                snaps = IB.iceberg_snapshots(root)
                reader_at = _reader_offset(cp, "n")
                lag = len(snaps) - max(0, reader_at)
                if len(snaps) >= 10 and lag < 5:
                    IB.expire_snapshots(root, keep_snapshots=5)
                    # default staging grace: a zero grace would sweep
                    # a LIVE writer's _staging_* mid-write (the knob's
                    # whole purpose is protecting racing writers)
                    IB.remove_orphan_files(root)
            except Exception:  # noqa: BLE001
                pass
        # final cycle at quiescence (the supported multi-writer shape)
        try:
            IB.expire_snapshots(root, keep_snapshots=3)
        except Exception:  # noqa: BLE001
            pass

    def traveler():
        while not done["flag"]:
            try:
                snaps = IB.iceberg_snapshots(root)
                if snaps:
                    sid = snaps[len(snaps) // 2]["snapshot_id"]
                    IB.read_iceberg(spark, root, snapshot_id=sid).count()
            except Exception:  # noqa: BLE001
                pass  # expired-era pins raise: documented
            time.sleep(0.4)

    out = tempfile.mkdtemp(prefix="soak-ice-out-")
    shutil.rmtree(out)
    cp = tempfile.mkdtemp(prefix="soak-ice-cp-")
    threads = [
        threading.Thread(target=sinker),
        threading.Thread(target=maintainer),
        threading.Thread(target=traveler),
    ]
    for t in threads:
        t.start()
    n = _drain_paced(
        spark, "iceberg_table", root, cp, out,
        {"maxSnapshotsPerTrigger": pace, **reader_opts},
        lambda: len(produced) if done["flag"] else len(produced) + 1,
    )
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    rows = [r["k"] for r in spark.read.parquet(out).select("k").collect()]
    assert len(rows) == len(set(rows)), "duplicated rows in the feed"
    assert set(rows) == produced, (
        f"feed lost {len(produced - set(rows))} rows / "
        f"gained {len(set(rows) - produced)}"
    )
    final = {r["k"] for r in IB.read_iceberg(spark, root).collect()}
    assert final == produced
    # ledger floor survives expire_snapshots (summary → property fold)
    assert IB.last_sink_batch(root, "soak") == rounds - 1
    before = len(IB.iceberg_snapshots(root))
    sink(df_of(0), 0)
    assert len(IB.iceberg_snapshots(root)) == before, "ledger floor lost"
    cleanup()
    return {
        "format": "iceberg", "rows": n,
        "batches": rounds, "snapshots_kept": before,
        "store": "fake" if fake else "posix",
    }


def main() -> None:
    import json

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    fmt = sys.argv[2] if len(sys.argv) > 2 else "both"
    fake = len(sys.argv) > 4 and sys.argv[4] == "fake"
    spark = get_spark("external-soak")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    t0 = time.time()
    if fmt in ("delta", "both"):
        pace = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        out.append(soak_delta(spark, rounds, pace, fake=fake))
    if fmt in ("iceberg", "both"):
        pace = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        out.append(soak_iceberg(spark, rounds, pace, fake=fake))
    print(json.dumps({
        "soak": "external", "rounds": rounds,
        "store": "fake" if fake else "posix",
        "wall_s": round(time.time() - t0, 1), "results": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
