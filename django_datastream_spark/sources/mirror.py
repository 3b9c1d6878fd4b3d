"""Shared machinery for txn MIRRORS of foreign-format tables.

A mirror is a txn table whose every commit came from adopt/refresh of
ONE foreign log (``adopt-delta``/``adopt-delta-refresh`` or
``adopt-iceberg``/``adopt-iceberg-refresh``) — the conversion hub's
invariant. This module holds the two pieces both formats share, so
the pure-mirror rule and the deletion-vector diff semantics live in
exactly one place:

- :func:`mirror_lineage` — the pure-mirror check, tolerant of
  commits released by ``txn_log_cleanup`` (a released commit can no
  longer attest lineage, but it can no longer serve a read either —
  the check covers the remaining window, same horizon rule as every
  other below-horizon read).
- :func:`refresh_mirror` — given the SOURCE's current state (live
  rels + per-file dead-position sets), diff against the mirror head
  and commit ONE refresh: live-set adds/removes, deletion-vector
  growth as a fresh ``_dv`` sidecar (union with the mirrored entries
  reproduces exactly the source sets, since growth is enforced), and
  the schema when it changed. Vectors that SHRANK (RESTORE/rollback)
  fail closed — the txn union fold cannot un-delete.

Scale: everything is metadata-plane; DV positions pass through the
driver bounded by changed-vector cardinality (the same documented
bound as the publish-side exports).
"""

from __future__ import annotations

import os
import uuid as _uuid

from .fileio import io_for


def mirror_lineage(root: str, ops: tuple) -> bool:
    """True iff the txn table at ``root`` is a pure mirror: every
    STILL-PRESENT commit's op is in ``ops`` (and at least one commit
    is readable). Commits released by ``txn_log_cleanup`` are
    skipped — they cannot attest lineage, and cannot serve reads
    either."""
    from .. import txnlog as TL

    head = TL.latest_version(root)
    if head == 0:
        return False
    seen = False
    for v in range(1, head + 1):
        try:
            c = TL._read_commit(root, v)
        except FileNotFoundError:
            continue  # released by txn_log_cleanup
        seen = True
        if c.get("op") not in ops:
            return False
    return seen


def require_mirror(root: str, ops: tuple, source: str) -> None:
    from .. import txnlog as TL

    if not TL.is_txn_table(root):
        raise ValueError(
            f"{root}: not a txn table — adopt_{source} first"
        )
    if not mirror_lineage(root, ops):
        raise ValueError(
            f"{root}: txn table is not a pure {source} mirror — "
            "refresh would clobber engine writes; keep converted "
            "mirrors read-only, or re-adopt into a fresh root"
        )


def mirror_dead_sets(root: str) -> dict:
    """rel -> set of dead positions the mirror head records, decoded
    from the txn ``_dv`` sidecars (driver-side, bounded by DV
    cardinality)."""
    import pyarrow.parquet as _pq

    from .. import txnlog as TL
    from .delta import _dv_sidecar_tables

    io = io_for(root)
    _hv, dvm = TL.snapshot_dv(root)
    out: dict = {}
    for f, es in dvm.items():
        dead: set = set()
        for e in es:
            for t in _dv_sidecar_tables(root, e["dv"], io, _pq):
                dead.update(
                    p
                    for ff, p in zip(
                        t.column("file").to_pylist(),
                        t.column("pos").to_pylist(),
                    )
                    if ff == f
                )
        out[f] = dead
    return out


def refresh_mirror(
    spark,
    root: str,
    op: str,
    rels: set,
    dv_now: dict,
    schema_now: str | None,
    exc_cls: type,
    writer: str,
) -> int:
    """Diff the source state against the mirror head and commit ONE
    refresh (see module docstring). Returns the committed version —
    the unchanged head when the mirror is already current."""
    from .. import txnlog as TL

    io = io_for(root)
    head = TL.latest_version(root)
    _hv, live = TL.snapshot(root)
    dead_mirror = mirror_dead_sets(root)
    adds_l = sorted(rels - live)
    removes_l = sorted(live - rels)
    changed: dict = {}
    for f in sorted(rels):
        dd = dv_now.get(f, set())
        if f in live:
            td = dead_mirror.get(f, set())
            if dd == td:
                continue
            if not dd >= td:
                raise exc_cls(
                    f"deletion set for {f} SHRANK since adoption (a "
                    "restore/rollback un-deleted rows) — the txn "
                    "fold unions vectors and cannot un-delete; "
                    "re-adopt into a fresh mirror"
                )
            changed[f] = dd
        elif dd:
            changed[f] = dd  # new file arriving with a vector
    schema_rec = (
        schema_now
        if schema_now is not None
        and schema_now != TL.table_schema_json(root)
        else None
    )
    if not adds_l and not removes_l and not changed and not schema_rec:
        return head  # mirror already current: no empty commits
    deletes = None
    if changed:
        import io as _bio

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        dv_rel = os.path.join(
            "_dv", f"refresh-{_uuid.uuid4().hex[:12]}"
        )
        rows_f: list = []
        rows_p: list = []
        for f in sorted(changed):
            for p in sorted(changed[f]):
                rows_f.append(f)
                rows_p.append(int(p))
        buf = _bio.BytesIO()
        _pq.write_table(
            _pa.table(
                {
                    "file": _pa.array(rows_f, _pa.string()),
                    "pos": _pa.array(rows_p, _pa.int64()),
                }
            ),
            buf,
        )
        # a DIRECTORY of parts like every txn sidecar (vacuum keeps
        # sidecars by their dir; a bare file would not be retained)
        io.put_bytes(
            os.path.join(root, dv_rel, "part-00000.parquet"),
            buf.getvalue(),
        )
        deletes = {
            f: {"dv": dv_rel, "n": len(ps)}
            for f, ps in changed.items()
        }
    return TL.commit(
        root,
        adds_l,
        removes_l,
        op,
        [],
        base_version=head,
        writer=writer,
        stats=TL.collect_file_stats(root, adds_l, spark=spark),
        deletes=deletes,
        schema_json=schema_rec,
    )
