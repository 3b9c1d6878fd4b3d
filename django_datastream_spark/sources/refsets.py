"""Cross-log data-file reference sets for MULTI-LOG roots.

One root can carry up to three metadata trees describing the SAME
immutable data files: the engine's txn log (``_txn_log``), a Delta log
(``_delta_log``) and an Iceberg tree (``metadata/``). Dual- and
triple-log roots are the normal product of this package's zero-copy
workflows — ``adopt_delta``/``adopt_iceberg`` (foreign log -> txn
mirror), ``publish_delta``/``publish_iceberg`` (txn -> foreign log)
and ``sources.convert`` (foreign log -> foreign log through the txn
hub, the UniForm-shaped migration path).

The retention hazard those roots create: each log's maintenance verb
(``vacuum_delta``, ``expire_snapshots``, ``remove_orphan_files``,
``txn_vacuum``) computes liveness from ITS OWN history only, so a
file dropped from one log's retained window but still referenced by a
sibling's remaining history would be deleted out from under the
sibling — Delta time travel serving ``FileNotFoundError``, an Iceberg
snapshot with dangling manifest entries. At deployment scale this is
the first thing a UniForm-style user hits: vacuum the Delta side of a
converted table and the Iceberg copy breaks silently.

The rule every maintenance verb applies: **a data file is deletable
only when NO coexisting log's remaining history references it.** The
functions here compute "remaining history" per log — exactly what
that log itself can still serve (commits/snapshots already expired or
log-cleaned protect nothing: reads below those horizons raise, never
mis-read). Reclaiming shared files therefore requires tightening
retention on EVERY log (or deleting the secondary tree) — the
documented contract, matching what real lakehouse co-publishing
(Delta UniForm; public docs) asks of operators.

Scale note: every fold here is metadata-plane — commit JSONs, Avro
manifests and checkpoint footers through the root's FileIO, bounded
by log length, never a data scan. All returned paths are root-relative
``os.path.normpath`` form; references resolving OUTSIDE the root
(absolute-URI manifests of a foreign table) are skipped — a sibling
cannot protect what does not live under this root, and the verbs here
never delete outside the root either.
"""

from __future__ import annotations

import json
import os
import urllib.parse

from .fileio import io_for
from .fileio import norm_path as _np

# top-level directories that are METADATA PLANES of a (possibly
# coexisting) log, plus live staging — a data-file walk must never
# treat their contents as reclaimable data (txn checkpoints use `.pq`
# to self-exempt, but Delta checkpoints are spec-named `.parquet` and
# CDF/position-delete exports are plain parquet)
METADATA_DIRS = (
    "_delta_log",
    "_change_data",
    "_dv",
    "_txn_log",
    "metadata",
    "pub-deletes",
)


def _rel_under(root: str, resolved: str) -> str | None:
    """``resolved`` as a root-relative normpath, or None if it lives
    outside ``root``."""
    rootn = _np(root)
    rn = _np(resolved)
    if not rn.startswith(rootn + os.sep):
        return None
    return os.path.normpath(rn[len(rootn) + 1:])


def delta_referenced(root: str) -> set[str]:
    """Every data file / DV sidecar the Delta log's REMAINING history
    references (all still-present commit JSONs plus the newest
    checkpoint's snapshot — what ``delta_versions`` time travel can
    still serve). Root-relative normpaths."""
    from . import roaring as RB
    from .delta import (
        _commit_versions,
        _last_checkpoint_version,
        _log_dir,
        delta_snapshot,
    )

    io = io_for(root)
    if not io.is_dir(_log_dir(root)):
        return set()
    refs: set[str] = set()

    def _take(add: dict) -> None:
        refs.add(
            os.path.normpath(urllib.parse.unquote(add["path"]))
        )
        dv = add.get("deletionVector")
        if dv and dv.get("storageType") == "u":
            refs.add(
                os.path.normpath(
                    RB.dv_relative_path(dv["pathOrInlineDv"])
                )
            )

    # commit JSONs: raw action scan (no per-version fold — O(log))
    log = _log_dir(root)
    for v in _commit_versions(root):
        raw = io.read_bytes(os.path.join(log, f"{v:020d}.json"))
        for line in raw.splitlines():
            if not line.strip():
                continue
            act = json.loads(line)
            if "add" in act:
                _take(act["add"])
            elif "cdc" in act:
                refs.add(
                    os.path.normpath(
                        urllib.parse.unquote(act["cdc"]["path"])
                    )
                )
    # a cleaned log folds from the checkpoint: its snapshot is the
    # floor of what remains reachable
    cp = _last_checkpoint_version(root, None)
    if cp is not None:
        _ver, _md, adds = delta_snapshot(root, cp)
        for a in adds:
            _take(a)
    return refs


def iceberg_referenced(root: str) -> set[str]:
    """Every file the CURRENT Iceberg metadata's snapshots reference:
    manifest lists, manifests, data and delete files (expired
    snapshots' manifest lists are already gone — time travel to them
    raises, so they protect nothing). Root-relative normpaths."""
    from . import avro_lite as AV
    from .iceberg import (
        _meta_dir,
        _metadata_versions,
        _resolve,
        iceberg_metadata,
    )

    io = io_for(root)
    if not io.is_dir(_meta_dir(root)):
        return set()
    if not _metadata_versions(root=root):
        return set()  # a bare metadata/ dir is not an Iceberg tree
    # NO error swallowing past this point: this set gates DELETION —
    # an unreadable sibling tree must abort the maintenance call
    # (fail closed), never silently protect nothing
    md = iceberg_metadata(root)
    refs: set[str] = set()
    for s in md.get("snapshots", []):
        ml = _resolve(root, md, s["manifest-list"])
        rel = _rel_under(root, ml)
        if rel is not None:
            refs.add(rel)
        _s, mans = AV.read_container_file(ml)
        for mf in mans:
            mp = _resolve(root, md, mf["manifest_path"])
            mrel = _rel_under(root, mp)
            if mrel is not None:
                refs.add(mrel)
            _s2, entries = AV.read_container_file(mp)
            for e in entries:
                frel = _rel_under(
                    root,
                    _resolve(root, md, e["data_file"]["file_path"]),
                )
                if frel is not None:
                    refs.add(frel)
    return refs


def txn_referenced(root: str) -> tuple[set[str], set[str]]:
    """Every data file the txn log's remaining history references,
    plus the DV sidecar DIRECTORIES (sidecars are Spark-written
    directories of parts, referenced by dir in the log). Returns
    ``(files, dv_dirs)`` — both root-relative normpaths. History =
    the head fold plus every still-present commit's adds (versions
    swept by log checkpointing are unreachable and protect nothing).
    """
    from .. import txnlog as TL

    if not TL.is_txn_table(root):
        return set(), set()
    files: set[str] = set()
    dv_dirs: set[str] = set()
    head = TL.latest_version(root)
    # every remaining CHECKPOINT is a complete live-set snapshot some
    # still-serveable fold starts from — take its file list directly
    # (one columnar read each, no fold)
    log = TL._log_dir(root)
    cps = TL._cp_list(log)
    for cpv in cps:
        # fail closed: an unreadable checkpoint means this set would
        # under-protect — abort the maintenance call instead
        _v, tbl = TL._fold_arrow(root, cpv)
        files |= {
            os.path.normpath(r)
            for r in tbl.column("rel").to_pylist()
        }
        for es in TL._dv_from_arrow(tbl).values():
            dv_dirs |= {os.path.normpath(e["dv"]) for e in es}
    if not cps:
        _v, m, dvm = TL._fold(root, head)
        files |= {os.path.normpath(r) for r in m}
        for es in dvm.values():
            dv_dirs |= {os.path.normpath(e["dv"]) for e in es}
    for v in range(1, head + 1):
        try:
            c = TL._read_commit(root, v)
        except FileNotFoundError:
            continue  # released by txn_log_cleanup: cannot serve reads
        # any OTHER read/parse error fails closed (deletion gate)
        files |= {
            os.path.normpath(r) for r in c.get("adds") or []
        }
        for es in (c.get("deletes") or {}).values():
            entries = es if isinstance(es, list) else [es]
            dv_dirs |= {
                os.path.normpath(e["dv"])
                for e in entries
                if isinstance(e, dict) and e.get("dv")
            }
    return files, dv_dirs


def sibling_referenced(
    root: str, exclude: str
) -> tuple[set[str], set[str]]:
    """Union of the reference sets of every log at ``root`` EXCEPT
    ``exclude`` (``"delta"`` | ``"iceberg"`` | ``"txn"`` — the log
    whose own maintenance verb is asking). Returns ``(files,
    dir_prefixes)``: a candidate is protected when it IS a referenced
    file or sits under a referenced directory prefix."""
    files: set[str] = set()
    dirs: set[str] = set()
    if exclude != "delta":
        files |= delta_referenced(root)
    if exclude != "iceberg":
        files |= iceberg_referenced(root)
    if exclude != "txn":
        t_files, t_dirs = txn_referenced(root)
        files |= t_files
        dirs |= t_dirs
    return files, dirs


def is_protected(
    rel: str, files: set[str], dirs: set[str]
) -> bool:
    """True when root-relative ``rel`` is sibling-referenced."""
    r = os.path.normpath(rel)
    if r in files:
        return True
    return any(
        r.startswith(d + os.sep) for d in dirs
    )
