"""Delta Lake TABLE READER — external-lakehouse interop, from the
PUBLIC protocol spec (delta-io/delta PROTOCOL.md), no delta-spark jar.

A user migrating from an existing lakehouse has tables whose truth is
a ``_delta_log``: newline-delimited JSON commits
(``00000000000000000000.json`` …) carrying ``protocol`` / ``metaData``
/ ``add`` / ``remove`` actions, optionally compacted into parquet
checkpoints (``…checkpoint.parquet`` + ``_last_checkpoint``). This
module reads that format directly:

- :func:`delta_snapshot` — fold the log (newest usable checkpoint ≤
  version, then the JSON tail) into the LIVE file list + metadata,
  snapshot-isolated at any ``version`` (time travel).
- :func:`read_delta` — the snapshot as a DataFrame: data files read
  by Spark's parquet scan (pushdown/pruning intact), partition
  columns materialized from the log's ``partitionValues`` (Delta does
  NOT store partition columns in data files), schema from
  ``metaData.schemaString`` (a Spark JSON schema — loads verbatim).
- :func:`adopt_delta` — ZERO-COPY migration: commit the Delta
  snapshot's live files into one of this engine's txn tables
  (:mod:`..txnlog`) without rewriting a byte; from there every engine
  feature (skipping, bloom, DML, streaming) applies.

Honest boundaries (checked, never guessed): ``protocol`` reader
versions above 2 and reader table features beyond this module's
support raise; ``delta.columnMapping.mode`` other than ``none``
raises. DELETION VECTORS read: descriptors (inline / uuid-sidecar /
absolute-path) decode through :mod:`.roaring` (portable
RoaringBitmapArray, CRC-verified) and subtract as a
``(__file, __pos)`` anti-join over parquet ``_metadata.row_index`` —
the same shape as the engine's own ``txnlog`` DV read; unknown
storage types and format versions still fail closed. Multi-part
checkpoints are supported; a corrupt/unreadable checkpoint falls back
to the pure-JSON fold (the log is self-sufficient).

Scale notes (mirrors the engine's own txn fold design,
``txnlog.PARQUET_CHECKPOINT_AT`` / ``DISTRIBUTED_PRUNE_AT``): the
checkpoint fold is COLUMNAR — add actions stay an Arrow table end to
end (the tail's JSON commits fold as dicts, bounded by the checkpoint
interval), so a 10⁵–10⁶-add snapshot resolves without materializing
actions as driver Python objects; ``where=`` data skipping runs the
per-file stats test as a DISTRIBUTED Spark job above
:data:`DISTRIBUTED_PRUNE_AT` files, so only SURVIVING paths return to
the driver. The data scan is one ``parquet`` load per PARTITION VALUE
COMBINATION when the layout is not hive-style, but Delta writers emit
hive-style paths (``p=1/part-….parquet``), detected here and read as
ONE scan with ``basePath`` so Spark derives partition columns itself.
(One ``spark.read.parquet(*paths)`` call carries the surviving file
list — fine to ~10⁵ paths; past that, prune harder or adopt the table
into the txn layer, whose scan is built for it.)

STORAGE REACH: every metadata read goes through the injectable
FileIO seam (:mod:`.fileio` — scheme registry or explicit ``io=``;
executor-side decodes capture the driver-resolved object), so
object-store-resident tables read without a FUSE mount
(:class:`.fileio.HadoopFileIO` for s3a/gs/abfss via the JVM
connectors). Since round 11 the WRITE side routes through the same
seam: the streaming sink, OPTIMIZE, VACUUM, log cleanup, checkpoint
and CDF-export staging all run on a root with no POSIX path — data
stages through Spark's own writers at ``FileIO.spark_path`` and
promotes via ``move_file`` (rename on POSIX, server-side copy +
delete on object stores — safe because no reader follows a data file
until the log's ``put_if_absent`` commit references it), and commit
points go through :func:`..logstores.log_store_for` so commit + data
share one storage object. The engine's txn tier itself is seam-
routed too (txnlog ``_root``/``_store``/``_io``), so the FULL
produce→publish→read chain — txn_append with deletion vectors,
:func:`publish_delta`, :func:`read_delta` — runs on a root with no
POSIX path (tests/test_txn_object_store.py, gate q239).
"""

from __future__ import annotations

import json
import os
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .fileio import FileIO, io_for

_LOG = "_delta_log"
_SUPPORTED_READER_FEATURES = {
    # reader-version-3 tables list the features they need; we can
    # serve these (they don't change how adds/removes fold)
    "timestampNtz", "vacuumProtocolCheck", "v2Checkpoint",
    # deletion vectors READ: descriptors decode through
    # sources/roaring.py and apply as a (__file, __pos) anti-join
    "deletionVectors",
}

#: snapshots with at least this many live adds run ``where=`` data
#: skipping as a distributed Spark job (mirror of
#: ``txnlog.DISTRIBUTED_PRUNE_AT``); below it, a driver loop is faster
#: than a job launch.
DISTRIBUTED_PRUNE_AT = 10_000


def _adds_arrow_schema():
    """Canonical Arrow layout for live add-actions — the columnar
    in-memory form the fold produces (checkpoint columns cast into it,
    JSON-tail adds appended into it)."""
    import pyarrow as pa

    return pa.schema(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            (
                "deletionVector",
                pa.struct(
                    [
                        ("storageType", pa.string()),
                        ("pathOrInlineDv", pa.string()),
                        ("offset", pa.int32()),
                        ("sizeInBytes", pa.int32()),
                        ("cardinality", pa.int64()),
                    ]
                ),
            ),
        ]
    )


class DeltaUnsupportedError(RuntimeError):
    """The table needs a reader capability this module doesn't have —
    fail closed rather than return wrong rows."""


def _log_dir(root: str) -> str:
    return os.path.join(root, _LOG)


def _commit_versions(
    root: str, io: FileIO | None = None, after: int | None = None
) -> list[int]:
    """Commit versions in the log, via the FileIO seam. ``after``
    lists only versions > it — zero-padded names are key-ordered, so
    an object store serves this as a StartAfter range listing (the
    streaming sources' per-trigger cursor)."""
    io = io or io_for(root)
    out = []
    log = _log_dir(root)
    try:
        names = io.list_dir(
            log,
            start_after=(
                f"{after:020d}.json" if after is not None else None
            ),
        )
    except FileNotFoundError:
        raise DeltaUnsupportedError(f"{root}: no _delta_log") from None
    if not names and not io.is_dir(log):
        raise DeltaUnsupportedError(f"{root}: no _delta_log")
    for n in names:
        if n.endswith(".json") and len(n) == 25 and n[:20].isdigit():
            out.append(int(n[:20]))
    return sorted(out)


def _checkpoint_parts(
    root: str, v: int, io: FileIO | None = None
) -> list[str]:
    """Checkpoint file(s) for version v: classic single-file
    ``{v}.checkpoint.parquet``, multi-part
    ``{v}.checkpoint.{i}.{n}.parquet``, or a V2 UUID-named manifest
    ``{v}.checkpoint.{uuid}.parquet`` (whose ``sidecar`` actions the
    fold resolves separately). Multi-part sets are VALIDATED against
    the part count encoded in the names — a cleaned-up or half-written
    set must not fold silently as a partial snapshot (it would drop
    live files); an incomplete set raises and the caller falls back to
    the pure-JSON fold (or fails closed when the tail was cleaned up
    past the checkpoint)."""
    import re as _re

    io = io or io_for(root)
    log = _log_dir(root)
    single = os.path.join(log, f"{v:020d}.checkpoint.parquet")
    if io.exists(single):
        return [single]
    by_n: dict[int, dict[int, str]] = {}
    pat = _re.compile(
        rf"{v:020d}\.checkpoint\.(\d+)\.(\d+)\.parquet\Z"
    )
    v2pat = _re.compile(
        rf"{v:020d}\.checkpoint\.[A-Za-z0-9-]+\.parquet\Z"
    )
    stray = []
    v2 = []
    for name in io.list_dir(log):
        m = pat.match(name)
        if m:
            i, n = int(m.group(1)), int(m.group(2))
            by_n.setdefault(n, {})[i] = os.path.join(log, name)
        elif v2pat.match(name):
            v2.append(os.path.join(log, name))
        elif name.startswith(f"{v:020d}.checkpoint.") and name.endswith(
            ".parquet"
        ):
            stray.append(name)
    for n, parts in sorted(by_n.items()):
        if set(parts) == set(range(1, n + 1)):
            return [parts[i] for i in range(1, n + 1)]
    if v2 and not by_n:
        # a V2 checkpoint is one self-consistent manifest; multiple
        # UUID-named manifests for the same version are equivalent by
        # spec — pick deterministically
        return [sorted(v2)[0]]
    if by_n or stray:
        # recoverable (ValueError, not DeltaUnsupportedError): the
        # caller falls back to the pure-JSON fold when the tail covers
        raise ValueError(
            f"{root}: multi-part checkpoint {v} is incomplete "
            f"(found parts {sorted((i, n) for n, d in by_n.items() for i in d)}"
            f"{' + unparseable ' + str(stray) if stray else ''}) — "
            "refusing to fold a partial snapshot"
        )
    return []


def _last_checkpoint_version(
    root: str, version: int | None, io: FileIO | None = None
) -> int | None:
    """Newest checkpoint ≤ version: via ``_last_checkpoint`` when it
    qualifies, else a listing scan (time travel often needs an OLDER
    checkpoint than the advertised last one)."""
    io = io or io_for(root)
    log = _log_dir(root)
    cands = set()
    try:
        cands.add(
            int(
                json.loads(
                    io.read_text(os.path.join(log, "_last_checkpoint"))
                )["version"]
            )
        )
    except (OSError, ValueError, KeyError):
        pass
    try:
        names = io.list_dir(log)
    except FileNotFoundError:
        names = []
    for n in names:
        if ".checkpoint." in n and n.endswith(".parquet"):
            head = n.split(".checkpoint.")[0]
            if head.isdigit():
                cands.add(int(head))
    ok = [c for c in cands if version is None or c <= version]
    return max(ok) if ok else None


def _check_protocol(proto: dict) -> None:
    r = int(proto.get("minReaderVersion", 1))
    if r <= 2:
        return
    feats = set(proto.get("readerFeatures") or [])
    unsupported = feats - _SUPPORTED_READER_FEATURES
    if unsupported:
        raise DeltaUnsupportedError(
            f"table requires reader features {sorted(unsupported)} "
            "(deletion vectors / column mapping / row tracking are "
            "not implemented — fail closed)"
        )


def _apply_action(state: dict, action: dict) -> None:
    if "protocol" in action:
        _check_protocol(action["protocol"])
        state["protocol"] = action["protocol"]
    elif "metaData" in action:
        md = action["metaData"]
        mode = (md.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        if mode not in ("none", "name", "id"):
            raise DeltaUnsupportedError(
                f"delta.columnMapping.mode={mode} not supported"
            )
        state["metaData"] = md
    elif "add" in action:
        a = action["add"]
        state["files"][a["path"]] = a
        state["tombstones"].discard(a["path"])
    elif "remove" in action:
        p = action["remove"]["path"]
        state["files"].pop(p, None)
        # the removed file may live in the CHECKPOINT's (columnar) add
        # set rather than this dict — record the tombstone so the
        # merge step can filter it out of the Arrow side too
        state["tombstones"].add(p)


def _demap(action: dict) -> dict:
    """pyarrow reads parquet map<string,string> columns back as lists
    of (k, v) pairs; the JSON path yields dicts — normalize to dicts
    so the fold sees one shape."""
    out = dict(action)
    for key in ("partitionValues", "configuration"):
        v = out.get(key)
        if isinstance(v, list):
            out[key] = dict(v)
    return out


def _project_struct(arr, target):
    """Cast a struct array onto ``target`` (a struct type): known
    fields cast by NAME, missing fields null-fill, extra fields drop —
    checkpoint writers add columns (tags, stats_parsed, …) freely, so
    positional struct casts don't work."""
    import pyarrow as pa
    import pyarrow.compute as pc

    have = (
        {f.name for f in arr.type} if pa.types.is_struct(arr.type) else set()
    )
    children = []
    for f in target:
        if f.name in have:
            child = arr.field(f.name)
            if pa.types.is_struct(f.type):
                child = _project_struct(child, f.type)
            elif not child.type.equals(f.type):
                child = child.cast(f.type)
            children.append(child)
        else:
            children.append(pa.nulls(len(arr), f.type))
    mask = None
    if arr.null_count:
        mask = pc.is_null(arr)
    return pa.StructArray.from_arrays(
        children, fields=list(target), mask=mask
    )


def _fold_checkpoint_arrow(
    parts: list[str], io: FileIO | None = None
):
    """COLUMNAR checkpoint fold: (protocol, metaData, adds) where adds
    is an Arrow table in the canonical layout. The checkpoint's add
    rows are already the complete live set (its removes are tombstones
    for files NOT in the add set), so no per-row fold is needed — and
    the actions never materialize as driver Python objects, which is
    the difference between milliseconds and minutes at 10⁵–10⁶ files."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if io is None and parts:
        io = io_for(parts[0])
    schema = _adds_arrow_schema()
    proto = meta = None
    chunks = []
    parts = list(parts)
    seen_sidecars = False
    for p in parts:
        names = set(
            pq.ParquetFile(io.parquet_source(p)).schema_arrow.names
        )
        if "sidecar" in names and not seen_sidecars:
            # V2 checkpoint manifest: its sidecar actions name the
            # files (in _delta_log/_sidecars/) holding the add/remove
            # set — append them as further parts of this same fold
            side = pq.read_table(
                io.parquet_source(p), columns=["sidecar"]
            ).column(
                "sidecar"
            ).combine_chunks()
            mask = pc.is_valid(side)
            if pc.any(mask).as_py():
                seen_sidecars = True
                log = os.path.dirname(p)
                for s in side.filter(mask).to_pylist():
                    sp = s.get("path")
                    if not sp:
                        # malformed manifest: recoverable — the caller
                        # falls back to the pure-JSON fold
                        raise ValueError(
                            "v2 checkpoint sidecar action without path"
                        )
                    full = (
                        sp
                        if os.path.isabs(sp)
                        else os.path.join(log, "_sidecars", sp)
                    )
                    if not io.exists(full):
                        raise ValueError(
                            f"v2 checkpoint sidecar {sp} missing — "
                            "refusing to fold a partial snapshot"
                        )
                    parts.append(full)
        cols = [c for c in ("protocol", "metaData", "add") if c in names]
        if not cols:
            continue
        tbl = pq.read_table(io.parquet_source(p), columns=cols)
        for key in ("protocol", "metaData"):
            if key in names:
                col = tbl.column(key).combine_chunks()
                mask = pc.is_valid(col)
                if pc.any(mask).as_py():
                    # ≤ 1 row per checkpoint — a scalar materialize
                    val = col.filter(mask).to_pylist()[0]
                    if key == "protocol":
                        proto = _demap(val)
                    else:
                        meta = _demap(val)
        if "add" in names:
            col = tbl.column("add").combine_chunks()
            sub = col.filter(pc.is_valid(col))
            if len(sub):
                proj = _project_struct(sub, pa.struct(list(schema)))
                part = pa.Table.from_arrays(
                    [proj.field(i) for i in range(len(schema))],
                    schema=schema,
                )
                part = _fill_from_parsed(part, sub)
                chunks.append(part)
    adds = (
        pa.concat_tables(chunks)
        if chunks
        else pa.table(
            {f.name: pa.nulls(0, f.type) for f in schema}, schema=schema
        )
    )
    return proto, meta, adds


def _fill_from_parsed(part, sub):
    """Struct-stats COMPATIBILITY: a legal writer choice is to
    checkpoint only the PARSED forms (``add.stats_parsed`` /
    ``add.partitionValues_parsed`` — typed structs) and omit the JSON
    string ``stats`` / the string map ``partitionValues``. The
    canonical fold would then carry nulls and ``where=`` data skipping
    silently degrades to a full scan (the difference between a day and
    the whole table at 10⁵ files). Translate the parsed structs back
    into the skipping forms the shared prune path consumes.

    Scale note: the translation is PER-ROW (json.dumps of each file's
    stats) and runs ONLY when the string forms are absent — the
    columnar fast path of spec-typical checkpoints is untouched, and
    the work is bounded by one checkpoint part's rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    addf = {f.name for f in sub.type}
    idx_stats = part.schema.get_field_index("stats")
    if (
        "stats_parsed" in addf
        and part.column("stats").null_count == part.num_rows
    ):
        parsed = sub.field("stats_parsed")
        if parsed.null_count < len(parsed):
            out = []
            for row in parsed.to_pylist():
                if row is None:
                    out.append(None)
                    continue
                j = {}
                if row.get("numRecords") is not None:
                    j["numRecords"] = int(row["numRecords"])
                for k in ("minValues", "maxValues", "nullCount"):
                    if row.get(k) is not None:
                        j[k] = row[k]
                # dates/timestamps serialize ISO-'T' (isoformat) —
                # delta-spark's JSON-stats form and what where=
                # bounds use; str(datetime) would emit the space
                # separator, and ' ' < 'T' makes lexicographic
                # pruning WRONGLY drop files sharing the bound's
                # date. _may_match also normalizes the separator as
                # a belt-and-braces guard for foreign stats.
                out.append(json.dumps(
                    j,
                    default=lambda o: (
                        o.isoformat()
                        if hasattr(o, "isoformat")
                        else str(o)
                    ),
                ))
            part = part.set_column(
                idx_stats, "stats", pa.array(out, pa.string())
            )
    idx_pv = part.schema.get_field_index("partitionValues")
    # cheap set-membership FIRST: spec-typical checkpoints (no parsed
    # columns) must never pay a per-row to_pylist here
    pv_all_empty = "partitionValues_parsed" in addf and all(
        v is None or len(v) == 0
        for v in part.column("partitionValues").to_pylist()
    )
    if pv_all_empty:
        parsed = sub.field("partitionValues_parsed")
        if parsed.null_count < len(parsed):
            rows = []
            for row in parsed.to_pylist():
                if row is None:
                    rows.append(None)
                    continue
                rows.append(
                    [
                        (
                            k,
                            None
                            if v is None
                            else (
                                str(v).lower()
                                if isinstance(v, bool)
                                else str(v)
                            ),
                        )
                        for k, v in row.items()
                    ]
                )
            part = part.set_column(
                idx_pv,
                "partitionValues",
                pa.array(rows, pa.map_(pa.string(), pa.string())),
            )
    return part


def _adds_from_dicts(adds: list[dict]):
    """JSON-tail add actions (dicts) → the canonical Arrow layout."""
    import pyarrow as pa

    schema = _adds_arrow_schema()
    dv_keys = [f.name for f in schema.field("deletionVector").type]
    rows = []
    for a in adds:
        dv = a.get("deletionVector")
        rows.append(
            {
                "path": a["path"],
                "partitionValues": sorted(
                    (a.get("partitionValues") or {}).items()
                ),
                "size": a.get("size"),
                "modificationTime": a.get("modificationTime"),
                "dataChange": a.get("dataChange", True),
                "stats": a.get("stats")
                if isinstance(a.get("stats"), (str, type(None)))
                else json.dumps(a.get("stats")),
                "deletionVector": (
                    {k: dv.get(k) for k in dv_keys} if dv else None
                ),
            }
        )
    return pa.Table.from_pylist(rows, schema=schema)


def _check_arrow_adds(adds) -> None:
    """Fail-closed sweep over the columnar add set (vectorized):
    deletion vectors are supported, but only the spec's three storage
    types with complete descriptors — anything else raises here, at
    fold time, rather than deep in a scan task."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = adds.column("deletionVector").combine_chunks()
    if col.null_count >= len(col):
        return
    present = pc.is_valid(col)
    st = col.field("storageType")
    ok = pc.fill_null(
        pc.is_in(st, value_set=pa.array(["u", "i", "p"])), False
    )
    bad = pc.filter(st, pc.and_(present, pc.invert(ok)))
    if len(bad):
        raise DeltaUnsupportedError(
            f"deletion vector storageType {bad[0].as_py()!r} "
            "unsupported"
        )
    for fname in ("pathOrInlineDv", "sizeInBytes"):
        missing = pc.and_(present, pc.is_null(col.field(fname)))
        if pc.any(missing).as_py():
            raise DeltaUnsupportedError(
                f"deletion vector descriptor missing {fname} — "
                "refusing to guess which rows are deleted"
            )


def delta_snapshot_arrow(
    root: str, version: int | None = None, io: FileIO | None = None
):
    """The COLUMNAR snapshot fold — (version, metaData, adds) with
    adds an Arrow table in :func:`_adds_arrow_schema` layout, sorted
    by path. This is the scale path: the checkpoint never leaves
    Arrow, only the JSON tail (bounded by the checkpoint interval)
    folds as Python dicts. :func:`delta_snapshot` is the list-of-dicts
    compatibility wrapper."""
    io = io or io_for(root)
    versions = _commit_versions(root, io)
    if not versions and _last_checkpoint_version(root, None, io) is None:
        raise DeltaUnsupportedError(f"{root}: empty _delta_log")
    head_avail = max(
        versions + [c for c in [_last_checkpoint_version(root, None, io)]
                    if c is not None]
    )
    if version is not None and version > head_avail:
        # Delta raises on a pin past the newest commit — a clamped
        # read would silently change once that version lands
        raise ValueError(
            f"{root}: version {version} does not exist "
            f"(newest is {head_avail})"
        )
    head = head_avail if version is None else version
    cp = _last_checkpoint_version(root, head, io)
    usable = [v for v in versions if v <= head]
    if not usable and cp is None:
        raise ValueError(f"{root}: no commit ≤ version {head}")
    import pyarrow as pa
    import pyarrow.compute as pc

    cp_adds = None
    proto = meta = None
    start = 0
    if cp is not None:
        try:
            parts = _checkpoint_parts(root, cp, io)
        except ValueError:
            parts = []  # incomplete multi-part set: try the JSON fold
        if parts:
            try:
                proto, meta, cp_adds = _fold_checkpoint_arrow(parts, io)
                if proto is not None:
                    _apply_action(
                        {"files": {}, "tombstones": set()},
                        {"protocol": proto},
                    )
                start = cp + 1
            except DeltaUnsupportedError:
                raise
            except Exception:
                # corrupt checkpoint: the JSON log is self-sufficient
                proto = meta = cp_adds = None
                start = 0
    # the fold range must be contiguous in the JSON log — a cleaned-up
    # commit inside it means the snapshot CANNOT be reconstructed
    gap = [v for v in range(start, head + 1) if v not in set(versions)]
    if gap:
        raise DeltaUnsupportedError(
            f"{root}: commits {gap[:5]}{'…' if len(gap) > 5 else ''} "
            f"missing from the JSON log (fold range {start}..{head}) — "
            "checkpoint unusable and tail cleaned up; snapshot "
            "unreconstructable"
        )
    state: dict = {
        "files": {},
        "tombstones": set(),
        "metaData": meta,
        "protocol": proto,
    }
    if meta is not None:
        # the columnar path skipped _apply_action for metaData —
        # re-run its validation (columnMapping etc.) on the dict
        _apply_action(
            {"files": {}, "tombstones": set()}, {"metaData": meta}
        )
    for v in versions:
        if v < start or v > head:
            continue
        for line in io.read_text(
            os.path.join(_log_dir(root), f"{v:020d}.json")
        ).splitlines():
            line = line.strip()
            if line:
                _apply_action(state, json.loads(line))
    if state["metaData"] is None:
        raise DeltaUnsupportedError(f"{root}: log has no metaData action")
    tail = _adds_from_dicts(
        sorted(state["files"].values(), key=lambda a: a["path"])
    )
    if cp_adds is not None and cp_adds.num_rows:
        touched = set(state["files"]) | state["tombstones"]
        if touched:
            mask = pc.invert(
                pc.is_in(
                    cp_adds.column("path"),
                    value_set=pa.array(sorted(touched), pa.string()),
                )
            )
            cp_adds = cp_adds.filter(mask)
        adds = pa.concat_tables([cp_adds, tail]).sort_by("path")
    else:
        adds = tail
    _check_arrow_adds(adds)
    actual = max(usable + ([cp] if cp is not None else []))
    return actual, state["metaData"], adds


def delta_snapshot(
    root: str, version: int | None = None
) -> tuple[int, dict, list[dict]]:
    """(version, metaData, live add-actions) at ``version`` (default
    latest) — the list-of-dicts COMPATIBILITY form of
    :func:`delta_snapshot_arrow` (which big-table callers should use:
    this wrapper materializes every action as a Python dict)."""
    actual, md, adds = delta_snapshot_arrow(root, version)
    out = []
    for row in adds.to_pylist():
        a = {k: v for k, v in row.items() if v is not None}
        if "partitionValues" not in a:
            a["partitionValues"] = {}
        out.append(_demap(a))
    return actual, md, out


def delta_schema(md: dict) -> StructType:
    """metaData.schemaString IS a Spark JSON schema."""
    return StructType.fromJson(json.loads(md["schemaString"]))


def _file_path(root: str, rel: str, io: FileIO | None = None) -> str:
    # add.path is URL-encoded and relative to the table root; the
    # result feeds Spark's JVM scan, so translate through the data
    # plane (identity for POSIX, bucket URI for object stores)
    io = io or io_for(root)
    return os.path.join(io.spark_path(root), urllib.parse.unquote(rel))


# The spec stores add/remove/cdc paths as percent-encoded relative
# URIs. Encode only what URI path syntax requires (space, '%', '?',
# '#', brackets); everything Hadoop leaves literal stays literal so
# our logs byte-match what delta-spark would write for the same file.
_PATH_SAFE = "/=+&$@;:,'()*!~-._"


def _quote_rel(rel: str) -> str:
    return urllib.parse.quote(rel.replace(os.sep, "/"), safe=_PATH_SAFE)


def _hive_layout(
    rels: list[str], pvs: list[dict], part_cols: list[str]
) -> bool:
    """True when every file path encodes every partition column as a
    hive-style ``col=value`` directory matching its partitionValues —
    the layout Delta writers emit, enabling a single basePath scan."""
    for rel, pv in zip(rels, pvs):
        segs = urllib.parse.unquote(rel).split("/")[:-1]
        found = {}
        for s in segs:
            if "=" in s:
                k, _, val = s.partition("=")
                found[k] = urllib.parse.unquote(val)
        for c in part_cols:
            want = pv.get(c)
            got = found.get(c)
            if want is None:
                if got not in (None, "__HIVE_DEFAULT_PARTITION__"):
                    return False
            elif got != want:
                return False
    return True


def read_delta(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    where: dict | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame:
    """The Delta snapshot as a DataFrame (declared schema, partition
    columns materialized, column order = table schema).

    ``where={col: (lo, hi)}`` enables DATA SKIPPING through the log:
    files whose recorded ``add.stats`` (minValues/maxValues — what
    Delta writers stamp per file) or ``partitionValues`` prove no row
    matches are never handed to Spark, and the bounds re-apply as row
    filters so the result equals filtering a full read. ``None`` on
    either side leaves that bound open. Conservative by construction:
    a file without stats (or with non-comparable stat types) is kept.
    At 100 TB this is the difference between scanning a day and
    scanning the table — the same contract as the engine's own
    ``txn_read(where=...)``. Past :data:`DISTRIBUTED_PRUNE_AT` live
    files the stats test runs as a Spark job and only survivors
    return to the driver (the ``txnlog`` threshold design).
    ``timestamp_ms`` pins AS OF TIMESTAMP (mutually exclusive with
    ``version``; resolution per :func:`delta_version_at`)."""
    if timestamp_ms is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp_ms, not both")
        version = delta_version_at(root, timestamp_ms)
    _v, md, adds = delta_snapshot_arrow(root, version)
    mapping = _column_mapping(md)
    part_cols = set(md.get("partitionColumns") or [])
    if where:
        # under name mapping the log's partitionValues and stats keys
        # are PHYSICAL — translate the prune predicate (residual row
        # filters below stay logical: they run after the rename)
        pwhere = (
            {mapping["phys"].get(c, c): b for c, b in where.items()}
            if mapping
            else where
        )
        ppart = (
            {mapping["phys"].get(c, c) for c in part_cols}
            if mapping
            else part_cols
        )
        if adds.num_rows >= DISTRIBUTED_PRUNE_AT:
            adds = _prune_adds_distributed(spark, adds, pwhere, ppart)
        else:
            adds = _prune_adds_local(adds, pwhere, ppart)
    df = _scan_snapshot_arrow(spark, root, md, adds)
    if where:
        for col, bound in where.items():
            lo, hi = bound
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
    return df


def _prune_adds_local(adds, where: dict, part_cols: set):
    """Driver-loop data skipping (below the distributed threshold):
    boolean-mask the Arrow add set without materializing it."""
    import pyarrow as pa

    mask = [
        _may_match(
            dict(pv or []), st, where, part_cols
        )
        for pv, st in zip(
            adds.column("partitionValues").to_pylist(),
            adds.column("stats").to_pylist(),
        )
    ]
    return adds.filter(pa.array(mask, pa.bool_()))


def _prune_adds_distributed(
    spark: SparkSession, adds, where: dict, part_cols: set
):
    """Data skipping as a SPARK JOB (mirror of
    ``txnlog._prune_arrow_distributed``): the (path, partitionValues,
    stats) columns ship to executors via Arrow, each task runs the
    same conservative keep test, and ONLY SURVIVING paths return to
    the driver — the full stats column never parses driver-side."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc

    ship = adds.select(["path", "partitionValues", "stats"])
    n = ship.num_rows
    fdf = spark.createDataFrame(ship).repartition(
        max(8, min(1024, math.ceil(n / 20_000)))
    )
    wser = {c: (b[0], b[1]) for c, b in where.items()}
    pcols = set(part_cols)

    def _task(batches):
        import pandas as _pd

        from django_datastream_spark.sources import delta as DL

        for pdf in batches:
            keep = []
            for path, pv, st in zip(
                pdf["path"], pdf["partitionValues"], pdf["stats"]
            ):
                d = dict(pv) if pv is not None else {}
                if DL._may_match(d, st, wser, pcols):
                    keep.append(path)
            yield _pd.DataFrame({"path": keep})

    kept = [
        r["path"] for r in fdf.mapInPandas(_task, "path string").collect()
    ]
    return adds.filter(
        pc.is_in(
            adds.column("path"),
            value_set=pa.array(sorted(kept), pa.string()),
        )
    )


def _may_match(pv: dict, stats, where: dict, part_cols: set) -> bool:
    """Conservative keep test for one add-action's recorded metadata:
    False only when the file's stats or partition value PROVE no row
    satisfies every ``lo <= col <= hi``. Any coercion/comparison doubt
    keeps."""
    j = None
    if stats is not None and not isinstance(stats, str):
        # numpy/pandas NaN from the distributed path
        try:
            import math as _math

            if isinstance(stats, float) and _math.isnan(stats):
                stats = None
        except TypeError:
            pass
    if stats:
        try:
            j = json.loads(stats) if isinstance(stats, str) else stats
        except ValueError:
            j = None
    for col, (lo, hi) in where.items():
        if col in part_cols:
            raw = pv.get(col)
            if raw is None:
                continue  # null partition value: keep conservatively
            # a partition file holds exactly one value for col
            mn = mx = raw
        elif j:
            mn = (j.get("minValues") or {}).get(col)
            mx = (j.get("maxValues") or {}).get(col)
        else:
            continue
        try:
            if lo is not None and mx is not None:
                a, b = _cmp_pair(mx, lo)
                if a < b:
                    return False  # whole file below the range
            if hi is not None and mn is not None:
                a, b = _cmp_pair(mn, hi)
                if a > b:
                    return False  # whole file above the range
        except (TypeError, ValueError):
            continue  # non-comparable stat types: keep
    return True


def _temporalish(s: str) -> bool:
    return (
        len(s) >= 11
        and s[10] in (" ", "T")
        and s[:10].replace("-", "").isdigit()
        and s.count("-", 0, 10) == 2
    )


def _cmp_pair(v, bound):
    """Coerce ``v`` to ``bound``'s type for a bound comparison, with
    the TEMPORAL-STRING guard: ISO datetimes appear with either 'T'
    or ' ' at position 10 depending on the writer, and comparing
    mixed separators lexicographically mis-orders same-date values
    (' ' < 'T'), wrongly pruning a file whose max shares the bound's
    date. The separator normalizes to 'T' ONLY when BOTH sides are
    temporal-shaped — normalizing one side of an ordinary string
    column's comparison would itself mis-order (pruning must stay
    conservative for arbitrary strings). Genuinely non-comparable
    values still raise and the caller keeps the file."""
    out = type(bound)(v)
    if (
        isinstance(out, str)
        and isinstance(bound, str)
        and _temporalish(out)
        and _temporalish(bound)
    ):
        return (
            out[:10] + "T" + out[11:],
            bound[:10] + "T" + bound[11:],
        )
    return out, bound


def _column_mapping(md: dict) -> dict | None:
    """Column-mapping descriptor when ``delta.columnMapping.mode`` is
    ``name`` or ``id`` (else None): ``{"mode", "phys": logical →
    physicalName, "ids": logical → field id (id mode)}``. Under BOTH
    modes the hive partition dirs, ``add.partitionValues`` keys and
    ``add.stats`` column keys use PHYSICAL names (``col-<uuid>``);
    under ``name`` the parquet columns match by physical name, under
    ``id`` by the parquet FIELD ID (so files written before a rename
    keep reading — physical names may differ per file). Nested mapped
    fields are not implemented — fail closed."""
    mode = (md.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode == "none":
        return None
    sch = json.loads(md["schemaString"])
    mapping = {"mode": mode, "phys": {}, "ids": {}}
    for f in sch["fields"]:
        meta = f.get("metadata") or {}
        phys = meta.get("delta.columnMapping.physicalName")
        if not phys:
            raise DeltaUnsupportedError(
                f"columnMapping.mode={mode} but field {f['name']!r} "
                "carries no physicalName"
            )
        if not isinstance(f.get("type"), str):
            raise DeltaUnsupportedError(
                f"columnMapping over nested field {f['name']!r} not "
                "supported (top-level primitives only)"
            )
        mapping["phys"][f["name"]] = phys
        if mode == "id":
            fid = meta.get("delta.columnMapping.id")
            if fid is None:
                raise DeltaUnsupportedError(
                    f"columnMapping.mode=id but field {f['name']!r} "
                    "carries no delta.columnMapping.id"
                )
            mapping["ids"][f["name"]] = int(fid)
    return mapping


def _physicalize_md(md: dict, mapping: dict) -> dict:
    """A metaData twin in the coordinate system the files and the
    log's partitionValues actually live in. ``name`` mode: every
    field renamed to its physical name. ``id`` mode: DATA fields keep
    their logical name but carry ``parquet.field.id`` metadata (Spark
    matches parquet columns by id when
    ``spark.sql.parquet.fieldId.read.enabled`` is on — the scan path
    enables it); PARTITION fields rename physically (they come from
    dir names / partitionValues, which use physical names)."""
    sch = json.loads(md["schemaString"])
    part = set(md.get("partitionColumns") or [])
    for f in sch["fields"]:
        if mapping["mode"] == "name" or f["name"] in part:
            f["name"] = mapping["phys"][f["name"]]
            f["metadata"] = {}
        else:
            f["metadata"] = {
                "parquet.field.id": mapping["ids"][f["name"]]
            }
    out = dict(md)
    out["schemaString"] = json.dumps(sch)
    out["partitionColumns"] = [
        mapping["phys"][c] for c in (md.get("partitionColumns") or [])
    ]
    return out


def _scan_snapshot_arrow(spark, root: str, md: dict, adds) -> DataFrame:
    """DV-aware scan of an Arrow add set: files without deletion
    vectors take the plain scan; files WITH them scan once with row
    identity (``_metadata.file_path``/``row_index``) and anti-join
    their decoded positions — decode happens EXECUTOR-side, one task
    per descriptor batch, so multi-GB vector sets never visit the
    driver (mirror of ``txnlog._read_files``)."""
    import pyarrow.compute as pc

    mapping = _column_mapping(md)
    logical = [f.name for f in delta_schema(md).fields]
    if mapping:
        part = set(md.get("partitionColumns") or [])
        if mapping["mode"] == "name":
            scanned = {c: mapping["phys"][c] for c in logical}
        else:
            # id mode: the parquet scan matches data columns by FIELD
            # ID; the conf is read at EXECUTION, so it must stay on
            # (harmless for schemas without field-id metadata)
            spark.conf.set(
                "spark.sql.parquet.fieldId.read.enabled", "true"
            )
            scanned = {
                c: (mapping["phys"][c] if c in part else c)
                for c in logical
            }
        md = _physicalize_md(md, mapping)
    dvc = adds.column("deletionVector").combine_chunks()
    if dvc.null_count >= adds.num_rows:
        df = _scan_adds_arrow(spark, root, md, adds)
    else:
        dirty_mask = pc.is_valid(dvc)
        dirty = adds.filter(dirty_mask)
        clean = adds.filter(pc.invert(dirty_mask))
        df = _scan_with_dv(spark, root, md, dirty)
        if clean.num_rows:
            df = _scan_adds_arrow(spark, root, md, clean).unionByName(df)
    if mapping:
        df = df.select(
            *[F.col(scanned[name]).alias(name) for name in logical]
        )
    return df


def _scan_with_dv(spark, root: str, md: dict, dirty) -> DataFrame:
    """Scan DV-carrying adds minus their deleted positions."""
    schema = delta_schema(md)
    rels = dirty.column("path").to_pylist()
    pvs = None
    if md.get("partitionColumns"):
        pvs = [
            dict(x or [])
            for x in dirty.column("partitionValues").to_pylist()
        ]
    base = _scan_paths(spark, root, md, rels, pvs, keep_meta=True)
    deleted = _dv_positions_frame(spark, root, dirty)
    out = base.join(deleted, ["__file", "__pos"], "left_anti")
    return out.select(*[F.col(f.name) for f in schema.fields])


def _dv_positions_frame(spark, root: str, dirty) -> DataFrame:
    """Deleted (``__file``, ``__pos``) rows for DV-carrying adds. Only
    the DESCRIPTORS (a path + 4 ints each) leave the driver; the
    bitmap bytes decode executor-side and each decode verifies the
    descriptor's cardinality — a truncated or mismatched vector fails
    the job instead of resurrecting rows."""
    descs = []
    for rel, dv in zip(
        dirty.column("path").to_pylist(),
        dirty.column("deletionVector").to_pylist(),
    ):
        descs.append(
            (
                urllib.parse.unquote(rel),
                dv["storageType"],
                dv["pathOrInlineDv"],
                dv.get("offset"),
                int(dv["sizeInBytes"]),
                int(dv["cardinality"]) if dv.get("cardinality") is not None
                else -1,
            )
        )
    # resolve DRIVER-side and capture: the scheme registry does not
    # exist in executor workers (the FileIO object itself is picklable)
    io = io_for(root)
    if not getattr(io, "executor_safe", True):
        # driver-only FileIO (HadoopFileIO): decode the vectors here
        # and ship positions as rows — bounded by total DV cardinality,
        # the documented trade for SDK-less object-store access (a
        # picklable store keeps the executor-side path below)
        import pandas as _pd

        from . import roaring as RB

        frames = []
        for f, st, p_, off, sz, card in descs:
            pos = RB.dv_positions(root, st, p_, off, sz, io=io)
            if card >= 0 and len(pos) != card:
                raise ValueError(
                    f"deletion vector for {f}: decoded {len(pos)} "
                    f"positions, descriptor says {card}"
                )
            frames.append(
                _pd.DataFrame({"__file": f, "__pos": pos.astype("int64")})
            )
        pdf = _pd.concat(frames, ignore_index=True)
        return spark.createDataFrame(pdf, "__file string, __pos long")
    ddf = spark.createDataFrame(
        descs, "f string, st string, p string, off int, sz int, card long"
    ).repartition(min(64, max(1, len(descs))))

    def _explode(batches):
        import pandas as _pd

        from django_datastream_spark.sources import roaring as RB

        for pdf in batches:
            for f, st, p, off, sz, card in zip(
                pdf["f"], pdf["st"], pdf["p"], pdf["off"], pdf["sz"],
                pdf["card"],
            ):
                pos = RB.dv_positions(
                    root, st, p,
                    None if _pd.isna(off) else int(off), int(sz),
                    io=io,
                )
                if card >= 0 and len(pos) != card:
                    raise ValueError(
                        f"deletion vector for {f}: decoded "
                        f"{len(pos)} positions, descriptor says {card}"
                    )
                yield _pd.DataFrame(
                    {"__file": f, "__pos": pos.astype("int64")}
                )

    return ddf.mapInPandas(_explode, "__file string, __pos long")


def _scan_adds_arrow(spark, root: str, md: dict, adds) -> DataFrame:
    """Arrow-form entry to the shared scan: only the path column (and,
    for partitioned tables, partitionValues) materializes — never
    stats or the full actions."""
    rels = adds.column("path").to_pylist()
    pvs = None
    if md.get("partitionColumns"):
        pvs = [
            dict(x or [])
            for x in adds.column("partitionValues").to_pylist()
        ]
    return _scan_paths(spark, root, md, rels, pvs)


def _scan_adds(
    spark: SparkSession, root: str, md: dict, adds: list[dict]
) -> DataFrame:
    """dict-form entry (per-commit tails in :func:`delta_changes`) —
    routes through the DV-aware scan."""
    return _scan_snapshot_arrow(spark, root, md, _adds_from_dicts(adds))


def _scan_paths(
    spark: SparkSession, root: str, md: dict,
    rels: list[str], pvs: list[dict] | None,
    keep_meta: bool = False,
) -> DataFrame:
    """Scan a file list under the table's declared schema — the shared
    data path of :func:`read_delta` / :func:`delta_changes`. One
    ``spark.read.parquet(*paths)`` call carries the list (fine to
    ~10⁵ paths; prune harder or adopt into the txn layer past that).
    ``keep_meta=True`` appends the ``__file`` (table-relative path) /
    ``__pos`` (row index) identity columns the deletion-vector
    anti-join needs."""
    io = io_for(root)
    data_root = io.spark_path(root)
    schema = delta_schema(md)
    part_cols = list(md.get("partitionColumns") or [])
    data_schema = StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    prefix = io.file_uri(root) + os.sep
    meta_cols = (
        [
            # _metadata.file_path is a percent-encoded URI; DV
            # descriptors carry the DECODED relative path. Decode the
            # FULL path FIRST, then slice by the DECODED prefix —
            # slicing the encoded form by a decoded prefix length
            # mis-aligns whenever the table ROOT contains an
            # encodable character (a space in a parent dir) and the
            # anti-join would silently resurrect deleted rows.
            # url_decode maps '+' to space (form semantics); a
            # literal '+' in a file URI is unencoded — protect it.
            F.expr(
                "substring(url_decode(replace(_metadata.file_path, "
                f"'+', '%2B')), {len(prefix) + 1})"
            ).alias("__file"),
            F.col("_metadata.row_index").alias("__pos"),
        ]
        if keep_meta
        else []
    )
    if not rels:
        from ..storage import local_rows_df

        out_schema = schema
        if keep_meta:
            out_schema = StructType(
                schema.fields
                + [
                    StructType.fromDDL(
                        "__file string, __pos long"
                    ).fields[0],
                    StructType.fromDDL(
                        "__file string, __pos long"
                    ).fields[1],
                ]
            )
        return local_rows_df(spark, [], out_schema)
    paths = [_file_path(root, r, io) for r in rels]
    if not part_cols:
        return spark.read.schema(data_schema).parquet(*paths).select(
            *[F.col(f.name) for f in schema.fields], *meta_cols
        )
    if _hive_layout(rels, pvs, part_cols):
        # one scan; Spark derives partition columns from the dirs.
        # partition values type per the DECLARED schema, not inference
        df = (
            spark.read.option("basePath", data_root)
            .schema(schema)
            .parquet(*paths)
        )
        return df.select(
            *[F.col(f.name) for f in schema.fields], *meta_cols
        )
    # non-hive layout: partitionValues is the only truth — group files
    # by their value combination (metadata-bounded) and union
    by_combo: dict[tuple, list[str]] = {}
    for pv, p in zip(pvs, paths):
        key = tuple(pv.get(c) for c in part_cols)
        by_combo.setdefault(key, []).append(p)
    pieces = []
    for key, group in sorted(by_combo.items()):
        df = spark.read.schema(data_schema).parquet(*group)
        for c, raw in zip(part_cols, key):
            typ = schema[c].dataType
            df = df.withColumn(
                c,
                F.lit(raw).cast(typ) if raw is not None
                else F.lit(None).cast(typ),
            )
        pieces.append(
            df.select(
                *[F.col(f.name) for f in schema.fields], *meta_cols
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def delta_versions(root: str) -> list[int]:
    return _commit_versions(root)


def _commit_timestamp_raw(
    root: str, v: int, io: FileIO | None = None
) -> int:
    """One commit's RAW timestamp: ``commitInfo.timestamp`` when the
    commit carries one (in-commit timestamps — what real writers
    stamp), else the commit file's modification time — the spec's
    resolution order. Raw values can COLLIDE (commits landing within
    one clock tick share an mtime); every consumer goes through the
    monotonized form below."""
    io = io or io_for(root)
    path = os.path.join(_log_dir(root), f"{v:020d}.json")
    try:
        for line in io.read_text(path).splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "commitInfo" in action:
                ts = action["commitInfo"].get("timestamp")
                if ts is not None:
                    return int(ts)
    except (OSError, ValueError):
        pass
    return int(io.mtime(path) * 1000)


def _commit_timestamps_monotonic(
    root: str, versions, io: FileIO | None = None
) -> dict:
    """version -> EFFECTIVE timestamp for every version in
    ``versions``, with Delta's monotonization rule applied: a
    commit's effective timestamp is at least 1 ms after its
    predecessor's (delta-io's public behavior — file modification
    times are adjusted so timestamp resolution is a TOTAL order even
    when a fast writer lands several commits within one clock tick).
    One commit read per version."""
    io = io or io_for(root)
    out: dict = {}
    prev = None
    for v in sorted(versions):
        t = _commit_timestamp_raw(root, v, io)
        if prev is not None and t <= prev:
            t = prev + 1
        out[v] = t
        prev = t
    return out


def _commit_timestamp_ms(
    root: str, v: int, io: FileIO | None = None
) -> int:
    """The MONOTONIZED timestamp of commit ``v`` (adjusted over its
    predecessors — O(v) commit reads; batch consumers use
    :func:`_commit_timestamps_monotonic` directly)."""
    vs = [w for w in _commit_versions(root, io) if w <= v]
    return _commit_timestamps_monotonic(root, vs, io)[v]


def delta_version_at(root: str, timestamp_ms: int) -> int:
    """AS OF TIMESTAMP resolution: the newest commit whose timestamp
    is <= the pin (Delta's rule). Raises when the pin predates the
    oldest RECONSTRUCTIBLE commit — never silently serves a later
    state."""
    versions = _commit_versions(root)
    if not versions:
        raise DeltaUnsupportedError(
            f"{root}: no JSON commits — timestamp travel needs the "
            "commit files (cleaned up past retention)"
        )
    ts_of = _commit_timestamps_monotonic(root, versions)
    cand = [
        v for v in versions if ts_of[v] <= int(timestamp_ms)
    ]
    if not cand:
        raise ValueError(
            f"{root}: timestamp {timestamp_ms} predates the oldest "
            f"available commit"
        )
    return max(cand)


def delta_changes(
    spark: SparkSession,
    root: str,
    from_version: int | None,
    to_version: int | None = None,
    on_remove: str = "error",
) -> DataFrame:
    """INCREMENTAL consumption of an external Delta table: the rows
    ADDED by commits in ``(from_version, to_version]``, tagged with
    ``_commit_version`` so a consumer checkpoints "processed through
    V" and resumes exactly — the same contract as the engine's own
    :func:`..txnlog.txn_changes` and Spark's Delta streaming source.

    Semantics match that source: ``dataChange=false`` adds
    (compaction) are skipped — same rows, new bytes, not a change;
    a ``remove`` action in the range means a rewrite or delete
    happened, which an append-only consumer cannot represent —
    ``on_remove='error'`` (default) fails closed exactly like the
    Delta source without ``ignoreChanges``; ``on_remove='ignore'``
    skips them (the consumer accepts possible re-emission semantics
    upstream). The JSON commits for the range must still exist — a
    range cleaned up past a checkpoint raises, the same contract as
    Delta CDF past retention.

    ``from_version=None`` (or ``-1``) consumes FROM THE BEGINNING —
    commit 0 (the table-creating commit, which carries the initial
    adds) is part of the feed, mirroring
    :func:`.iceberg.iceberg_changes`'s ``from_snapshot=None``."""
    if on_remove not in ("error", "ignore"):
        raise ValueError(f"on_remove={on_remove!r}")
    if from_version is None:
        from_version = -1
    versions = _commit_versions(root)
    head = max(versions) if versions else -1
    to_v = head if to_version is None else to_version
    if not -1 <= from_version <= to_v <= head:
        raise ValueError(
            f"bad version range ({from_version}, {to_v}] with head {head}"
        )
    missing = [
        v for v in range(from_version + 1, to_v + 1) if v not in versions
    ]
    if missing:
        raise ValueError(
            f"{root}: commits {missing} cleaned up — incremental "
            "changes past log cleanup are unrecoverable (re-read the "
            "snapshot instead)"
        )
    # metaData as of to_v (schema for the scan)
    _v, md, _adds = delta_snapshot(root, to_v)
    io = io_for(root)
    pieces = []
    for v in range(from_version + 1, to_v + 1):
        adds_v = []
        for line in io.read_text(
            os.path.join(_log_dir(root), f"{v:020d}.json")
        ).splitlines():
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    if a.get("deletionVector") and on_remove == "error":
                        # a DV on an add means rows of an already-
                        # emitted file were vectored out — a rewrite,
                        # same contract as a remove action
                        raise ValueError(
                            f"{root}: commit {v} adds a deletion "
                            f"vector on {a['path']} — deletes cannot "
                            "stream as appends (pass "
                            "on_remove='ignore' to accept re-emission "
                            "of the file's LIVE rows)"
                        )
                    if a.get("dataChange", True):
                        adds_v.append(a)
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    if on_remove == "error":
                        raise ValueError(
                            f"{root}: commit {v} removes "
                            f"{action['remove']['path']} — rewrites/"
                            "deletes cannot stream as appends (pass "
                            "on_remove='ignore' to accept re-emission)"
                        )
        if adds_v:
            pieces.append(
                _scan_adds(spark, root, md, adds_v).withColumn(
                    "_commit_version", F.lit(v).cast("long")
                )
            )
    if not pieces:
        from ..storage import local_rows_df

        schema = delta_schema(md).add("_commit_version", "long")
        return local_rows_df(spark, [], schema)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def adopt_delta(
    spark: SparkSession,
    delta_root: str,
    txn_root: str,
    version: int | None = None,
    writer: str = "delta-adopt",
) -> int:
    """ZERO-COPY migration: commit the Delta snapshot's live files
    into one of this engine's txn tables. Data files are referenced in
    place via relative symlink-free paths — the txn table root IS the
    delta root's files (txn_root must sit so the files are reachable);
    simplest contract: ``txn_root == delta_root`` (the engine's log
    lives in ``_txn`` alongside ``_delta_log``, both describing the
    same immutable parquet files). Non-hive layouts adopt fine (the
    engine records explicit file lists, not directory scans).

    Skipping stats are collected from the files' own parquet FOOTERS
    at adopt time (one footer pass, no data scan — the engine's
    normal commit path and its exact stats format), so data skipping
    works immediately on the adopted table. Raises on partitioned
    tables whose partition columns are absent from the data files
    (the engine's readers would silently drop them — fail closed).

    DELETION VECTORS adopt by CONVERSION: each DV'd add's positions
    decode (executor-side) into a txn ``_dv`` sidecar and the commit
    records them as engine deletion vectors — zero data-file bytes
    rewritten, and the adopted table's reads subtract exactly the
    same rows the Delta reads did (adopting the files WITHOUT the
    vectors would silently resurrect deleted rows)."""
    from .. import txnlog as TL

    def _canon(p):
        return p if "://" in p else os.path.abspath(p)

    if _canon(txn_root) != _canon(delta_root):
        raise ValueError(
            "zero-copy adopt requires txn_root == delta_root "
            "(both logs describe the same files)"
        )
    a_io = io_for(delta_root)
    _v, md, adds = delta_snapshot_arrow(delta_root, version)
    if _column_mapping(md):
        raise DeltaUnsupportedError(
            "adopt of a columnMapping table would expose physical "
            "column names through the txn layer; read_delta + rewrite "
            "instead"
        )
    part_cols = list(md.get("partitionColumns") or [])
    raw_rels = adds.column("path").to_pylist()
    if part_cols:
        pvs = [
            dict(x or [])
            for x in adds.column("partitionValues").to_pylist()
        ]
        if not _hive_layout(raw_rels, pvs, part_cols):
            raise DeltaUnsupportedError(
                "adopt of a non-hive-layout partitioned Delta table "
                "would lose partition columns; read_delta + rewrite "
                "instead"
            )
    if TL.is_txn_table(txn_root):
        raise ValueError(f"{txn_root}: already a txn table")
    rels = [urllib.parse.unquote(r) for r in raw_rels]
    # deletion vectors convert into the engine's own sidecar form —
    # adopting the files bare would RESURRECT the deleted rows
    deletes = None
    import pyarrow.compute as pc

    dvc = adds.column("deletionVector").combine_chunks()
    if dvc.null_count < adds.num_rows:
        import uuid as _uuid

        dirty = adds.filter(pc.is_valid(dvc))
        dv_rel = os.path.join("_dv", f"adopt-{_uuid.uuid4().hex[:12]}")
        (
            _dv_positions_frame(spark, delta_root, dirty)
            .select(
                F.col("__file").alias("file"),
                F.col("__pos").alias("pos"),
            )
            .write.parquet(
                a_io.spark_path(os.path.join(delta_root, dv_rel))
            )
        )
        per = {
            r["file"]: r["n"]
            for r in spark.read.parquet(
                a_io.spark_path(os.path.join(delta_root, dv_rel))
            )
            .groupBy("file")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        deletes = {
            f: {"dv": dv_rel, "n": int(n)} for f, n in per.items()
        }
    # init_table would adopt EVERY parquet under the root (including
    # delta-removed files); commit the live list explicitly instead
    a_io.makedirs(os.path.join(txn_root, TL.TXN_DIR))
    return TL.commit(
        txn_root,
        rels,
        [],
        "adopt-delta",
        [],
        base_version=0,
        writer=writer,
        stats=TL.collect_file_stats(txn_root, rels, spark=spark),
        deletes=deletes,
        # the Delta logical schema carries into the txn tier (what
        # publish_iceberg needs for schema-tracked conversion) —
        # EXCEPT for hive layouts, where partition columns are not IN
        # the files and the recorded read schema must stay file-shaped
        schema_json=(
            None if part_cols else TL._nullable_json(delta_schema(md))
        ),
    )


_MIRROR_OPS_DELTA = ("adopt-delta", "adopt-delta-refresh")


def refresh_adopt_delta(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    writer: str = "delta-adopt-refresh",
) -> int:
    """INCREMENTAL re-adopt (the conversion tier's tracking verb):
    advance a txn MIRROR of this root's Delta log to the snapshot at
    ``version`` (default latest) as ONE new txn commit — live-set diff
    plus deletion-vector growth, zero data bytes rewritten. With
    :func:`adopt_delta` (initial) and ``publish_iceberg`` (export)
    this is what makes ``sources.convert.convert_delta_to_iceberg``
    re-runnable: each call maps new Delta commits to one new txn
    version, which republish turns into one new Iceberg snapshot.

    Fail-closed boundaries: the txn table must be a PURE mirror
    (every commit op in ``adopt-delta``/``adopt-delta-refresh`` —
    a table the engine wrote to since adoption would be clobbered);
    per surviving file the Delta vector must be a SUPERSET of the
    mirrored one (vectors only grow under normal operation; a RESTORE
    that un-deleted rows cannot be expressed through the txn tier's
    union fold); the adopt-time columnMapping/hive-layout rules
    re-apply.

    Scale note: the diff is metadata-plane (one Delta snapshot fold +
    one txn fold); DV positions pass through the driver bounded by
    changed-vector cardinality — the same documented bound as
    ``publish_delta``'s sidecar export. Returns the committed txn
    version (the unchanged head when the mirror is already current).
    """
    from .. import txnlog as TL
    from . import roaring as RB
    from .mirror import refresh_mirror, require_mirror

    require_mirror(root, _MIRROR_OPS_DELTA, "delta")
    a_io = io_for(root)
    _v, md, adds = delta_snapshot_arrow(root, version)
    if _column_mapping(md):
        raise DeltaUnsupportedError(
            "refresh of a columnMapping table would expose physical "
            "column names through the txn layer; read_delta + rewrite "
            "instead"
        )
    part_cols = list(md.get("partitionColumns") or [])
    raw_rels = adds.column("path").to_pylist()
    if part_cols:
        pvs = [
            dict(x or [])
            for x in adds.column("partitionValues").to_pylist()
        ]
        if not _hive_layout(raw_rels, pvs, part_cols):
            raise DeltaUnsupportedError(
                "refresh of a non-hive-layout partitioned Delta table "
                "would lose partition columns; read_delta + rewrite "
                "instead"
            )
    # current Delta DV position sets (driver-side, bounded by DV
    # cardinality — the publish-side bound)
    dv_now: dict[str, set] = {}
    for raw, dv in zip(
        raw_rels, adds.column("deletionVector").to_pylist()
    ):
        if not dv:
            continue
        dv = dict(dv) if not isinstance(dv, dict) else dv
        pos = RB.dv_positions(
            root,
            dv["storageType"],
            dv["pathOrInlineDv"],
            dv.get("offset"),
            int(dv["sizeInBytes"]),
            io=a_io,
        )
        card = dv.get("cardinality")
        if card is not None and len(pos) != int(card):
            raise ValueError(
                f"deletion vector for {raw}: decoded {len(pos)} "
                f"positions, descriptor says {card}"
            )
        dv_now[urllib.parse.unquote(raw)] = {int(p) for p in pos}
    rels = {urllib.parse.unquote(r) for r in raw_rels}
    schema_now = (
        None if part_cols else TL._nullable_json(delta_schema(md))
    )
    return refresh_mirror(
        spark,
        root,
        "adopt-delta-refresh",
        rels,
        dv_now,
        schema_now,
        DeltaUnsupportedError,
        writer,
    )


# ---------------------------------------------------------------------------
# spec-conformant log WRITER — interop fixture (tests + gate queries
# build real _delta_log trees with it; it is not a Delta writer
# product feature, the engine's own write path is the txn log)
# ---------------------------------------------------------------------------
def write_delta_commit(
    root: str, version: int, actions: list[dict],
    io: FileIO | None = None,
) -> None:
    """Write one commit file: newline-delimited JSON actions, exactly
    the PROTOCOL.md layout. The write goes through the root's commit-
    point store (:func:`..logstores.log_store_for`) ``put_if_absent``
    — the version name is THE commit point (atomic create-if-absent,
    ``FileExistsError`` = lost the race), so external Delta writes get
    the same local/HDFS/S3-conditional-PUT/coordinator story as the
    engine's own log; the old exists()-then-write had a TOCTOU window
    two writers could both pass. POSIX roots commit through the
    process-global LogStore (deployment overrides keep governing);
    object-store roots commit through their own FileIO."""
    from ..logstores import log_store_for

    io = io or io_for(root)
    log = _log_dir(root)
    io.makedirs(log)
    path = os.path.join(log, f"{version:020d}.json")
    body = (
        "\n".join(json.dumps(a, sort_keys=True) for a in actions) + "\n"
    ).encode("utf-8")
    log_store_for(io).put_if_absent(path, body)


def _fold_proto_txn(
    root: str, version: int
) -> tuple[dict, dict, list]:
    """(protocol, SetTransaction ledger) at ``version`` in ONE pass:
    the newest checkpoint's protocol/txn COLUMNS (column-pruned reads
    — a cleaned log may hold the only copy of a feature upgrade or a
    writer's watermark; a spec-conformant checkpoint without a txn
    column has none) + a single walk of the JSON tail."""
    import pyarrow.parquet as pq

    io = io_for(root)
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
    ledger: dict[str, int] = {}
    lo = 0
    cp = _last_checkpoint_version(root, version, io)
    if cp is not None:
        for part in _checkpoint_parts(root, cp, io):
            pf = pq.ParquetFile(io.parquet_source(part))
            names = set(pf.schema_arrow.names)
            cols = [c for c in ("protocol", "txn") if c in names]
            if not cols:
                continue
            tbl = pq.read_table(io.parquet_source(part), columns=cols)
            if "protocol" in names:
                for row in tbl.column("protocol").to_pylist():
                    if row:
                        proto = {
                            k: v for k, v in row.items()
                            if v is not None
                        }
            if "txn" in names:
                for row in tbl.column("txn").to_pylist():
                    if row and row.get("appId") is not None:
                        ledger[row["appId"]] = int(row["version"])
        lo = cp + 1
    versions = _commit_versions(root, io)
    missing = [v for v in range(lo, version + 1) if v not in versions]
    for v in sorted(versions):
        if v < lo:
            continue
        if v > version:
            break
        for line in io.read_text(
            os.path.join(_log_dir(root), f"{v:020d}.json")
        ).splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "protocol" in action:
                proto = action["protocol"]
            elif "txn" in action:
                t = action["txn"]
                if t.get("appId") is not None:
                    ledger[t["appId"]] = int(t["version"])
    return proto, ledger, missing


def _fold_protocol(root: str, version: int) -> dict:
    """The protocol in force at ``version`` (checkpoint row + tail)."""
    proto, _ledger, _missing = _fold_proto_txn(root, version)
    return proto


def write_delta_checkpoint(root: str, version: int) -> None:
    """Fold commits ≤ version into a classic single-file parquet
    checkpoint (+ ``_last_checkpoint``) with the spec's column layout:
    one action per row, struct columns ``protocol`` / ``metaData`` /
    ``add`` / ``txn`` (each row non-null in exactly one). The
    protocol row is the FOLDED protocol (a DV-bearing table
    checkpoints reader 3 / writer 7 + features, not a hardcoded 1/2),
    and transaction identifiers are carried as the spec requires —
    the latest SetTransaction version per appId survives log cleanup,
    so idempotent streaming writers keep their ledger."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    _v, md, adds = delta_snapshot(root, version)
    proto, ledger, _missing = _fold_proto_txn(root, version)
    proto_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("deletionVector", dv_t),
        ]
    )
    txn_t = pa.struct(
        [
            ("appId", pa.string()),
            ("version", pa.int64()),
            ("lastUpdated", pa.int64()),
        ]
    )
    txns = sorted(ledger.items())
    n = 2 + len(adds) + len(txns)
    proto_rows = [
        {
            "minReaderVersion": int(proto.get("minReaderVersion", 1)),
            "minWriterVersion": int(proto.get("minWriterVersion", 2)),
            "readerFeatures": proto.get("readerFeatures"),
            "writerFeatures": proto.get("writerFeatures"),
        }
    ] + [None] * (n - 1)
    meta_rows = [None] + [
        {
            "id": md.get("id", "meta"),
            "format": {"provider": "parquet"},
            "schemaString": md["schemaString"],
            "partitionColumns": list(md.get("partitionColumns") or []),
            "configuration": sorted(
                (md.get("configuration") or {}).items()
            ),
        }
    ] + [None] * (n - 2)
    add_rows = [None, None] + [
        {
            "path": a["path"],
            "partitionValues": sorted(
                (a.get("partitionValues") or {}).items()
            ),
            "size": int(a.get("size", 0)),
            "modificationTime": int(a.get("modificationTime", 0)),
            "dataChange": bool(a.get("dataChange", True)),
            "stats": a.get("stats"),
            "deletionVector": (
                {
                    k: a["deletionVector"].get(k)
                    for k in (
                        "storageType", "pathOrInlineDv", "offset",
                        "sizeInBytes", "cardinality",
                    )
                }
                if a.get("deletionVector")
                else None
            ),
        }
        for a in adds
    ] + [None] * len(txns)
    txn_rows = [None] * (2 + len(adds)) + [
        {"appId": app, "version": int(ver), "lastUpdated": None}
        for app, ver in txns
    ]
    tbl = pa.table(
        {
            "protocol": pa.array(proto_rows, proto_t),
            "metaData": pa.array(meta_rows, meta_t),
            "add": pa.array(add_rows, add_t),
            "txn": pa.array(txn_rows, txn_t),
        }
    )
    import io as _io

    from ..logstores import log_store_for

    log = _log_dir(root)
    # checkpoints are DERIVED, idempotent artifacts: last-writer-wins
    # (put_atomic), never a commit point
    buf = _io.BytesIO()
    pq.write_table(tbl, buf)
    store = log_store_for(io_for(root))
    store.put_atomic(
        os.path.join(log, f"{version:020d}.checkpoint.parquet"),
        buf.getvalue(),
    )
    store.put_atomic(
        os.path.join(log, "_last_checkpoint"),
        json.dumps({"version": version, "size": n}).encode(),
    )


# ---------------------------------------------------------------------------
# write-side interop: publish an engine/txn table AS Delta
# ---------------------------------------------------------------------------
def _delta_stats_json(st: dict | None) -> str | None:
    """txn footer-stats entry ({"rows", "cols": {c: {t,min,max,
    nulls}}}) → Delta add.stats JSON (numRecords/minValues/maxValues/
    nullCount). Conservative: all-null columns record only nullCount,
    unusable columns drop (read-side pruning keeps such files)."""
    if not st:
        return None
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for c, e in (st.get("cols") or {}).items():
        if not isinstance(e, dict):
            continue
        if e.get("nulls") is not None:
            nulls[c] = e["nulls"]
        if e.get("t") == "null":
            continue
        if "min" in e:
            mins[c] = e["min"]
        if "max" in e:
            maxs[c] = e["max"]
    try:
        return json.dumps(
            {
                "numRecords": st.get("rows"),
                "minValues": mins,
                "maxValues": maxs,
                "nullCount": nulls,
            },
            sort_keys=True,
            default=str,
        )
    except (TypeError, ValueError):
        return None  # unserializable stat: the file just isn't pruned


def _hive_pv(rel: str, part_cols: list[str]) -> dict:
    found = {}
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, _, val = seg.partition("=")
            found[k] = urllib.parse.unquote(val)
    return {c: found.get(c) for c in part_cols}


def _pv_of(rel: str, part_cols: list[str]) -> dict:
    """partitionValues for a file Spark's own writer staged: hive
    dirs decoded, the null sentinel mapped back to a null value (the
    spec stores null partition values as null, not the dir name)."""
    return {
        k: (None if v == "__HIVE_DEFAULT_PARTITION__" else v)
        for k, v in _hive_pv(rel, part_cols).items()
    }


def _export_change_data(
    spark, txn_root: str, root: str, v: int, part_cols: list[str]
) -> list[str]:
    """One txn version's row-level changes as ``_change_data``
    parquet shards (full row images + ``_change_type``, hive layout
    matching the table, era schema so old shards read like old data
    files). Exact for append/delete/update (deletion vectors make
    before-images recoverable); merge re-emits surviving rows of
    rewritten files as inserts — txn_changes' documented caveat."""
    import uuid as _uuid

    from .. import txnlog as TL

    io = io_for(root)
    ch = TL.txn_changes(
        spark, txn_root, v - 1, v,
        schema=TL.table_schema(txn_root, v),
        change_types=True,
    ).drop("_commit_version")
    staging = os.path.join(root, f"_staging_{_uuid.uuid4().hex}")
    rels: list[str] = []
    try:
        w = ch.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(io.spark_path(staging))
        rels = _move_staged_parquet(
            staging, root,
            dest_base=os.path.join("_change_data", f"cdc-{v - 1}"),
            io=io,
        )
    finally:
        io.delete_prefix(staging)
    return rels


def _dv_sidecar_tables(root: str, dv_rel: str, io: FileIO, _pq):
    """(file, pos) tables of one txn deletion-vector sidecar — a
    Spark-written DIRECTORY of parquet parts (or, defensively, a
    single file), every byte through the seam."""
    base = os.path.join(root, dv_rel)
    if io.is_dir(base):
        parts = [
            os.path.join(base, n)
            for n in io.walk_files(base)
            if n.endswith(".parquet")
        ]
    else:
        parts = [base]
    for part in parts:
        yield _pq.read_table(
            io.parquet_source(part), columns=["file", "pos"]
        )


def publish_delta(
    spark: SparkSession,
    txn_root: str,
    checkpoint: bool = False,
    change_data_feed: bool = False,
    configuration: dict | None = None,
) -> dict:
    """ZERO-COPY write-side interop (the :func:`..iceberg
    .publish_iceberg` twin and the inverse of :func:`adopt_delta`):
    publish an engine txn table AS a valid ``_delta_log`` over the
    SAME data files — any Delta reader (including this module's, which
    is how the gate verifies it) serves the table, every txn version a
    time-travelable Delta version (txn ``v`` → Delta commit ``v-1``).

    Mapping per version: the live-set diff becomes remove/add actions
    (layout-only txn OPTIMIZE publishes as ``dataChange=false``, so
    Delta streaming consumers skip it exactly like txn_stream does);
    txn footer stats translate to ``add.stats`` (Delta-side data
    skipping works immediately); hive partition dirs become
    ``partitionValues`` (neither system stores partition columns in
    data files — layouts match); schema changes re-emit ``metaData``.
    DELETION VECTORS translate for real: a version whose DV state
    changed re-adds the file with a spec-framed descriptor — all of a
    version's vectors packed into ONE ``deletion_vector_<uuid>.bin``
    sidecar at per-file offsets (:func:`..roaring.write_dv_file_multi`),
    and the protocol auto-selects reader 3 + ``deletionVectors`` only
    when some version actually needs it.

    Re-publish after new txn commits appends only the missing Delta
    commits (version arithmetic is fixed, so the call is idempotent).
    Scale note: this is a metadata-plane export — one pass over commit
    diffs; sidecar positions for DV'd files do pass through the driver
    (bounded by DV cardinality, an offline-export path)."""
    import uuid as _uuid

    from .. import txnlog as TL
    from . import roaring as RB

    if not TL.is_txn_table(txn_root):
        raise ValueError(f"{txn_root}: not a txn table")
    head = TL.latest_version(txn_root)
    root = TL._root(txn_root)  # FileIO-aware (object-store txn roots)
    io = io_for(root)
    published = _commit_versions(txn_root) if io.is_dir(
        _log_dir(txn_root)
    ) else []
    start = (max(published) + 2) if published else 1  # txn v of next
    if start > head:
        return {"delta_versions": len(published), "published": []}
    # versions below the fold horizon were released by
    # txn_log_cleanup: a Delta log must be CONTIGUOUS from commit 0,
    # so a fresh publish cannot start mid-history, and a republish
    # whose published tail fell below the horizon cannot bridge the
    # gap — both fail closed (publish before cleaning the log)
    horizon = TL.fold_horizon(txn_root)
    # a republish also folds at start-1 for its prev_live baseline,
    # so the whole window [start-1, head] (or [1, head] when fresh)
    # must sit at/above the horizon
    if max(start - 1, 1) < horizon:
        raise DeltaUnsupportedError(
            f"txn history below version {horizon} was released by "
            "txn_log_cleanup and cannot be published as Delta "
            "commits (the log must be contiguous) — publish before "
            "cleaning, or convert the current snapshot into a fresh "
            "root"
        )
    # protocol needs to know up front whether ANY version carries DVs
    any_dv = any(
        any(TL.snapshot_dv(txn_root, v)[1].values())
        for v in range(horizon, head + 1)
    )
    proto = (
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
        if any_dv
        else {"minReaderVersion": 1, "minWriterVersion": 2}
    )
    # Re-publish: the already-committed protocol governs — if a NEW
    # version carries DVs but the published log predates the feature,
    # an upgraded protocol action must land in that commit (protocol
    # actions are valid in any commit, per spec), else spec-conformant
    # readers honoring protocol 1/2 ignore the deletionVector field
    # and silently resurrect deleted rows.
    proto_upgrade: dict | None = None
    if start > 1:
        committed = _fold_protocol(txn_root, start - 2)  # delta ver
        feats = set(committed.get("readerFeatures") or [])
        new_dv = any(
            any(TL.snapshot_dv(txn_root, v)[1].values())
            for v in range(start, head + 1)
        )
        if new_dv and (
            int(committed.get("minReaderVersion", 1)) < 3
            or "deletionVectors" not in feats
        ):
            proto_upgrade = proto  # the DV-capable protocol
    prev_live: set = set()
    prev_dv: dict = {}
    prev_schema = None
    part_cols: list[str] = []
    if start > 1:
        _v, prev_live = TL.snapshot(txn_root, start - 1)
        _v, prev_dv = TL.snapshot_dv(txn_root, start - 1)
        prev_schema = TL.table_schema_json(txn_root, start - 1)
        _v0, md0, _a = delta_snapshot_arrow(txn_root)
        part_cols = list(md0.get("partitionColumns") or [])
    done = []
    for v in range(start, head + 1):
        _ver, stats_map = TL.snapshot_with_stats(txn_root, v)
        live = set(stats_map)
        _ver, dv_map = TL.snapshot_dv(txn_root, v)
        schema_json = TL.table_schema_json(txn_root, v)
        if schema_json is None:
            raise DeltaUnsupportedError(
                f"txn version {v} records no schema — publish needs "
                "schema-tracked tables (append via txn_append)"
            )
        c = TL._read_commit(txn_root, v)
        dc = bool(c.get("data_change", True))
        if v == start and not published:
            part_cols = sorted(
                {
                    seg.partition("=")[0]
                    for rel in live
                    for seg in rel.split(os.sep)[:-1]
                    if "=" in seg
                }
            )
        acts: list[dict] = []
        if v == 1:
            acts.append({"protocol": proto})
        elif v == start and proto_upgrade is not None:
            acts.append({"protocol": proto_upgrade})
        if schema_json != prev_schema:
            acts.append(
                {
                    "metaData": {
                        "id": os.path.basename(
                            os.path.abspath(txn_root)
                        ),
                        "format": {
                            "provider": "parquet", "options": {}
                        },
                        "schemaString": schema_json,
                        "partitionColumns": part_cols,
                        "configuration": dict(
                            configuration or {},
                            **(
                                {"delta.enableChangeDataFeed": "true"}
                                if change_data_feed
                                else {}
                            ),
                        ),
                    }
                }
            )
        new = live - prev_live
        gone = prev_live - live
        dv_changed = {
            f
            for f in live
            if f not in new
            and (dv_map.get(f) or []) != (prev_dv.get(f) or [])
        }
        # one sidecar per published version carries every vector
        descs: dict[str, dict] = {}
        need_dv = sorted(
            f for f in (new | dv_changed) if dv_map.get(f)
        )
        if need_dv:
            per_key = {}
            import pyarrow.parquet as _pq

            for f in need_dv:
                dead: set[int] = set()
                for e in dv_map[f]:
                    # txn DV sidecars are Spark-written DIRECTORIES
                    # of parquet parts: iterate them through the seam
                    for t in _dv_sidecar_tables(
                        root, e["dv"], io, _pq
                    ):
                        dead.update(
                            p
                            for ff, p in zip(
                                t.column("file").to_pylist(),
                                t.column("pos").to_pylist(),
                            )
                            if ff == f
                        )
                per_key[f] = sorted(dead)
            u = _uuid.UUID(
                int=int.from_bytes(
                    __import__("hashlib")
                    .md5(f"{txn_root}:{v}".encode())
                    .digest(),
                    "big",
                )
            )
            offs = RB.write_dv_file_multi(
                os.path.join(root, f"deletion_vector_{u}.bin"),
                per_key, io=io,
            )
            for f, (off, size, card) in offs.items():
                descs[f] = {
                    "storageType": "u",
                    "pathOrInlineDv": RB.make_uuid_descriptor_path(u),
                    "offset": off,
                    "sizeInBytes": size,
                    "cardinality": card,
                }
        for f in sorted(gone | dv_changed):
            acts.append(
                {"remove": {"path": _quote_rel(f), "dataChange": dc}}
            )
        for f in sorted(new | dv_changed):
            add = {
                "path": _quote_rel(f),
                "partitionValues": _pv_of(f, part_cols),
                "size": (
                    io.size(os.path.join(root, f))
                    if io.exists(os.path.join(root, f))
                    else 0
                ),
                "modificationTime": 0,
                "dataChange": dc,
                "stats": _delta_stats_json(stats_map.get(f)),
            }
            if f in descs:
                add["deletionVector"] = descs[f]
            acts.append({"add": add})
        if change_data_feed and dc and (gone or dv_changed):
            # a version that deletes/rewrites rows ships its EXACT
            # change description — delta_cdf then serves these files
            # instead of failing closed on the DV'd adds
            for rel in _export_change_data(
                spark, txn_root, root, v, part_cols
            ):
                acts.append(
                    {"cdc": {
                        "path": _quote_rel(rel),
                        "partitionValues": _pv_of(rel, part_cols),
                        "size": io.size(os.path.join(root, rel)),
                        "dataChange": False,
                    }}
                )
        write_delta_commit(txn_root, v - 1, acts)
        done.append(v - 1)
        prev_live, prev_dv, prev_schema = live, dv_map, schema_json
    if checkpoint and done:
        write_delta_checkpoint(txn_root, done[-1])
    return {"delta_versions": done[-1] + 1, "published": done}


def delta_cdf(
    spark: SparkSession,
    root: str,
    from_version: int | None,
    to_version: int | None = None,
) -> DataFrame:
    """Delta CHANGE DATA FEED read — the exact row-level change
    stream for tables whose writers recorded it (``cdc`` actions +
    ``_change_data`` files, what ``delta.enableChangeDataFeed``
    produces):

    - a commit carrying ``cdc`` actions serves EXACTLY those files'
      rows (``_change_type`` = insert / delete / update_preimage /
      update_postimage — the column lives IN the cdc files); its
      add/remove actions are ignored for CDC purposes, per spec;
    - a commit without them (CDF off at write time) emits its
      ``dataChange`` adds as ``insert`` rows, and FAILS CLOSED on
      removes or DV'd adds — without cdc files a delete/update cannot
      be reconstructed row-accurately (:func:`delta_changes` is the
      weaker adds-only feed with opt-in re-emission semantics).

    Rows are tagged ``_commit_version``; range contract matches
    :func:`delta_changes` (``(from, to]``, ``None``/``-1`` = from the
    beginning, cleaned-up commits raise)."""
    if from_version is None:
        from_version = -1
    versions = _commit_versions(root)
    head = max(versions) if versions else -1
    to_v = head if to_version is None else to_version
    if not -1 <= from_version <= to_v <= head:
        raise ValueError(
            f"bad version range ({from_version}, {to_v}] with head {head}"
        )
    missing = [
        v for v in range(from_version + 1, to_v + 1) if v not in versions
    ]
    if missing:
        raise ValueError(
            f"{root}: commits {missing} cleaned up — CDF past log "
            "cleanup is unrecoverable"
        )
    _v, md, _adds = delta_snapshot_arrow(root, to_v)
    schema = delta_schema(md)
    cdf_md = dict(md)
    cdf_md["schemaString"] = json.dumps(
        StructType(
            schema.fields
            + [StructType.fromDDL("_change_type string").fields[0]]
        ).jsonValue()
    )
    io = io_for(root)
    pieces = []
    for v in range(from_version + 1, to_v + 1):
        cdc_v, adds_v, removes_v, dv_v = [], [], False, False
        for line in io.read_text(
            os.path.join(_log_dir(root), f"{v:020d}.json")
        ).splitlines():
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    cdc_v.append(action["cdc"])
                elif "add" in action and action["add"].get(
                    "dataChange", True
                ):
                    adds_v.append(action["add"])
                    if action["add"].get("deletionVector"):
                        dv_v = True
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    removes_v = True
        if cdc_v:
            # the cdc files ARE the commit's change description
            df = _scan_paths(
                spark, root, cdf_md,
                [c["path"] for c in cdc_v],
                [c.get("partitionValues") or {} for c in cdc_v],
            )
        elif removes_v or dv_v:
            raise ValueError(
                f"{root}: commit {v} deletes/rewrites rows but wrote "
                "no cdc actions — its row-level changes cannot be "
                "reconstructed (enable CDF at write time, or use "
                "delta_changes with on_remove='ignore' for the "
                "adds-only approximation)"
            )
        elif adds_v:
            df = _scan_adds(spark, root, md, adds_v).withColumn(
                "_change_type", F.lit("insert")
            )
        else:
            continue
        pieces.append(
            df.withColumn("_commit_version", F.lit(v).cast("long"))
        )
    if not pieces:
        from ..storage import local_rows_df

        out_schema = StructType(
            schema.fields
            + [StructType.fromDDL(
                "_change_type string, _commit_version long"
            ).fields[i] for i in (0, 1)]
        )
        return local_rows_df(spark, [], out_schema)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# write-side interop: idempotent STREAMING writer (SetTransaction)
# ---------------------------------------------------------------------------
def last_txn_versions(root: str, through: int | None = None) -> dict:
    """The writer ledger — latest SetTransaction (``txn`` action)
    version per ``appId``, folded exactly like a snapshot: checkpoint
    base (the spec requires checkpoints to carry transaction
    identifiers; a conformant checkpoint without a ``txn`` column has
    none) + the JSON tail. This is what makes an idempotent streaming
    writer idempotent ACROSS log cleanup."""
    versions = _commit_versions(root)
    head = max(versions) if versions else -1
    cp = _last_checkpoint_version(root, through)
    to_v = (
        max(head, -1 if cp is None else cp)
        if through is None
        else through
    )
    _proto, ledger, missing = _fold_proto_txn(root, to_v)
    if missing:
        raise ValueError(
            f"{root}: commits {missing} cleaned up below the ledger "
            "fold — transaction identifiers unrecoverable"
        )
    return ledger


def delta_streaming_sink(
    root: str,
    app_id: str,
    partition_by: list[str] | None = None,
    checkpoint_every: int | None = 10,
    merge_schema: bool = False,
):
    """An EXACTLY-ONCE streaming sink writing an EXTERNAL Delta table
    — the write-side twin of ``readStream.format('delta_table')`` and
    the streaming leg of :func:`publish_delta`. Returns a
    ``foreachBatch`` callable.

    Idempotence is the Delta spec's own mechanism (Transaction
    Identifiers): every commit carries ``{"txn": {appId, version:
    batchId}}``, and a batch whose id is ≤ the ledger's entry for
    ``app_id`` is a REPLAY — dropped without writing, so worst-case
    redelivery (a rebuilt stream checkpoint re-offering every batch)
    lands one copy. The ledger folds checkpoint + tail
    (:func:`last_txn_versions`), so cleanup-safe once checkpoints are
    written. Any Delta reader serves the result; concurrent writers
    race on the commit file itself (atomic create) and losers re-fold
    before retrying, the LogStore contract.

    The first commit creates the table (protocol 1/2, metaData from
    the batch schema, ``partition_by`` as partitionColumns — hive
    layout, so the data files exclude partition columns exactly like
    the batch reader expects); later batches must match the table's
    schema and partitioning. Scale shape: the data write is Spark's
    own distributed parquet write into a staging dir inside the table
    (same filesystem — renames, not copies); only the per-file
    METADATA (footer stats via :func:`..txnlog.collect_file_stats`,
    distributed above its threshold) passes the driver.
    ``checkpoint_every`` (default 10, the Delta writers' cadence)
    writes a parquet checkpoint after every Nth commit, keeping
    snapshot folds O(checkpoint + tail) and the SetTransaction
    ledger safe across :func:`cleanup_delta_log`; pair with
    :func:`optimize_delta` / :func:`vacuum_delta` for the small-file
    and reclaim sides of long-running-sink maintenance."""

    def _sink(df, batch_id: int) -> None:
        import time as _time
        import uuid as _uuid

        from .. import txnlog as TL

        io = io_for(root)
        spark = df.sparkSession
        part_cols = list(partition_by or [])
        try:
            versions = _commit_versions(root)
            cp0 = _last_checkpoint_version(root, None)
        except DeltaUnsupportedError:
            versions, cp0 = [], None  # fresh table: no _delta_log yet
        md = None
        evolved_meta = None
        if versions or cp0 is not None:
            _v, md, _adds = delta_snapshot_arrow(root)
            table_parts = list(md.get("partitionColumns") or [])
            if partition_by is not None and part_cols != table_parts:
                raise ValueError(
                    f"{root}: partition_by {part_cols} != table's "
                    f"partitionColumns {table_parts}"
                )
            part_cols = table_parts
            want = [
                (f.name, f.dataType) for f in delta_schema(md).fields
            ]
            got = [(f.name, f.dataType) for f in df.schema.fields]
            if sorted(want) != sorted(got):
                want_d = dict(want)
                conflicts = [
                    n for n, t in got
                    if n in want_d and want_d[n] != t
                ]
                if conflicts or not merge_schema:
                    raise ValueError(
                        f"{root}: batch schema {got} does not match "
                        f"the table schema {want}"
                        + (
                            f" (type conflicts on {conflicts})"
                            if conflicts
                            else " (additive evolution needs "
                            "merge_schema=True)"
                        )
                    )
                # additive evolution (Delta's mergeSchema): new batch
                # columns APPEND to the table schema; a batch missing
                # existing columns just writes files without them
                # (the declared-schema read null-fills)
                extra = [
                    f for f in df.schema.fields if f.name not in want_d
                ]
                if extra:
                    evolved = StructType(
                        delta_schema(md).fields + extra
                    )
                    evolved_meta = dict(md)
                    evolved_meta["schemaString"] = json.dumps(
                        evolved.jsonValue()
                    )
            if last_txn_versions(root).get(app_id, -1) >= batch_id:
                return  # replayed batch: the ledger refuses it
        missing = [c for c in part_cols if c not in df.columns]
        if missing:
            raise ValueError(f"partition columns {missing} not in batch")

        staging = os.path.join(root, f"_staging_{_uuid.uuid4().hex}")
        try:
            w = df.write.mode("overwrite")
            if part_cols:
                w = w.partitionBy(*part_cols)
            w.parquet(io.spark_path(staging))
            rels = _move_staged_parquet(staging, root, io=io)
        finally:
            io.delete_prefix(staging)

        stats = TL.collect_file_stats(root, rels, spark, io=io)
        now_ms = int(_time.time() * 1000)
        adds = []
        for rel in sorted(rels):
            st = stats.get(rel)
            if st and st.get("rows") == 0:
                io.delete(os.path.join(root, rel))
                continue  # an empty task output: not a data file
            adds.append(
                {
                    "add": {
                        "path": _quote_rel(rel),
                        "partitionValues": _pv_of(rel, part_cols),
                        "size": io.size(os.path.join(root, rel)),
                        "modificationTime": now_ms,
                        "dataChange": True,
                        "stats": _delta_stats_json(st),
                    }
                }
            )

        head_actions: list[dict] = []
        if evolved_meta is not None:
            head_actions = [{"metaData": evolved_meta}]
        if md is None:
            head_actions = [
                {"protocol": {"minReaderVersion": 1,
                              "minWriterVersion": 2}},
                {"metaData": {
                    "id": _uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": part_cols,
                    "configuration": {},
                    "createdTime": now_ms,
                }},
            ]
        actions = head_actions + adds + [
            {"txn": {"appId": app_id, "version": int(batch_id),
                     "lastUpdated": now_ms}}
        ]
        for _attempt in range(64):
            try:
                vs = _commit_versions(root)
                cp = _last_checkpoint_version(root, None)
            except DeltaUnsupportedError:
                vs, cp = [], None
            v = max(max(vs, default=-1), -1 if cp is None else cp) + 1
            try:
                write_delta_commit(root, v, actions, io=io)
                if checkpoint_every and (v + 1) % checkpoint_every == 0:
                    # the Delta writers' own cadence (every 10th
                    # commit): keeps snapshot folds O(checkpoint +
                    # tail) and makes the ledger cleanup-safe
                    write_delta_checkpoint(root, v)
                return
            except FileExistsError:
                # lost the commit race: re-fold the ledger — the
                # winner may have been a replica landing THIS batch
                if last_txn_versions(root).get(app_id, -1) >= batch_id:
                    for a in adds:  # orphan our duplicate data files
                        # add.path is percent-encoded; decode before
                        # touching the store or names with '%' leak
                        # the loser's duplicates until vacuum
                        p = os.path.join(
                            root,
                            urllib.parse.unquote(a["add"]["path"]),
                        )
                        io.delete(p)
                    return
                if md is None and _commit_versions(root):
                    # someone else CREATED the table under us — our
                    # queued metaData would clobber theirs; fail the
                    # batch (Spark retries it, which re-enters the
                    # existing-table path and validates schemas)
                    raise ValueError(
                        f"{root}: table created concurrently — "
                        "retry the batch against the existing table"
                    )
        raise RuntimeError(
            f"{root}: could not commit batch {batch_id} after 64 "
            "attempts (livelocked on concurrent writers)"
        )

    return _sink


# ---------------------------------------------------------------------------
# maintenance for Delta tables this engine writes: OPTIMIZE / VACUUM /
# log cleanup — the small-file story for streaming-sink tables
# ---------------------------------------------------------------------------
def _move_staged_parquet(
    staging: str, root: str, dest_base: str = "",
    io: FileIO | None = None,
) -> list[str]:
    """Promote Spark's staged parquet output into the table root
    (under ``dest_base`` if given), preserving hive dirs; returns the
    table-relative paths. POSIX: same-filesystem renames. Object
    stores: server-side copy + delete per file (``FileIO.move_file``)
    — never atomic, which is fine because NO reader follows a data
    file until the log commit (put_if_absent) references it. The ONE
    copy of this loop — sink, OPTIMIZE and CDF export all route
    through it."""
    io = io or io_for(root)
    rels = []
    for rel0 in io.walk_files(staging):
        if not rel0.endswith(".parquet"):
            continue
        rel = os.path.join(dest_base, rel0)
        io.move_file(
            os.path.join(staging, rel0), os.path.join(root, rel)
        )
        rels.append(rel)
    return sorted(rels)


def optimize_delta(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 << 20,
    zorder_by: list[str] | None = None,
) -> dict:
    """OPTIMIZE [ZORDER BY] for an external Delta table — the
    :func:`..txnlog.txn_optimize` shape on the Delta log, and the
    maintenance companion of :func:`delta_streaming_sink` (a paced
    streaming writer's natural pathology is many small files; at
    100 TB that is the difference between a scan of 10⁶ files and
    10⁴).

    Candidates: live files under ``target_file_bytes``, plus every
    DV-carrying file (rewriting one MATERIALIZES its deletions —
    dead rows and the vector go away together); with ``zorder_by``,
    all live files (re-clustering rewrites the layout). They are read
    back in ONE distributed job through the DV-aware scan,
    range-partitioned on (partition cols, z-key) and sorted within
    tasks for tight row-group stats, then committed as
    remove+add with ``dataChange=false`` — same rows, new bytes, so
    streaming consumers and the CDF skip the commit entirely.
    Superseded originals stay on disk for time travel;
    :func:`vacuum_delta` reclaims them. Fresh footer stats are
    recorded on the new adds, so data skipping benefits immediately.

    Fails (no retry) if a concurrent commit wins the log race —
    rerun; compaction commutes with appends but not with a rival
    rewrite of the same files.

    On a TXN-BACKED root, layout maintenance belongs to whichever
    log OWNS the data: a Delta-sourced conversion mirror
    (``mirror_source(root) == "delta"``) may optimize here — this
    _delta_log IS the source, and the next conversion refresh tracks
    the rewrite as a live-set diff. Any other txn-backed root (an
    engine-owned table whose _delta_log is a publish PRODUCT, or an
    Iceberg-sourced mirror) fails closed: republish re-derives this
    tree by version arithmetic, and compacting the derived view
    would fork it — run ``txn_optimize`` (engine-owned) or optimize
    the source format (conversion mirrors) instead."""
    import time as _time

    from .. import txnlog as TL

    if TL.is_txn_table(root):
        from .convert import mirror_source

        if mirror_source(root) != "delta":
            raise DeltaUnsupportedError(
                f"{root}: this _delta_log is a DERIVED view of the "
                "txn log — optimizing it directly would fork the "
                "trees; run txn_optimize (engine-owned tables) or "
                "optimize the source format (conversion mirrors), "
                "then re-publish/re-convert"
            )
    io = io_for(root)
    _v, md, adds = delta_snapshot(root)
    part_cols = list(md.get("partitionColumns") or [])
    sizes = {}
    for a in adds:
        try:
            sizes[a["path"]] = io.size(
                os.path.join(root, urllib.parse.unquote(a["path"]))
            )
        except OSError:
            sizes[a["path"]] = target_file_bytes
    if zorder_by:
        cand = list(adds)
    else:
        cand = [
            a
            for a in adds
            if sizes[a["path"]] < target_file_bytes
            or a.get("deletionVector")
        ]
    if len(cand) < 2 and not any(a.get("deletionVector") for a in cand):
        return {"rewritten_files": 0, "new_files": 0, "skipped": True}
    df = _scan_adds(spark, root, md, cand)
    total = sum(sizes[a["path"]] for a in cand)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    keys: list = list(part_cols)
    if zorder_by:
        from ..layout import zorder_key

        joined, z = zorder_key(df, zorder_by)
        df = joined.withColumn("_z", z).select(*df.columns, "_z")
        keys.append("_z")
    if keys:
        out = df.repartitionByRange(n_out, *keys).sortWithinPartitions(
            *keys
        )
        if zorder_by:
            out = out.drop("_z")
    else:
        out = df.coalesce(min(n_out, len(cand)))

    import uuid as _uuid

    staging = os.path.join(root, f"_staging_{_uuid.uuid4().hex}")
    try:
        w = out.write.mode("overwrite")
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(io.spark_path(staging))
        rels = _move_staged_parquet(staging, root, io=io)
    finally:
        io.delete_prefix(staging)

    stats = TL.collect_file_stats(root, rels, spark, io=io)
    now_ms = int(_time.time() * 1000)
    actions = [
        {"remove": {"path": a["path"], "dataChange": False,
                    "deletionTimestamp": now_ms}}
        for a in sorted(cand, key=lambda a: a["path"])
    ]
    kept = []
    for rel in sorted(rels):
        st = stats.get(rel)
        if st and st.get("rows") == 0:
            io.delete(os.path.join(root, rel))
            continue
        kept.append(rel)
        actions.append(
            {"add": {
                "path": _quote_rel(rel),
                "partitionValues": _pv_of(rel, part_cols),
                "size": io.size(os.path.join(root, rel)),
                "modificationTime": now_ms,
                "dataChange": False,
                "stats": _delta_stats_json(st),
            }}
        )
    # commit at the FOLDED version + 1: a rival commit during the
    # rewrite job (a DV delete on a candidate, a second optimize)
    # then surfaces as FileExistsError instead of silently landing on
    # top of state the rewrite never saw — and the fold's version is
    # checkpoint-aware, so a cleaned JSON log still optimizes
    write_delta_commit(root, _v + 1, actions, io=io)
    return {
        "version": _v + 1,
        "rewritten_files": len(cand),
        "new_files": len(kept),
        "bytes_before": total,
        "skipped": False,
    }


def vacuum_delta(root: str, keep_versions: int = 1) -> dict:
    """Reclaim data files and DV sidecars unreferenced by the newest
    ``keep_versions`` snapshots — Delta VACUUM with a version-count
    retention (this engine's logs carry no trustworthy wall-clock).
    Time travel to vacuumed versions, and streaming replay across
    them, become unrecoverable — exactly Delta's contract.

    Driver-side listing + referenced-set fold (metadata-plane; the
    fold is the same columnar snapshot every reader does; the listing
    is ONE recursive ``walk_files`` — a single recursive ListObjects
    on an object store). Never touches ``_delta_log``
    (:func:`cleanup_delta_log` is the log side) or ``_change_data``
    (the CDF keeps its own feed). On a multi-log root, files a
    sibling txn/Iceberg tree still references are spared — see
    ``refsets.py`` for the cross-log retention contract."""
    io = io_for(root)
    try:
        versions = set(delta_versions(root))
    except DeltaUnsupportedError:
        versions = set()
    cp = _last_checkpoint_version(root, None)
    if cp is not None:
        versions.add(cp)  # a cleaned log folds from the checkpoint
    if not versions:
        return {"removed_files": 0, "kept_versions": []}
    keep = sorted(versions)[-max(1, keep_versions):]
    referenced: set = set()
    for v in keep:
        _ver, _md, adds = delta_snapshot(root, v)
        for a in adds:
            referenced.add(
                os.path.normpath(urllib.parse.unquote(a["path"]))
            )
            dv = a.get("deletionVector")
            if dv and dv.get("storageType") == "u":
                from . import roaring as RB

                referenced.add(
                    os.path.normpath(
                        RB.dv_relative_path(dv["pathOrInlineDv"])
                    )
                )
    # MULTI-LOG roots: a file this log's retention drops may still be
    # referenced by a coexisting txn/Iceberg tree's remaining history
    # (adopt/publish/convert products) — deleting it would corrupt
    # the sibling's reads. Protected until EVERY log lets go
    # (refsets.py, the stated cross-log retention contract).
    from .refsets import is_protected, sibling_referenced

    sib_files, sib_dirs = sibling_referenced(root, exclude="delta")
    removed = []
    for rel in io.walk_files(root):
        rel = os.path.normpath(rel)
        top = rel.split(os.sep)[0]
        # _dv / _txn_log: the engine's own txn layer (adopt/publish
        # require txn_root == delta_root, so dual-log roots are the
        # NORMAL product of this module's workflows — their sidecars
        # are .parquet but never Delta-referenced); metadata /
        # pub-deletes: a coexisting Iceberg view of the same files.
        # Deleting any of these corrupts the sibling log's reads.
        # _staging_*: a live writer may be staging here. ONE list
        # (refsets.METADATA_DIRS) so the verbs can't drift.
        from .refsets import METADATA_DIRS

        if top in METADATA_DIRS or top.startswith("_staging_"):
            continue
        fn = os.path.basename(rel)
        if fn.startswith("."):
            continue
        if not (
            fn.endswith(".parquet")
            or fn.startswith("deletion_vector_")
        ):
            continue
        if rel not in referenced and not is_protected(
            rel, sib_files, sib_dirs
        ):
            io.delete(os.path.join(root, rel))
            removed.append(rel)
    # prune emptied hive dirs (no-op on object stores)
    io.remove_empty_dirs(root)
    return {"removed_files": len(removed), "kept_versions": keep}


def cleanup_delta_log(root: str, keep_commits: int = 0) -> dict:
    """Metadata cleanup: drop JSON commits (and older checkpoints)
    at or below the newest checkpoint — the snapshot folds from the
    checkpoint alone, and :func:`last_txn_versions` keeps the writer
    ledger because checkpoints carry the ``txn`` column. Time travel
    and streaming replay below the checkpoint become unrecoverable
    (they raise, never mis-read).

    ``keep_commits`` is the RETENTION knob (Delta's log-retention
    duration, expressed in commits): the newest N JSON commits stay
    even below the checkpoint, so live streaming consumers lagging up
    to N commits — and stream RESTARTS, which re-plan their last
    batch from the offset log — keep replaying. Retention must exceed
    max consumer lag + batch span; the external-churn soak
    (tools/soak_external.py) exercises exactly this race."""
    io = io_for(root)
    cp = _last_checkpoint_version(root, None)
    if cp is None:
        return {"removed_commits": 0, "checkpoint": None}
    head = max(_commit_versions(root), default=cp)
    # keep the NEWEST keep_commits JSONs: versions > head - keep stay
    floor = head - max(0, int(keep_commits))
    log = _log_dir(root)
    removed = 0
    for n in io.list_dir(log):
        full = os.path.join(log, n)
        if n.endswith(".json") and n.split(".")[0].isdigit():
            if int(n.split(".")[0]) <= min(cp, floor):
                io.delete(full)
                removed += 1
        elif ".checkpoint." in n and n.endswith(".parquet"):
            cp_v = n.split(".checkpoint.")[0]
            if cp_v.isdigit() and int(cp_v) < cp:
                io.delete(full)
    return {"removed_commits": removed, "checkpoint": cp}
