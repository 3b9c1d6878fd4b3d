"""Format auto-detection: one entry point that opens ANY table this
engine can read — its own transaction-log tables, external Delta and
Iceberg trees, or a plain parquet directory — by looking at the
layout markers each format defines (``_txn``, ``_delta_log``,
``metadata/v*.metadata.json``). The detection order puts the engine's
own log first: an adopted external table carries BOTH its original
log and ``_txn``, and the txn view is the one the engine maintains
(deletion vectors, later commits) after adoption."""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def detect_table_format(path: str) -> str:
    """'txn' | 'delta' | 'iceberg' | 'parquet' (never guesses: a
    directory with no marker and no parquet files raises). Layout
    probes go through the FileIO seam, so object-store-resident
    tables detect too (the txn probe stays POSIX — the engine's own
    log is local/FUSE by its LogStore contract)."""
    from .. import txnlog as TL
    from .fileio import io_for

    io = io_for(path)
    if "://" not in path and TL.is_txn_table(path):
        return "txn"
    if "://" in path and io.is_dir(os.path.join(path, TL.TXN_DIR)):
        # a txn marker on an object-store root: the engine's own log
        # is POSIX/FUSE by its LogStore contract — falling through to
        # the parquet walk would serve DELETED/pre-compaction rows
        raise ValueError(
            f"{path}: carries a {TL.TXN_DIR} marker — engine txn "
            "tables are POSIX-rooted (open via a local mount), and a "
            "blind parquet read would resurrect deleted rows"
        )
    if io.is_dir(os.path.join(path, "_delta_log")):
        return "delta"
    meta = os.path.join(path, "metadata")
    if io.is_dir(meta) and any(
        re.fullmatch(r"v\d+\.metadata\.json", n)
        for n in io.list_dir(meta)
    ):
        return "iceberg"
    names = io.list_dir(path) if io.is_dir(path) else []
    stack = [os.path.join(path, n) for n in names]
    seen: set[str] = set()
    budget = 100_000  # cycle/size backstop (symlinked dirs loop)
    while stack and budget > 0:
        budget -= 1
        p2 = stack.pop()
        real = os.path.realpath(p2) if "://" not in p2 else p2
        if real in seen:
            continue
        seen.add(real)
        if io.is_dir(p2):
            stack.extend(
                os.path.join(p2, n) for n in io.list_dir(p2)
            )
        elif p2.endswith(".parquet"):
            return "parquet"
    raise ValueError(
        f"{path}: no table here — expected a _txn, _delta_log, "
        "metadata/v*.metadata.json marker or parquet files"
    )


def format_marker_present(path: str, fmt: str) -> bool:
    """Does ``path`` carry ``fmt``'s own layout marker? (Dual-log
    roots — the normal product of adopt/publish — carry several; a
    caller PINNING a format validates against that format's marker,
    not the detection order.)"""
    from .. import txnlog as TL
    from .fileio import io_for

    io = io_for(path)
    if fmt == "txn":
        return "://" not in path and TL.is_txn_table(path)
    if fmt == "delta":
        return io.is_dir(os.path.join(path, "_delta_log"))
    if fmt == "iceberg":
        meta = os.path.join(path, "metadata")
        return io.is_dir(meta) and any(
            re.fullmatch(r"v\d+\.metadata\.json", n)
            for n in io.list_dir(meta)
        )
    if fmt == "parquet":
        try:
            return detect_table_format(path) == "parquet"
        except ValueError:
            return False
    raise ValueError(f"unknown table format {fmt!r}")


def open_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
    format: str | None = None,
) -> DataFrame:
    """Open ``path`` as a DataFrame whatever its format. Time-travel
    pins pass through to the matching reader (``version`` for
    txn/Delta, ``snapshot_id`` for Iceberg, ``as_of_timestamp_ms``
    for any of the three); a pin the detected format cannot express
    raises instead of being ignored. ``format`` pins the reader for
    DUAL-LOG roots (adopt/publish leave several views over one file
    set — detection order would otherwise always pick the txn/Delta
    view); a pin without its marker raises."""
    if format is not None:
        if not format_marker_present(path, format):
            raise ValueError(
                f"{path}: no {format} marker here — the pinned "
                "format cannot serve this root"
            )
        fmt = format
    else:
        fmt = detect_table_format(path)
    if fmt == "txn":
        from .. import txnlog as TL

        if snapshot_id is not None:
            raise ValueError("snapshot_id is an Iceberg pin")
        if as_of_timestamp_ms is not None:
            raise ValueError(
                "txn tables pin by version (the txn log records no "
                "trustworthy wall-clock)"
            )
        return TL.txn_read(spark, path, version=version)
    if fmt == "delta":
        from . import delta as DL

        if snapshot_id is not None:
            raise ValueError("snapshot_id is an Iceberg pin")
        return DL.read_delta(
            spark, path, version=version,
            timestamp_ms=as_of_timestamp_ms,
        )
    if fmt == "iceberg":
        from . import iceberg as IB

        if version is not None:
            raise ValueError(
                "version is a txn/Delta pin; Iceberg uses snapshot_id"
            )
        return IB.read_iceberg(
            spark, path, snapshot_id=snapshot_id,
            as_of_timestamp_ms=as_of_timestamp_ms,
        )
    if version is not None or snapshot_id is not None or (
        as_of_timestamp_ms is not None
    ):
        raise ValueError("plain parquet has no versions to pin")
    from .fileio import io_for

    return spark.read.parquet(io_for(path).spark_path(path))


def open_stream(spark: SparkSession, path: str, **options):
    """The streaming twin of :func:`open_table`: a ``readStream``
    DataFrame over ``path`` whatever its format — the engine's own
    txn log (``txn_table``), external Delta (``delta_table``) or
    Iceberg (``iceberg_table``), each registered on demand; extra
    ``options`` pass through to the source (``ignoreChanges``,
    ``maxFilesPerTrigger``, ``readChangeFeed``, ...). Plain parquet
    directories raise — a bare directory has no commit protocol, so
    nothing defines what 'new data' means (Spark's own file source
    exists for that trade-off)."""
    fmt = options.pop("format", None) or detect_table_format(path)
    if fmt == "parquet":
        raise ValueError(
            f"{path}: plain parquet has no commit log to stream from "
            "(use spark.readStream with Spark's file source, or adopt "
            "the directory into a txn table)"
        )
    if fmt == "txn":
        from . import txn_stream

        txn_stream.register(spark)
        name = "txn_table"
    else:
        from . import external_stream

        external_stream.register(spark)
        name = f"{fmt}_table"
    r = spark.readStream.format(name).option("path", path)
    if name != "txn_table" and "fileio" not in options:
        # Python DataSource methods run in WORKER processes with no
        # scheme registry — ship the resolved FileIO when it is not
        # the plain-path default (and fail with the pickling error's
        # guidance when it cannot travel, e.g. HadoopFileIO)
        from .fileio import LocalFileIO, encode_fileio, io_for

        io = io_for(path)
        if not isinstance(io, LocalFileIO):
            options = dict(options, fileio=encode_fileio(io))
    for k, v in options.items():
        r = r.option(k, str(v))
    return r.load()
